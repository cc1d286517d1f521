"""Round-6 batch 14 (SURVEY.md §2.1 sources / §2.4): an ENGINE-SIDE
SYNTHETIC DATA GENERATOR (spark.range + integer-hash derived columns —
the dbgen-style source for load tests and CI fixtures, no driver-side
row building) and SQL-standard INTERPOLATED percentiles
(PERCENTILE_CONT beside q_percentile_bands' exact discrete ranks).

Reference scope: the catalog app demos on pasted sample data
(`APP/App.tsx` sample flows); a warehouse needs reproducible synthetic
volume generated IN the engine."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

_GEN_N = 100000
# Knuth multiplicative-hash constants: pure integer arithmetic both
# engines evaluate identically (no md5 parsing, no RNG state).
_H1, _M1 = 2654435761, 1000003
_H2, _M2 = 48271, 99991


@query(
    "q_generate_synthetic",
    oracle=f"""
    WITH g AS (
      SELECT UNNEST(GENERATE_SERIES(0, {_GEN_N - 1})) AS id
    ), rows_ AS (
      SELECT id,
             (id * {_H1} + 40503) % {_M1} % 7 AS cat_id,
             (id * {_H2} + 11) % {_M2} AS value_cents
      FROM g
    )
    SELECT CAST(cat_id AS BIGINT) AS cat_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(value_cents) AS BIGINT) AS sum_cents,
           CAST(MIN(value_cents) AS BIGINT) AS min_cents,
           CAST(MAX(value_cents) AS BIGINT) AS max_cents
    FROM rows_ GROUP BY 1 ORDER BY 1
    """,
)
def q_generate_synthetic(spark, sf_dir):
    """ENGINE-SIDE SYNTHETIC DATA GENERATION: 100k rows materialize
    from ``spark.range`` with columns derived by Knuth multiplicative
    hashing (category, value) — the dbgen pattern for load tests,
    demo fixtures, and benchmark corpora, generated IN PARALLEL on
    executors (range splits across partitions; no driver-side row
    list, no RNG whose state would break partition-order
    independence). The rollup validates the generator's distribution
    cell-by-cell against the oracle's GENERATE_SERIES twin.

    Scale shape: range is an embarrassingly parallel source (each
    partition derives its ids arithmetically); derived columns are
    narrow integer ops in whole-stage codegen; one bounded 7-row
    rollup. Generating 10^12 rows for a cluster load test is the same
    plan with a bigger N."""
    g = spark.range(0, _GEN_N)
    cat = F.pmod(F.pmod(F.col("id") * _H1 + 40503, F.lit(_M1)), F.lit(7))
    val = F.pmod(F.col("id") * _H2 + 11, F.lit(_M2))
    return (
        g.select(cat.alias("cat_id"), val.alias("value_cents"))
        .groupBy(F.col("cat_id").cast("bigint").alias("cat_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("value_cents").cast("bigint").alias("sum_cents"),
            F.min("value_cents").cast("bigint").alias("min_cents"),
            F.max("value_cents").cast("bigint").alias("max_cents"),
        )
        .orderBy("cat_id")
    )


@query(
    "q_percentile_cont",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ), bounds AS (
      SELECT event_type, CAST(n AS BIGINT) AS n,
             MAX(CASE WHEN rn = 1 + (95 * (n - 1)) // 100
                      THEN value END) AS lo,
             MAX(CASE WHEN rn = 1 + (95 * (n - 1)) // 100
                           + CASE WHEN (95 * (n - 1)) % 100 > 0
                                  THEN 1 ELSE 0 END
                      THEN value END) AS hi
      FROM ranked GROUP BY event_type, n
    )
    SELECT event_type, n AS n_events, lo, hi,
           lo + (hi - lo) * (CAST((95 * (n - 1)) % 100 AS DOUBLE) / 100)
             AS p95_cont
    FROM bounds ORDER BY event_type
    """,
)
def q_percentile_cont(spark, sf_dir):
    """SQL-standard INTERPOLATED p95 (PERCENTILE_CONT) per event type —
    the continuous companion to q_percentile_bands' exact discrete
    ranks: index i = 0.95·(n−1) splits into integer rank k = i//1 and
    fraction f, and the percentile is lo + (hi−lo)·f.

    Determinism: BOTH engines use the same manual formulation (never
    each engine's built-in, whose interpolation arithmetic differs in
    operand order): k and the fraction numerator are pure integer
    arithmetic (95·(n−1) split by // and mod 100), lo/hi are raw
    column values selected by exact rank with a total (value,
    event_id) tie-break, and the interpolation is a mirrored 4-op IEEE
    chain — bit-identical doubles.

    Scale shape: rank selection inside per-type windows (the
    q_percentile_bands pass — at 100 TB, swap in the two-phase bucket
    decomposition if a single type dominates); bounds collapse to one
    row per type."""
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wc = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    num = 95 * (F.col("n") - 1)
    k = F.lit(1) + ((num - F.pmod(num, 100)) / 100).cast("bigint")
    has_frac = F.pmod(num, 100) > 0
    bounds = (
        ranked.groupBy("event_type", F.col("n").cast("bigint").alias("n"))
        .agg(
            F.max(F.when(F.col("rn") == k, F.col("value"))).alias("lo"),
            F.max(
                F.when(
                    F.col("rn")
                    == k + F.when(has_frac, F.lit(1)).otherwise(F.lit(0)),
                    F.col("value"),
                )
            ).alias("hi"),
        )
    )
    frac = F.pmod(95 * (F.col("n") - 1), 100).cast("double") / F.lit(100).cast(
        "double"
    )
    return bounds.select(
        "event_type",
        F.col("n").alias("n_events"),
        "lo",
        "hi",
        (F.col("lo") + (F.col("hi") - F.col("lo")) * frac).alias("p95_cont"),
    ).orderBy("event_type")
