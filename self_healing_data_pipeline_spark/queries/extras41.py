"""Round-6 batch 23 (SURVEY.md §2.3 temporal / §2.11 ML prep):
BITEMPORAL reconstruction — "what did we BELIEVE at transaction time
T about the state VALID at time V?" over the order version log (the
two-clock query SCD2 (valid time) and time travel (transaction time)
each answer only half of) — and a CLASS-WEIGHT report over the
embedding labels (the inverse-frequency weights an imbalanced
training run feeds its loss)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# The 2×2 bitemporal probe grid: transaction-time cuts (what had been
# ingested) × valid-time points (what was in effect).
_TX_CUTS = ("1996-01-01", "1999-01-01")
_VALID_ATS = ("1995-06-01", "1997-06-01")


@query(
    "q_bitemporal",
    oracle=f"""
    WITH grid AS (
      SELECT * FROM (VALUES
        (DATE '{_TX_CUTS[0]}', DATE '{_VALID_ATS[0]}'),
        (DATE '{_TX_CUTS[0]}', DATE '{_VALID_ATS[1]}'),
        (DATE '{_TX_CUTS[1]}', DATE '{_VALID_ATS[0]}'),
        (DATE '{_TX_CUTS[1]}', DATE '{_VALID_ATS[1]}')
      ) AS t(tx_cut, valid_at)
    ), vers AS (
      SELECT o_custkey AS ck, o_orderkey AS seq,
             CAST(o_orderdate AS DATE) AS vfrom,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), known AS (
      SELECT g.tx_cut, g.valid_at, v.ck, v.seq, v.cents,
             ROW_NUMBER() OVER (PARTITION BY g.tx_cut, g.valid_at, v.ck
                                ORDER BY v.vfrom DESC, v.seq DESC) AS rn
      FROM grid g JOIN vers v
        ON v.vfrom < g.tx_cut AND v.vfrom <= g.valid_at
    )
    SELECT STRFTIME(tx_cut, '%Y-%m-%d') AS tx_cut,
           STRFTIME(valid_at, '%Y-%m-%d') AS valid_at,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM known WHERE rn = 1
    GROUP BY tx_cut, valid_at ORDER BY tx_cut, valid_at
    """,
)
def q_bitemporal(spark, sf_dir):
    """BITEMPORAL reconstruction over the order version log: for each
    (transaction-time cut, valid-time point) in a 2×2 probe grid,
    rebuild the per-customer version that was BOTH already ingested
    (vfrom < tx_cut — arrival follows order date here, the
    q_time_travel epoch convention) AND in effect at the valid
    instant (latest vfrom ≤ valid_at), then roll up customers and
    exact cents. This is the audit question neither clock answers
    alone — SCD2 gives validity, time travel gives belief; corrections
    arriving late make the same valid_at answer DIFFER across tx_cuts,
    which is exactly what the report shows.

    Scale shape: the 4-row probe grid broadcasts into the version
    scan; per-(probe, customer) latest-version selection is a rank
    window partitioned by (probe, customer); bounded 4-row output.
    All exact integers/dates."""
    o = read_table(spark, sf_dir, "orders")
    grid = F.broadcast(
        spark.createDataFrame(
            [(t, v) for t in _TX_CUTS for v in _VALID_ATS],
            "tx_cut string, valid_at string",
        ).select(
            F.col("tx_cut").cast("date").alias("tx_cut"),
            F.col("valid_at").cast("date").alias("valid_at"),
        )
    )
    vers = o.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderkey").alias("seq"),
        F.col("o_orderdate").cast("date").alias("vfrom"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    known = vers.join(
        grid,
        (F.col("vfrom") < F.col("tx_cut"))
        & (F.col("vfrom") <= F.col("valid_at")),
    )
    rn = F.row_number().over(
        Window.partitionBy("tx_cut", "valid_at", "ck").orderBy(
            F.col("vfrom").desc(), F.col("seq").desc()
        )
    )
    return (
        known.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .groupBy(
            F.date_format("tx_cut", "yyyy-MM-dd").alias("tx_cut"),
            F.date_format("valid_at", "yyyy-MM-dd").alias("valid_at"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
        .orderBy("tx_cut", "valid_at")
    )


@query(
    "q_class_weights",
    oracle="""
    WITH n AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n_samples
      FROM embeddings GROUP BY 1
    ), t AS (
      SELECT CAST(SUM(n_samples) AS BIGINT) AS total,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM n
    )
    SELECT n.label, n.n_samples,
           CAST(t.total * 1000000 // (t.k * n.n_samples) AS BIGINT)
             AS weight_ppm
    FROM n, t ORDER BY n.label
    """,
)
def q_class_weights(spark, sf_dir):
    """CLASS-WEIGHT report over the embedding labels: per class,
    sample count and the balanced inverse-frequency weight
    total/(k·n_c) in exact integer ppm — what an imbalanced training
    run feeds its loss (sklearn's 'balanced' convention). A uniform
    corpus shows ~1.0 everywhere; any skew reads directly off the ppm
    column.

    Scale shape: one label-grain partial-aggregated count + a
    broadcast 1-row (total, k) scalar; integer floor division."""
    emb = read_table(spark, sf_dir, "embeddings")
    n = emb.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_samples")
    )
    t = n.agg(
        F.sum("n_samples").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    den = F.col("k") * F.col("n_samples")
    scaled = F.col("total") * F.lit(1000000)
    w = ((scaled - F.pmod(scaled, den)) / den).cast("bigint")
    return (
        n.crossJoin(F.broadcast(t))
        .select("label", "n_samples", w.alias("weight_ppm"))
        .orderBy("label")
    )
