"""Round-6 batch 33 (SURVEY.md §2.1 ops / §2.4 planner aids):
RETENTION SWEEP (which SCD2 version rows are physically deletable
under a retention policy — the VACUUM-style eligibility plan that
must respect both age AND supersession) and the PARTITION-KEY ADVISOR
(candidate partitioning keys compared in one report: cardinality,
balance, skew — the decision input before bucketing/repartitioning a
100 TB table).

Both are pure integer/count plans with deterministic total orders."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# Retention horizon: versions superseded before this date are
# physically deletable (kept: anything current or recently closed —
# time travel inside the horizon still needs them).
_RETAIN_FROM = "2000-01-01"


@query(
    "q_retention_sweep",
    oracle=f"""
    WITH v AS (
      SELECT o_custkey,
             o_orderkey AS version_key,
             o_orderdate AS effective_from,
             LEAD(o_orderdate) OVER w AS effective_to
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ), flagged AS (
      SELECT o_custkey,
             (effective_to IS NOT NULL
              AND effective_to < TIMESTAMP '{_RETAIN_FROM}')
               AS deletable
      FROM v
    )
    SELECT o_custkey AS custkey,
           CAST(COUNT(*) AS BIGINT) AS n_versions,
           CAST(SUM(CASE WHEN deletable THEN 1 ELSE 0 END) AS BIGINT)
             AS n_deletable,
           CAST(SUM(CASE WHEN deletable THEN 0 ELSE 1 END) AS BIGINT)
             AS n_retained
    FROM flagged
    GROUP BY o_custkey
    HAVING SUM(CASE WHEN deletable THEN 1 ELSE 0 END) > 0
    ORDER BY n_deletable DESC, custkey LIMIT 50
    """,
)
def q_retention_sweep(spark, sf_dir):
    """RETENTION SWEEP over the SCD2 version history (same build as
    q_scd2_versions): a version row is physically deletable iff it is
    SUPERSEDED (effective_to set) and its supersession happened before
    the retention horizon — current rows and recently-closed rows must
    stay (time travel within the horizon reads them). Emits the
    per-key deletion plan (top 50 keys by reclaimable versions) — the
    input a VACUUM/compaction job consumes.

    Scale shape: one lead() window per dimension key (the SCD2 shuffle
    that builds validity anyway), a narrow flag, one partial-
    aggregated rollup, TakeOrdered(50). Deletability is pure date
    comparison — no floats."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    eff_to = F.lead("o_orderdate").over(w)
    flagged = o.select(
        "o_custkey",
        (
            eff_to.isNotNull() & (eff_to < F.lit(_RETAIN_FROM))
        ).alias("deletable"),
    )
    return (
        flagged.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_versions"),
            F.sum(F.when(F.col("deletable"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_deletable"),
            F.sum(F.when(F.col("deletable"), 0).otherwise(1))
            .cast("bigint")
            .alias("n_retained"),
        )
        .where(F.col("n_deletable") > 0)
        .orderBy(F.col("n_deletable").desc(), F.col("custkey"))
        .limit(50)
    )


_CANDIDATES = (
    ("o_custkey", "CAST(o_custkey % 256 AS BIGINT)"),
    ("order_month", "CAST(STRFTIME(o_orderdate, '%Y%m') AS BIGINT)"),
    ("o_orderpriority", "CAST(ASCII(o_orderpriority) AS BIGINT)"),
)


@query(
    "q_partition_advisor",
    oracle=f"""
    WITH {", ".join(
        f'''b_{name} AS (
      SELECT {expr} AS bucket, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1
    ), s_{name} AS (
      SELECT '{name}' AS candidate_key,
             CAST(COUNT(*) AS BIGINT) AS n_buckets,
             CAST(SUM(n) AS BIGINT) AS n_rows,
             CAST(MAX(n) AS BIGINT) AS max_bucket,
             CAST(MAX(n) * COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)
               AS skew_ratio
      FROM b_{name}
    )''' for name, expr in _CANDIDATES
    )}
    SELECT * FROM s_o_custkey
    UNION ALL SELECT * FROM s_order_month
    UNION ALL SELECT * FROM s_o_orderpriority
    ORDER BY candidate_key
    """,
)
def q_partition_advisor(spark, sf_dir):
    """PARTITION-KEY ADVISOR: for each candidate partitioning scheme
    of the orders fact (hash(custkey)%256, order month, priority),
    report bucket count, the largest bucket, and the skew ratio
    max·buckets/rows (1.0 = perfectly balanced; ≫1 = a straggler task
    at shuffle time). This is the one-pass report that decides which
    key a 100 TB table should bucket/repartition on — the advisor
    form of q_skew_report, comparing schemes side by side.

    Scale shape: one partial-aggregated bucket-grain count per
    candidate (3 parallel aggregates over the same scan), each
    collapsed to a 1-row summary — candidates widen the union, never
    the data path. Skew ratio is exact ints and one mirrored IEEE
    division."""
    o = read_table(spark, sf_dir, "orders")
    variants = {
        "o_custkey": F.pmod(F.col("o_custkey"), F.lit(256)).cast("bigint"),
        "order_month": F.date_format("o_orderdate", "yyyyMM").cast("bigint"),
        "o_orderpriority": F.ascii(F.col("o_orderpriority")).cast("bigint"),
    }
    outs = []
    for name, expr in variants.items():
        b = o.groupBy(expr.alias("bucket")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n")
        )
        outs.append(
            b.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
                F.sum("n").cast("bigint").alias("n_rows"),
                F.max("n").cast("bigint").alias("max_bucket"),
                (
                    (F.max("n") * F.count(F.lit(1))).cast("double")
                    / F.sum("n").cast("double")
                ).alias("skew_ratio"),
            ).select(
                F.lit(name).alias("candidate_key"),
                "n_buckets",
                "n_rows",
                "max_bucket",
                "skew_ratio",
            )
        )
    out = outs[0]
    for x in outs[1:]:
        out = out.unionAll(x)
    return out.orderBy("candidate_key")
