"""Round-5 batch 13 (SURVEY.md §2.9/§2.11): reporting closers — the
accounts-receivable AGING report (open orders bucketed by age at the
corpus cutoff) and the dedup CLUSTER-SIZE histogram (the one-line
answer to "how duplicated is this corpus?").

Both are counted-grain aggregates with exact integer masses; the aging
cutoff is a broadcast 1-row scalar (column-pruned second scan, the
q_feature_scale stats-pass shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.operators.dedup import (
    NORMALIZE_TEXT_SQL as _NORM,
    normalize_text,
)
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_orders_aging",
    oracle="""
    WITH cutoff AS (
      SELECT MAX(CAST(o_orderdate AS DATE)) AS c FROM orders
    ), aged AS (
      SELECT CASE
               WHEN (SELECT c FROM cutoff) - CAST(o_orderdate AS DATE) <= 30
                 THEN '0-30'
               WHEN (SELECT c FROM cutoff) - CAST(o_orderdate AS DATE) <= 60
                 THEN '31-60'
               WHEN (SELECT c FROM cutoff) - CAST(o_orderdate AS DATE) <= 90
                 THEN '61-90'
               ELSE '90+' END AS age_bucket,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderstatus = 'O'
    )
    SELECT age_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS open_cents
    FROM aged GROUP BY age_bucket ORDER BY age_bucket
    """,
)
def q_orders_aging(spark, sf_dir):
    """Accounts-receivable AGING: open orders bucketed by days
    outstanding at the corpus cutoff (the latest order date), with
    exact open cents per bucket — the finance-ops staple next to the
    monthly backlog report.

    Plan: the cutoff is a 1-row broadcast scalar (column-pruned date
    scan); the aging pass is one filtered scan with map-side partial
    aggregation into the fixed 4-bucket grid. Day arithmetic is exact
    integer datediff; money is exact cents."""
    o = read_table(spark, sf_dir, "orders")
    cutoff = o.agg(F.max("o_orderdate").alias("c"))
    aged = (
        o.where(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(cutoff))
        .select(
            F.when(F.datediff("c", "o_orderdate") <= 30, F.lit("0-30"))
            .when(F.datediff("c", "o_orderdate") <= 60, F.lit("31-60"))
            .when(F.datediff("c", "o_orderdate") <= 90, F.lit("61-90"))
            .otherwise(F.lit("90+"))
            .alias("age_bucket"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
    )
    return (
        aged.groupBy("age_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("open_cents"),
        )
        .orderBy("age_bucket")
    )


@query(
    "q_dedup_cluster_sizes",
    oracle=f"""
    WITH fp AS (
      SELECT MD5({_NORM.format(c='text')}) AS f, COUNT(*) AS n_copies
      FROM documents GROUP BY 1
    )
    SELECT CAST(n_copies AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(n_copies) AS BIGINT) AS n_docs,
           CAST(SUM(n_copies - 1) AS BIGINT) AS n_redundant
    FROM fp GROUP BY n_copies ORDER BY cluster_size
    """,
)
def q_dedup_cluster_sizes(spark, sf_dir):
    """Dedup CLUSTER-SIZE histogram: how duplicated is the corpus —
    per exact-duplicate cluster size, the number of clusters, docs
    covered, and redundant copies a dedup pass would drop (the
    headline number every corpus report opens with, derived from the
    same normalized fingerprint as ``q_dedup_normalized``).

    Plan: fingerprint grain (shuffle carries md5 keys, never text) →
    bounded size histogram; both aggregates partial map-side."""
    docs = read_table(spark, sf_dir, "documents")
    fp = docs.groupBy(F.md5(normalize_text("text")).alias("f")).agg(
        F.count(F.lit(1)).alias("n_copies")
    )
    return (
        fp.groupBy(F.col("n_copies").cast("bigint").alias("cluster_size"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
            F.sum("n_copies").cast("bigint").alias("n_docs"),
            F.sum(F.col("n_copies") - 1).cast("bigint").alias("n_redundant"),
        )
        .orderBy("cluster_size")
    )
