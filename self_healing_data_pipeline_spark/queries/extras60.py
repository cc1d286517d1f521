"""Round-6 batch 43 (SURVEY.md §2.3 joins / §2.11 corpus sampling):
JOIN FAN-OUT AUDIT (the per-key multiplicity histogram that predicts a
join's row blow-up BEFORE running it — the check that catches the
accidental many-to-many) and the HASH-SAMPLE BIAS AUDIT (per-category
binomial z² of the md5-prefix sample against its expected rate — the
statistical proof that deterministic hash sampling is category-fair,
guarding every downstream q_sample_hash consumer).

Exactness: multiplicities and category counts are exact BIGINTs; the
audit's expected/z² columns are fixed-order IEEE chains over two exact
integers per row (no cross-row float sums)."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# Same ~10.2% md5 hex-prefix rule as q_sample_hash: prefix < '1a' keeps
# 26 of 256 two-hex-digit buckets.
_P_NUM, _P_DEN = 26, 256


@query(
    "q_join_fanout_audit",
    oracle="""
    WITH per_key AS (
      SELECT o.o_orderkey,
             CAST(COUNT(l.l_orderkey) AS BIGINT) AS m
      FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY 1
    ), h AS (
      SELECT m, CAST(COUNT(*) AS BIGINT) AS n_keys FROM per_key GROUP BY 1
    )
    SELECT m AS fanout,
           n_keys,
           CAST(m * n_keys AS BIGINT) AS rows_produced,
           CAST(n_keys AS DOUBLE)
             / CAST(SUM(n_keys) OVER () AS DOUBLE) AS key_share,
           CAST(m * n_keys AS DOUBLE)
             / CAST(SUM(m * n_keys) OVER () AS DOUBLE) AS row_share
    FROM h ORDER BY fanout
    """,
)
def q_join_fanout_audit(spark, sf_dir):
    """JOIN FAN-OUT AUDIT for orders⋈lineitem: the exact distribution
    of per-order-key line multiplicity (0..N), each histogram row
    carrying how many join output rows that multiplicity contributes —
    the pre-flight check that tells you whether a planned join
    multiplies (accidental many-to-many, the classic silent row
    explosion) and what its output cardinality will be, per key
    stratum. m=0 rows are orders with no lines (LEFT join semantics),
    the stratum an inner join silently drops.

    Scale shape: COUNT at the join-key grain via one LEFT-join
    aggregate (co-partitionable on the natural key), then the
    histogram collapse at the multiplicity grain — m is bounded by the
    max lines per order (7 in TPC-H shapes), so the share windows run
    over a handful of rows. No payload ever shuffles; only (key, m)."""
    o = read_table(spark, sf_dir, "orders").select("o_orderkey")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey")
    per_key = (
        o.join(li, o.o_orderkey == li.l_orderkey, "left")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").cast("bigint").alias("m"))
    )
    h = per_key.groupBy("m").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys")
    )
    from pyspark.sql import Window

    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        h.select(
            F.col("m").alias("fanout"),
            "n_keys",
            (F.col("m") * F.col("n_keys")).cast("bigint").alias(
                "rows_produced"
            ),
            (
                F.col("n_keys").cast("double")
                / F.sum("n_keys").over(wall).cast("double")
            ).alias("key_share"),
            (
                (F.col("m") * F.col("n_keys")).cast("double")
                / F.sum(F.col("m") * F.col("n_keys")).over(wall).cast("double")
            ).alias("row_share"),
        )
        .orderBy("fanout")
    )


@query(
    "q_sample_bias_audit",
    oracle=f"""
    WITH pop AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_pop,
             CAST(SUM(CASE WHEN SUBSTRING(MD5(CAST(event_id AS VARCHAR)), 1, 2)
                           < '1a' THEN 1 ELSE 0 END) AS BIGINT) AS n_sample
      FROM events GROUP BY 1
    )
    SELECT event_type, n_pop, n_sample,
           CAST(n_pop AS DOUBLE) * ({_P_NUM} / CAST({_P_DEN} AS DOUBLE))
             AS expected,
           (CAST(n_sample AS DOUBLE)
            - CAST(n_pop AS DOUBLE) * ({_P_NUM} / CAST({_P_DEN} AS DOUBLE)))
           * (CAST(n_sample AS DOUBLE)
              - CAST(n_pop AS DOUBLE) * ({_P_NUM} / CAST({_P_DEN} AS DOUBLE)))
           / (CAST(n_pop AS DOUBLE) * ({_P_NUM} / CAST({_P_DEN} AS DOUBLE))
              * (1 - {_P_NUM} / CAST({_P_DEN} AS DOUBLE))) AS z_sq,
           CASE WHEN (CAST(n_sample AS DOUBLE)
                      - CAST(n_pop AS DOUBLE)
                        * ({_P_NUM} / CAST({_P_DEN} AS DOUBLE)))
                     * (CAST(n_sample AS DOUBLE)
                        - CAST(n_pop AS DOUBLE)
                          * ({_P_NUM} / CAST({_P_DEN} AS DOUBLE)))
                     / (CAST(n_pop AS DOUBLE)
                        * ({_P_NUM} / CAST({_P_DEN} AS DOUBLE))
                        * (1 - {_P_NUM} / CAST({_P_DEN} AS DOUBLE)))
                     <= 3.841458820694124 THEN 'fair' ELSE 'biased' END
             AS verdict
    FROM pop ORDER BY event_type
    """,
)
def q_sample_bias_audit(spark, sf_dir):
    """HASH-SAMPLE BIAS AUDIT: for each event category, the exact
    population count, the exact count falling in the md5-prefix <'1a'
    sample (the q_sample_hash rule, expected rate 26/256), the
    binomial z² against that rate, and a fair/biased verdict at the
    χ²₁ 95% critical value (3.8415) — the audit that certifies
    deterministic hash sampling doesn't correlate with any category
    (md5 avalanche), run per-category so a failure names the stratum.

    Scale shape: ONE category-grain conditional aggregate (population
    and sample counted in the same pass — the sample is a filter
    expression, never a second scan), then pure per-row float math on
    two exact integers. The z² chain is written identically in both
    engines; no cross-row float accumulation anywhere."""
    ev = read_table(spark, sf_dir, "events")
    pop = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pop"),
        F.sum(
            F.when(
                F.substring(F.md5(F.col("event_id").cast("string")), 1, 2)
                < "1a",
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_sample"),
    )
    p = F.lit(_P_NUM) / F.lit(_P_DEN).cast("double")
    expected = F.col("n_pop").cast("double") * p
    diff = F.col("n_sample").cast("double") - expected
    z_sq = diff * diff / (expected * (1 - p))
    return pop.select(
        "event_type",
        "n_pop",
        "n_sample",
        expected.alias("expected"),
        z_sq.alias("z_sq"),
        F.when(z_sq <= 3.841458820694124, "fair")
        .otherwise("biased")
        .alias("verdict"),
    ).orderBy("event_type")
