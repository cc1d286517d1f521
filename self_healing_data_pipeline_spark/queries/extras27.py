"""Round-6 batch 9 (SURVEY.md §2.4 profiling / §4 optimizer support):
OPTIMIZER STATISTICS — the numbers a cost-based planner (or a human
tuning a 100 TB join) needs before running anything: an EQUI-DEPTH
histogram (ANALYZE-grade value distribution, unlike q_profile_histogram's
equi-width bins) and a JOIN-SIZE/skew ESTIMATE derived purely from key
histograms (predict |A⋈B| without executing the join).

Reference scope: the catalog app profiles columns before load
(`APP/services/geminiService.ts:64`); these are the planner-facing
statistics that profiling feeds at warehouse scale."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

_N_BUCKETS = 8


@query(
    "q_histogram_equidepth",
    oracle=f"""
    WITH grain AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1
    ), c AS (
      SELECT v, cnt,
             SUM(cnt) OVER (ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cumw,
             SUM(cnt) OVER () AS total
      FROM grain
    ), b AS (
      SELECT v, cnt,
             (cumw - 1) * {_N_BUCKETS} // total + 1 AS bucket
      FROM c
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(MIN(v) AS BIGINT) AS lo_cents,
           CAST(MAX(v) AS BIGINT) AS hi_cents,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_distinct
    FROM b GROUP BY 1 ORDER BY 1
    """,
)
def q_histogram_equidepth(spark, sf_dir):
    """EQUI-DEPTH (equi-height) histogram of order totals in 8 buckets
    — the ANALYZE statistic planners prefer over equi-width bins
    because every bucket carries the same row mass regardless of skew.
    Bucket of a value = ⌊(cum_rank−1)·B / N⌋ + 1 computed on the VALUE
    GRAIN, so ties land wholly in one bucket (deterministic; buckets
    can deviate from N/B only by tie mass, the standard contract).

    Per bucket: value bounds, row count, distinct-value count — the
    planner's selectivity table. All integer arithmetic (floor
    division; no percentile interpolation).

    Scale shape: raw rows collapse map-side to (value, count); the one
    ordered pass runs over the value grain (bounded by the price
    domain, not row count — q_weighted_median's discipline); the
    rollup partial-aggregates to B rows."""
    o = read_table(spark, sf_dir, "orders")
    grain = o.groupBy(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    # The cumulative count must NOT be a global orderBy-only window
    # (SinglePartition over the whole value grain). Two-phase instead
    # (the q_pack_context / q_shard_assign pattern): coarse value
    # megabuckets (v >> 20 ≈ $10k-wide) → per-bucket subtotals →
    # cumulative offsets over the tiny bucket frame → narrow in-bucket
    # running sum.
    coarse = F.shiftright(F.col("v"), 20).alias("cb")
    g2 = grain.select("v", "cnt", coarse)
    sub = g2.groupBy("cb").agg(F.sum("cnt").alias("bsum"))
    wcb = Window.orderBy("cb").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sub.select(
        "cb", F.coalesce(F.sum("bsum").over(wcb), F.lit(0)).alias("offset")
    )
    win = Window.partitionBy("cb").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = grain.agg(F.sum("cnt").alias("total"))
    c = (
        g2.join(F.broadcast(offsets), "cb")
        .withColumn("cumw", F.col("offset") + F.sum("cnt").over(win))
        .crossJoin(F.broadcast(total))
    )
    bucket = (
        ((F.col("cumw") - 1) * _N_BUCKETS - F.pmod((F.col("cumw") - 1) * _N_BUCKETS, F.col("total")))
        / F.col("total")
    ).cast("bigint") + 1
    return (
        c.select("v", "cnt", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.min("v").cast("bigint").alias("lo_cents"),
            F.max("v").cast("bigint").alias("hi_cents"),
            F.sum("cnt").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        )
        .withColumn("bucket", F.col("bucket").cast("bigint"))
        .select("bucket", "lo_cents", "hi_cents", "n_rows", "n_distinct")
        .orderBy("bucket")
    )


@query(
    "q_join_size_estimate",
    oracle="""
    WITH k AS (
      SELECT l_partkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS total_pairs,
             CAST(SUM(cnt) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS ndv
      FROM k
    ), top AS (
      SELECT key, cnt, cnt * cnt AS pairs,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS rk
      FROM k
    )
    SELECT CAST(t.rk AS BIGINT) AS rk, t.key, t.cnt,
           CAST(t.pairs AS BIGINT) AS pairs,
           CAST(t.pairs * 1000000 // s.total_pairs AS BIGINT) AS pairs_ppm,
           s.total_pairs, s.ndv, s.n_rows
    FROM top t, tot s
    WHERE t.rk <= 10
    ORDER BY rk
    """,
)
def q_join_size_estimate(spark, sf_dir):
    """JOIN-SIZE ESTIMATION from key histograms: predict the exact
    output cardinality of the lineitem⋈lineitem self-join on
    l_partkey — Σ cnt(k)² over the key histogram — WITHOUT executing
    the join, plus the top-10 heaviest keys with their pair
    contribution in exact ppm. This is what decides, before a 100 TB
    join runs, whether the output explodes and which keys need
    salting/AQE skew handling (the planning step q_skew_report's
    per-key counts feed; for a two-table join the same identity is
    Σ cnt_A(k)·cnt_B(k) over the shared histogram grain).

    All exact integers: the identity |A⋈_k A| = Σ cnt_k² is algebra,
    not an estimate — sampling/sketch variants (KMV on the key column,
    q_join_discovery_sketch's machinery) trade exactness for one scan
    when histograms are unavailable.

    Scale shape: ONE key-grain partial-aggregated count, a broadcast
    1-row total, top-10 via TakeOrderedAndProject. The predicted join
    is never executed."""
    li = read_table(spark, sf_dir, "lineitem")
    k = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    tot = k.agg(
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("total_pairs"),
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("ndv"),
    )
    top = (
        k.withColumn("pairs", F.col("cnt") * F.col("cnt"))
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(10)
    )
    rk = F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("key")))
    scaled = F.col("pairs") * F.lit(1000000)
    ppm = (
        (scaled - F.pmod(scaled, F.col("total_pairs"))) / F.col("total_pairs")
    ).cast("bigint")
    return (
        top.crossJoin(F.broadcast(tot))
        .withColumn("rk", rk.cast("bigint"))
        .select(
            "rk",
            "key",
            "cnt",
            F.col("pairs").cast("bigint").alias("pairs"),
            ppm.alias("pairs_ppm"),
            "total_pairs",
            "ndv",
            "n_rows",
        )
        .orderBy("rk")
    )
