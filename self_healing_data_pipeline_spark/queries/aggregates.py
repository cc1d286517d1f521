"""Aggregation + profiling queries (SURVEY.md §2.4, build step 3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.functions.scalar import davg, dec, dsum
from self_healing_data_pipeline_spark.operators.aggregates import (
    exact_stats,
    null_profile,
    pricing_summary,
)
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# Exact-decimal SQL fragments mirroring functions.scalar (see its module
# docstring for why: bit-identical float aggregates across engines).
_DSUM = "CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE)"
_DAVG = (
    "CAST(SUM(CAST({c} AS DECIMAL(12,2))) AS DOUBLE)"
    " / CAST(COUNT({c}) AS DOUBLE)"
)


@query(
    "q_agg_groupby",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {_DSUM.format(c='l_quantity')} AS sum_qty,
           {_DSUM.format(c='l_extendedprice')} AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
                AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
                    * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2))))
                AS DOUBLE) AS sum_charge,
           {_DAVG.format(c='l_quantity')} AS avg_qty,
           {_DAVG.format(c='l_extendedprice')} AS avg_price,
           {_DAVG.format(c='l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_agg_groupby(spark, sf_dir):
    """Flagship: TPC-H-Q1-shaped pricing summary (scan→filter→hash agg→sort)."""
    return pricing_summary(read_table(spark, sf_dir, "lineitem"))


@query(
    "q_agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q_agg_distinct(spark, sf_dir):
    """Exact COUNT(DISTINCT) — Catalyst plans expand + two-phase agg."""
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


@query("q_agg_approx_distinct")  # no oracle: HLL sketches differ per engine
def q_agg_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++) — the 100 TB cardinality
    profiler (exact distinct at that scale is a full shuffle of all keys;
    HLL is a constant-size sketch merged map-side).

    Self-witnessing rows-only check: the exact COUNT(DISTINCT) rides in the
    same row, with an engine-side relative-error assertion (< 5% at
    rsd=0.02) so the record shows the sketch landed sane, not just "1 row".
    """
    rel_err = lambda approx, exact: F.abs(
        approx.cast("double") / exact.cast("double") - F.lit(1.0)
    )
    li = read_table(spark, sf_dir, "lineitem")
    # The two exact counts run as separate pre-distinct aggregates joined
    # onto the sketch row: multiple COUNT(DISTINCT x) in ONE aggregate
    # plan an Expand (row count × distinct-exprs) through a full shuffle —
    # ~6× slower at sf0.1 and linearly worse with data size. Per-column
    # distinct-then-count keeps each pass partially aggregated map-side.
    approx = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
    )
    exact_orders = (
        li.select("l_orderkey").distinct().agg(F.count(F.lit(1)).alias("exact_orders"))
    )
    exact_parts = (
        li.select("l_partkey").distinct().agg(F.count(F.lit(1)).alias("exact_parts"))
    )
    agg = approx.crossJoin(F.broadcast(exact_orders)).crossJoin(
        F.broadcast(exact_parts)
    )
    return agg.select(
        "approx_orders",
        "exact_orders",
        "approx_parts",
        "exact_parts",
        (
            (rel_err(F.col("approx_orders"), F.col("exact_orders")) < 0.05)
            & (rel_err(F.col("approx_parts"), F.col("exact_parts")) < 0.05)
        ).alias("within_5pct"),
    )


@query(
    "q_agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_agg_rollup(spark, sf_dir):
    """ROLLUP with GROUPING() disambiguation of subtotal rows."""
    return (
        read_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
            F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
            F.grouping("l_linestatus").cast("bigint").alias("g_status"),
        )
    )


@query(
    "q_agg_having",
    oracle="""
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    """,
)
def q_agg_having(spark, sf_dir):
    """GROUP BY + HAVING (post-aggregation filter)."""
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_spent"),
        )
        .filter(F.col("n_orders") >= 15)
    )


@query(
    "q_agg_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_quantity AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_O,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                         THEN CAST(l_quantity AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_F
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q_agg_pivot(spark, sf_dir):
    """Pivot = groupBy + pivot columns (conditional aggregation)."""
    li = read_table(spark, sf_dir, "lineitem")
    zero = F.lit(0).cast("decimal(18,2)")
    qty = dec("l_quantity", precision=18)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(F.col("l_linestatus") == "O", qty).otherwise(zero))
            .cast("double")
            .alias("qty_O"),
            F.sum(F.when(F.col("l_linestatus") == "F", qty).otherwise(zero))
            .cast("double")
            .alias("qty_F"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_profile_nulls",
    oracle="""
    WITH t AS (SELECT COUNT(*) AS total,
                      CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_custkey,
                      CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_totalprice,
                      CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orderstatus
               FROM orders)
    SELECT column_name, null_count, total_count FROM (
      SELECT 'o_custkey' AS column_name, n_custkey AS null_count, total AS total_count FROM t
      UNION ALL
      SELECT 'o_orderstatus', n_orderstatus, total FROM t
      UNION ALL
      SELECT 'o_totalprice', n_totalprice, total FROM t
    ) ORDER BY column_name
    """,
)
def q_profile_nulls(spark, sf_dir):
    """Deterministic null-profile — the engine twin of the reference's LLM
    quality category "Contains null values" (geminiService.ts:64)."""
    return null_profile(
        read_table(spark, sf_dir, "orders"),
        ["o_custkey", "o_orderstatus", "o_totalprice"],
    )


@query(
    "q_profile_stats",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n_rows,
           MIN(c_acctbal) AS min_val,
           MAX(c_acctbal) AS max_val,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_val,
           SQRT(GREATEST(CAST(COUNT(*) AS DOUBLE)
                   * CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)) * CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                 - CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                   * CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE), 0.0)
                / (CAST(COUNT(*) AS DOUBLE) * (CAST(COUNT(*) AS DOUBLE) - 1.0))) AS stddev_val
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q_profile_stats(spark, sf_dir):
    """Outlier/statistics profile with engine-reproducible stddev
    (exact decimal moments; see operators.aggregates.exact_stats)."""
    return exact_stats(
        read_table(spark, sf_dir, "customer"), "c_acctbal", ["c_mktsegment"]
    )
