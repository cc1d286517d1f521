"""Round-7 batch 60 (SURVEY.md §2.5 window functions / §2.4
aggregates): NTH_VALUE + frame-wide FIRST/LAST analytic windows (the
§2.5 members round 1's lag/lead batch didn't cover — with the explicit
UNBOUNDED..UNBOUNDED frame a migrating SQL user reaches for) and the
deterministic MODE aggregate (most frequent value per group with an
explicit tie-break — engines' built-in MODE() leaves ties unspecified,
so the portable form is a rank over value counts).

Exactness: all values are fixture column values selected under a
unique (value, key) order; mode counts and shares are exact integers
with one final IEEE division."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

@query(
    "q_window_nth",
    oracle="""
    SELECT c_mktsegment,
           c_custkey,
           c_acctbal,
           NTH_VALUE(c_acctbal, 3) OVER w AS third_lowest,
           FIRST_VALUE(c_acctbal) OVER w AS lowest,
           LAST_VALUE(c_acctbal) OVER (
             PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS highest
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING
                 AND UNBOUNDED FOLLOWING)
    ORDER BY c_mktsegment, c_acctbal, c_custkey
    LIMIT 200
    """,
)
def q_window_nth(spark, sf_dir):
    """NTH_VALUE + frame-wide FIRST/LAST per market segment: each
    customer row annotated with the segment's lowest, third-lowest,
    and highest balance — the remaining §2.5 analytic-window members
    (lag/lead/first/last with default frames landed in round 1;
    nth_value and the explicit UNBOUNDED..UNBOUNDED frame are what a
    migrating SQL user still reaches for). The unique (balance, key)
    order makes every value deterministic cross-engine.

    Scale shape: one window exchange hash-partitioned by segment; the
    top-200 LIMIT rides the total order (TakeOrderedAndProject)."""
    c = read_table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.nth_value("c_acctbal", 3).over(w).alias("third_lowest"),
            F.first("c_acctbal").over(w).alias("lowest"),
            F.last("c_acctbal").over(w).alias("highest"),
        )
        .orderBy("c_mktsegment", "c_acctbal", "c_custkey")
        .limit(200)
    )


@query(
    "q_agg_mode",
    oracle="""
    WITH counts AS (
      SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
      FROM customer GROUP BY c_mktsegment, c_nationkey
    ), ranked AS (
      SELECT c_mktsegment, c_nationkey, n,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY n DESC, c_nationkey) AS rn,
             SUM(n) OVER (PARTITION BY c_mktsegment) AS seg_rows
      FROM counts
    )
    SELECT c_mktsegment,
           CAST(c_nationkey AS BIGINT) AS mode_nationkey,
           CAST(n AS BIGINT) AS mode_rows,
           CAST(seg_rows AS BIGINT) AS seg_rows,
           CAST(n AS DOUBLE) / CAST(seg_rows AS DOUBLE) AS mode_share
    FROM ranked WHERE rn = 1
    ORDER BY c_mktsegment
    """,
)
def q_agg_mode(spark, sf_dir):
    """DETERMINISTIC MODE per group: the most frequent nation among
    each market segment's customers, ties broken by the lowest key —
    the portable form of the MODE() aggregate, whose tie behavior the
    SQL engines leave unspecified (a direct MODE() call could
    hash-mismatch on any tied fixture). Reports the winning value, its
    row count, the segment total, and the share (one IEEE division of
    exact longs).

    Scale shape: one value-grain partial-aggregated count (shuffle
    carries (segment, nation) pairs — the bounded domain, never
    customers), then a rank window over that already-tiny frame."""
    c = read_table(spark, sf_dir, "customer")
    counts = c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("n"), F.asc("c_nationkey")
    )
    wseg = Window.partitionBy("c_mktsegment")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .withColumn("seg_rows", F.sum("n").over(wseg))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("c_nationkey").cast("bigint").alias("mode_nationkey"),
            F.col("n").cast("bigint").alias("mode_rows"),
            F.col("seg_rows").cast("bigint").alias("seg_rows"),
            (
                F.col("n").cast("double")
                / F.col("seg_rows").cast("double")
            ).alias("mode_share"),
        )
        .orderBy("c_mktsegment")
    )
