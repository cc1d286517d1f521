"""Round-6 batch 19 (SURVEY.md §2.4 reporting + §2.9 streaming):
SHARE-OF-PARENT hierarchy report (nation share within region, region
share of total — the drill-down ratio every BI hierarchy renders) —
the oracle-checked companion to this batch's true-streaming lateness
monitor (`streaming/lateness.py`, the continuous q_watermark_audit
twin asserted cell-equal in `tests/test_lateness_stream.py`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_share_of_parent",
    oracle="""
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    ), reg AS (
      SELECT region, CAST(SUM(cents) AS BIGINT) AS reg_cents
      FROM rev GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(cents) AS BIGINT) AS all_cents FROM rev
    )
    SELECT v.region, v.nation, v.cents,
           CAST(v.cents * 1000000 // g.reg_cents AS BIGINT)
             AS share_of_region_ppm,
           CAST(g.reg_cents * 1000000 // t.all_cents AS BIGINT)
             AS region_share_ppm
    FROM rev v JOIN reg g ON v.region = g.region, tot t
    ORDER BY v.region, v.nation
    """,
)
def q_share_of_parent(spark, sf_dir):
    """SHARE-OF-PARENT hierarchy report: revenue by region → nation
    with each nation's exact-ppm share of its region and each region's
    share of the total — the drill-down ratio every BI hierarchy
    renders next to the raw numbers (and the two-level generalization
    of q_dow_seasonality's share-of-total).

    Scale shape: ONE fact pass — orders⋈customer is the only big join
    (keyed shuffle; bucketed layouts make it shuffle-free), nation and
    region broadcast — collapsing to the (region, nation) grain;
    region and grand totals are second-stage aggregates of that tiny
    grain, broadcast back. Shares are exact integer ppm by floor
    division — no window, no SinglePartition over data."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    rev = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    reg = rev.groupBy("region").agg(
        F.sum("cents").cast("bigint").alias("reg_cents")
    )
    tot = rev.agg(F.sum("cents").cast("bigint").alias("all_cents"))

    def ppm(num, den):
        # cents·10⁶ exceeds 2^53 here (regional masses), so the usual
        # (x − pmod)/x double trick would lose ulps: divide the exactly
        # divisible numerator in DECIMAL(38,0) instead — exact at any
        # magnitude int64 holds
        scaled = num * F.lit(1000000)
        exact = (scaled - F.pmod(scaled, den)).cast("decimal(38,0)")
        return (exact / den.cast("decimal(38,0)")).cast("bigint")

    return (
        rev.join(F.broadcast(reg), "region")
        .crossJoin(F.broadcast(tot))
        .select(
            "region",
            "nation",
            "cents",
            ppm(F.col("cents"), F.col("reg_cents")).alias(
                "share_of_region_ppm"
            ),
            ppm(F.col("reg_cents"), F.col("all_cents")).alias(
                "region_share_ppm"
            ),
        )
        .orderBy("region", "nation")
    )
