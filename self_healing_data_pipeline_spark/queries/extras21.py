"""Round-6 batch 3 (SURVEY.md §2.9): operational reporting closers —
the supplier SCORECARD (multi-metric vendor report), SEASONALLY-
ADJUSTED anomaly days (the composition of q_dow_seasonality's index
with outlier flagging), and the REVENUE BRIDGE (period-over-period
growth decomposed into new / churned / expansion / contraction
customer classes — the first slide of every revenue review).

Determinism: money is exact cents / exact DECIMAL(12,2) revenue
products; every anomaly decision is an INTEGER cross-multiplied
comparison (no division decides membership); divisions appear only in
output columns in mirrored operand order; weekday numbering mirrors
the Spark 1-based convention (DuckDB DAYOFWEEK + 1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.functions.scalar import dec
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_supplier_scorecard",
    oracle="""
    WITH per AS (
      SELECT l.l_suppkey AS suppkey,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                      * (CAST(1 AS DECIMAL(12,2))
                         - CAST(l.l_discount AS DECIMAL(12,2))))
                  AS DOUBLE) AS revenue,
             CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_returned,
             CAST(SUM(DATEDIFF('day', CAST(o.o_orderdate AS DATE),
                               CAST(l.l_shipdate AS DATE))) AS BIGINT)
               AS lag_days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1
    )
    SELECT p.suppkey, s.s_name, p.n_lines, p.revenue,
           CAST(p.n_returned AS DOUBLE) / CAST(p.n_lines AS DOUBLE)
             AS return_rate,
           CAST(p.lag_days AS DOUBLE) / CAST(p.n_lines AS DOUBLE)
             AS avg_ship_lag_days
    FROM per p JOIN supplier s ON p.suppkey = s.s_suppkey
    ORDER BY p.revenue DESC, p.suppkey LIMIT 10
    """,
)
def q_supplier_scorecard(spark, sf_dir):
    """Supplier SCORECARD: per vendor — line volume, exact-decimal
    revenue, return rate, and average order→ship lag — the multi-metric
    procurement report (one row per supplier, top-10 by revenue).

    Scale shape: ONE fact-fact equi-join (lineitem ⋈ orders on
    orderkey — both shuffle on the key; on a bucketed layout this join
    is shuffle-free, `sources/writers.py`), collapsed map-side-partial
    to supplier grain BEFORE the tiny supplier dim joins (broadcast).
    Ratios divide once per supplier row in mirrored operand order;
    ship lag is exact integer day arithmetic (negative lags in this
    synthetic fixture are kept as-is — the report reports, it doesn't
    clean). Top-10 is TakeOrderedAndProject."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = read_table(spark, sf_dir, "supplier")
    rev = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(12,2)") - dec("l_discount")
    )
    per = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(rev).cast("double").alias("revenue"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("bigint")
            .alias("n_returned"),
            F.sum(
                F.datediff(
                    F.col("l_shipdate").cast("date"),
                    F.col("o_orderdate").cast("date"),
                )
            )
            .cast("bigint")
            .alias("lag_days"),
        )
    )
    return (
        per.join(s, per.suppkey == s.s_suppkey)
        .select(
            "suppkey",
            "s_name",
            "n_lines",
            "revenue",
            (F.col("n_returned").cast("double") / F.col("n_lines").cast("double"))
            .alias("return_rate"),
            (F.col("lag_days").cast("double") / F.col("n_lines").cast("double"))
            .alias("avg_ship_lag_days"),
        )
        .orderBy(F.col("revenue").desc(), "suppkey")
        .limit(10)
    )


@query(
    "q_seasonal_anomaly",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             DAYOFWEEK(CAST(o_orderdate AS DATE)) + 1 AS dow,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1, 2
    ), per_dow AS (
      SELECT dow, CAST(COUNT(*) AS BIGINT) AS dow_days,
             CAST(SUM(cents) AS BIGINT) AS dow_total
      FROM daily GROUP BY 1
    )
    SELECT STRFTIME(d.day, '%Y-%m-%d') AS day_str,
           CAST(d.dow AS INT) AS dow, d.cents,
           CAST(p.dow_total AS DOUBLE) / CAST(p.dow_days AS DOUBLE)
             AS dow_mean,
           CAST(d.cents * p.dow_days AS DOUBLE) / CAST(p.dow_total AS DOUBLE)
             AS ratio,
           CASE WHEN d.cents * p.dow_days * 2 > 3 * p.dow_total
                THEN 'high' ELSE 'low' END AS direction
    FROM daily d JOIN per_dow p ON d.dow = p.dow
    WHERE d.cents * p.dow_days * 2 > 3 * p.dow_total
       OR d.cents * p.dow_days * 2 < p.dow_total
    ORDER BY day_str
    """,
)
def q_seasonal_anomaly(spark, sf_dir):
    """SEASONALLY-ADJUSTED anomaly days: days whose revenue deviates
    from their own WEEKDAY's mean by more than ±50% — the composition
    q_dow_seasonality exists for (a quiet Sunday is not an anomaly
    just because Sundays are quiet; comparing each day to its weekday
    mean removes the weekly cycle before flagging).

    Determinism: membership is decided by INTEGER cross-multiplication
    (``cents · dow_days · 2 > 3 · dow_total`` ⇔ ratio > 1.5 exactly,
    no float ever enters the predicate); the reported mean/ratio
    divide once, in mirrored operand order, on the surviving rows.

    Scale shape: the scan collapses map-side-partial to day grain
    (calendar-bounded); the 7-row weekday profile derives from the
    daily frame and broadcasts back onto it. Nothing grows with data
    volume past the first aggregate."""
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("day"),
        F.dayofweek("o_orderdate").cast("int").alias("dow"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    per_dow = daily.groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("dow_days"),
        F.sum("cents").cast("bigint").alias("dow_total"),
    )
    j = daily.join(F.broadcast(per_dow), "dow")
    lhs = F.col("cents") * F.col("dow_days") * 2
    return (
        j.filter(
            (lhs > 3 * F.col("dow_total")) | (lhs < F.col("dow_total"))
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day_str"),
            "dow",
            "cents",
            (
                F.col("dow_total").cast("double")
                / F.col("dow_days").cast("double")
            ).alias("dow_mean"),
            (
                (F.col("cents") * F.col("dow_days")).cast("double")
                / F.col("dow_total").cast("double")
            ).alias("ratio"),
            F.when(lhs > 3 * F.col("dow_total"), F.lit("high"))
            .otherwise(F.lit("low"))
            .alias("direction"),
        )
        .orderBy("day_str")
    )


@query(
    "q_revenue_bridge",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             CAST(SUM(CASE WHEN YEAR(o_orderdate) = 1999
                      THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS cents_p1,
             CAST(SUM(CASE WHEN YEAR(o_orderdate) = 2000
                      THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS cents_p2
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '2001-01-01 00:00:00'
      GROUP BY 1
    )
    SELECT CASE WHEN cents_p1 = 0 THEN 'new'
                WHEN cents_p2 = 0 THEN 'churned'
                WHEN cents_p2 > cents_p1 THEN 'expansion'
                ELSE 'contraction' END AS class,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents_p1) AS BIGINT) AS cents_p1,
           CAST(SUM(cents_p2) AS BIGINT) AS cents_p2,
           CAST(SUM(cents_p2 - cents_p1) AS BIGINT) AS delta_cents
    FROM per_cust GROUP BY 1 ORDER BY class
    """,
)
def q_revenue_bridge(spark, sf_dir):
    """REVENUE BRIDGE 1999→2000: the year-over-year revenue delta
    decomposed into NEW, CHURNED, EXPANSION, and CONTRACTION customer
    classes (delta_cents sums across classes to exactly the total YoY
    move — the waterfall every revenue review opens with).

    Scale shape: ONE scan with the two-year filter expressed as a
    TIMESTAMP RANGE so it reaches the parquet scan as a pushed filter
    (``year(col)`` would not push; a range predicate does), ONE
    customer-grain shuffle with both periods as conditional partial
    aggregates (no self-join of the two years, no second scan), then a
    bounded 4-row class rollup. Classification is exact integer-cents
    comparison; ties (equal nonzero revenue) land in 'contraction' on
    both engines by the shared CASE order."""
    o = read_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    per_cust = (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("2001-01-01").cast("timestamp_ntz"))
        )
        .groupBy("o_custkey")
        .agg(
            F.sum(F.when(yr == 1999, cents).otherwise(0))
            .cast("bigint")
            .alias("cents_p1"),
            F.sum(F.when(yr == 2000, cents).otherwise(0))
            .cast("bigint")
            .alias("cents_p2"),
        )
    )
    cls = (
        F.when(F.col("cents_p1") == 0, F.lit("new"))
        .when(F.col("cents_p2") == 0, F.lit("churned"))
        .when(F.col("cents_p2") > F.col("cents_p1"), F.lit("expansion"))
        .otherwise(F.lit("contraction"))
    )
    return (
        per_cust.groupBy(cls.alias("class"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("cents_p1").cast("bigint").alias("cents_p1"),
            F.sum("cents_p2").cast("bigint").alias("cents_p2"),
            F.sum(F.col("cents_p2") - F.col("cents_p1"))
            .cast("bigint")
            .alias("delta_cents"),
        )
        .orderBy("class")
    )
