"""Round-6 batch 40 (SURVEY.md §2.8 date functions / §2.9 analytics):
BUSINESS-DAY LEAD TIME (order → ship elapsed in weekday counts via the
closed-form Monday-epoch formula — no calendar spine, no UDF) and the
MANN-KENDALL TREND TEST (the standard non-parametric "is this series
trending" statistic over the daily-revenue series, exact integer S and
tie-corrected variance).

Exactness: business days are pure integer arithmetic; Mann-Kendall's S
and variance numerator are exact BIGINTs (money as exact cents), with
one final sqrt/division in IEEE double written identically on both
engines."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# 1970-01-05 is a Monday: f(n) = 5*(n div 7) + least(n mod 7, 5) counts
# the weekdays in [epoch, epoch+n) — the prefix-sum trick that turns
# "business days between two dates" into f(b) - f(a) with no calendar
# table. All fixture dates are after the epoch, so div/mod floor- vs
# truncate-division semantics never diverge.
_EPOCH_MONDAY = "1970-01-05"


@query(
    "q_business_days",
    oracle=f"""
    WITH b AS (
      SELECT STRFTIME(l_shipdate, '%Y-%m') AS ship_month,
             (5 * ((CAST(l_shipdate AS DATE) - DATE '{_EPOCH_MONDAY}') // 7)
              + LEAST((CAST(l_shipdate AS DATE) - DATE '{_EPOCH_MONDAY}') % 7, 5))
             - (5 * ((CAST(o_orderdate AS DATE) - DATE '{_EPOCH_MONDAY}') // 7)
                + LEAST((CAST(o_orderdate AS DATE) - DATE '{_EPOCH_MONDAY}') % 7, 5))
               AS bdays
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT ship_month,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(bdays) AS BIGINT) AS total_bdays,
           CAST(SUM(bdays) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS avg_bdays,
           CAST(MIN(bdays) AS BIGINT) AS min_bdays,
           CAST(MAX(bdays) AS BIGINT) AS max_bdays
    FROM b GROUP BY ship_month ORDER BY ship_month
    """,
)
def q_business_days(spark, sf_dir):
    """BUSINESS-DAY LEAD TIME: order→ship elapsed counted in weekdays
    (Mon–Fri), rolled up per ship month — the ops metric calendar-day
    datediff overstates by ~40% across weekends. The weekday count
    uses the Monday-epoch closed form f(n) = 5·(n div 7) +
    min(n mod 7, 5), so "business days between a and b" is f(b)−f(a):
    two integer expressions per row, no generated calendar spine, no
    per-row Python.

    Scale shape: one fact⋈fact equi-join on the natural key
    (l_orderkey = o_orderkey — co-partitionable / bucketable at
    warehouse scale), then a month-grain partial aggregate. No
    windows, no driver collection; sums are exact integers."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )

    def weekdays_since_epoch(col: str):
        n = F.datediff(F.col(col), F.lit(_EPOCH_MONDAY).cast("date"))
        return 5 * F.floor(n / 7) + F.least(n % 7, F.lit(5))

    b = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
        (
            weekdays_since_epoch("l_shipdate")
            - weekdays_since_epoch("o_orderdate")
        ).alias("bdays"),
    )
    return (
        b.groupBy("ship_month")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum("bdays").cast("bigint").alias("total_bdays"),
            (
                F.sum("bdays").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_bdays"),
            F.min("bdays").cast("bigint").alias("min_bdays"),
            F.max("bdays").cast("bigint").alias("max_bdays"),
        )
        .orderBy("ship_month")
    )


@query(
    "q_mann_kendall",
    oracle="""
    WITH daily AS (
      SELECT o_orderdate AS d,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1
    ), s AS (
      SELECT CAST(SUM(CASE WHEN b.cents > a.cents THEN 1
                           WHEN b.cents < a.cents THEN -1
                           ELSE 0 END) AS BIGINT) AS s_stat
      FROM daily a JOIN daily b ON a.d < b.d
    ), n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily
    ), ties AS (
      SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie_term
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY cents)
      WHERE t > 1
    )
    SELECT n.n_days, s.s_stat,
           CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                - ties.tie_term AS BIGINT) AS var_num18,
           CASE WHEN s.s_stat > 0 THEN CAST(s.s_stat - 1 AS DOUBLE)
                  / SQRT(CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                              - ties.tie_term AS DOUBLE) / CAST(18 AS DOUBLE))
                WHEN s.s_stat < 0 THEN CAST(s.s_stat + 1 AS DOUBLE)
                  / SQRT(CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5)
                              - ties.tie_term AS DOUBLE) / CAST(18 AS DOUBLE))
                ELSE CAST(0 AS DOUBLE) END AS z_stat,
           CASE WHEN s.s_stat > 0 THEN 'increasing'
                WHEN s.s_stat < 0 THEN 'decreasing'
                ELSE 'no_trend' END AS trend
    FROM n CROSS JOIN s CROSS JOIN ties
    """,
)
def q_mann_kendall(spark, sf_dir):
    """MANN-KENDALL TREND TEST over the daily-revenue series: S =
    Σ_{i<j} sign(x_j − x_i), tie-corrected variance numerator
    n(n−1)(2n+5) − Σ t(t−1)(2t+5) (kept ×18 as an exact BIGINT), and
    the continuity-corrected z — the standard non-parametric monotone-
    trend detector (Mann 1945 / Kendall 1975), used here as the "is
    revenue actually drifting" gate a forecasting pipeline runs before
    fitting anything.

    Scale shape: the fact table collapses to the DAY grain first
    (exact cents), so the pairwise sign sum runs on a CALENDAR-BOUNDED
    series (~2.4k days regardless of SF — pairs ≈ 3M, constant); the
    self-join is broadcast on one side. Everything up to the final
    sqrt/division is exact integer arithmetic."""
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("d")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    a = daily.alias("a")
    b = daily.alias("b")
    s = a.join(F.broadcast(b), F.col("a.d") < F.col("b.d")).agg(
        F.sum(
            F.when(F.col("b.cents") > F.col("a.cents"), 1)
            .when(F.col("b.cents") < F.col("a.cents"), -1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("s_stat")
    )
    n = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    ties = (
        daily.groupBy("cents")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    var_num18 = (
        F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
        - F.col("tie_term")
    ).cast("bigint")
    var_s = var_num18.cast("double") / F.lit(18).cast("double")
    z = (
        F.when(
            F.col("s_stat") > 0,
            (F.col("s_stat") - 1).cast("double") / F.sqrt(var_s),
        )
        .when(
            F.col("s_stat") < 0,
            (F.col("s_stat") + 1).cast("double") / F.sqrt(var_s),
        )
        .otherwise(F.lit(0).cast("double"))
    )
    return (
        n.crossJoin(F.broadcast(s))
        .crossJoin(F.broadcast(ties))
        .select(
            "n_days",
            "s_stat",
            var_num18.alias("var_num18"),
            z.alias("z_stat"),
            F.when(F.col("s_stat") > 0, "increasing")
            .when(F.col("s_stat") < 0, "decreasing")
            .otherwise("no_trend")
            .alias("trend"),
        )
    )
