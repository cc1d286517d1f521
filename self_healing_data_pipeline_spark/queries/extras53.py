"""Round-6 batch 35 (SURVEY.md §2.4 analytics): HERFINDAHL-HIRSCHMAN
CONCENTRATION (supplier-revenue HHI per nation — the antitrust /
vendor-risk metric that complements q_gini_concentration's
inequality view WITHOUT needing ranks: HHI is a pure sum of squared
shares) and NEW-VS-RETURNING decomposition (each month's orders split
by whether the customer is ordering for the first time — the growth
panel every revenue dashboard opens with).

Exactness: HHI is Σs²/T² over exact integer cents (squares accumulate
in DECIMAL(38,0)/HUGEINT; the final ratio is one mirrored IEEE
chain); new-vs-returning is pure integer counting off a min-date
aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_hhi_concentration",
    oracle="""
    WITH rev AS (
      SELECT s.s_nationkey AS nationkey, l.l_suppkey,
             CAST(SUM(ROUND(l.l_extendedprice)) AS BIGINT) AS dollars
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ), agg AS (
      SELECT nationkey,
             CAST(COUNT(*) AS BIGINT) AS n_suppliers,
             CAST(SUM(dollars) AS BIGINT) AS total_dollars,
             SUM(CAST(dollars AS HUGEINT) * dollars) AS sum_sq
      FROM rev GROUP BY 1
    )
    SELECT nationkey, n_suppliers, total_dollars,
           CAST(CAST(sum_sq AS BIGINT) AS DOUBLE) * 10000.0
             / (CAST(total_dollars AS DOUBLE)
                * CAST(total_dollars AS DOUBLE)) AS hhi
    FROM agg ORDER BY nationkey
    """,
)
def q_hhi_concentration(spark, sf_dir):
    """HHI per nation over supplier revenue shares: HHI =
    10000·Σsᵢ²/T² (0–10000 scale; >2500 = highly concentrated) — the
    vendor-concentration risk gate. Rank-free by construction, so
    unlike Gini it needs NO ordering machinery: one supplier-grain
    aggregate, one nation-grain rollup.

    Exactness: revenue in integer DOLLARS (squares of cents overflow
    the 2^53 double fence at sf0.1; dollars keep Σs² correctly
    rounded through the BIGINT hop — the q_autocorrelation unit
    choice), squares summed in DECIMAL(38,0) (DuckDB HUGEINT), final
    HHI one mirrored IEEE chain.

    Scale shape: two partial-aggregated groupBys (supplier grain →
    nation grain) with the supplier dim broadcast — no window, no
    SinglePartition, adding nations/suppliers widens keys only."""
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    rev = (
        li.join(
            supp.select("s_suppkey", "s_nationkey"),
            li["l_suppkey"] == supp["s_suppkey"],
        )
        .groupBy(
            F.col("s_nationkey").alias("nationkey"),
            F.col("l_suppkey"),
        )
        .agg(
            F.sum(F.round("l_extendedprice")).cast("bigint").alias("dollars")
        )
    )
    agg = rev.groupBy("nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
        F.sum("dollars").cast("bigint").alias("total_dollars"),
        F.sum(
            F.col("dollars").cast("decimal(38,0)") * F.col("dollars")
        ).alias("sum_sq"),
    )
    return agg.select(
        "nationkey",
        "n_suppliers",
        "total_dollars",
        (
            F.col("sum_sq").cast("bigint").cast("double")
            * F.lit(10000.0)
            / (
                F.col("total_dollars").cast("double")
                * F.col("total_dollars").cast("double")
            )
        ).alias("hhi"),
    ).orderBy("nationkey")


@query(
    "q_new_vs_returning",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey, MIN(o_orderdate) AS first_date
      FROM orders GROUP BY 1
    ), tagged AS (
      SELECT STRFTIME(o.o_orderdate, '%Y-%m') AS order_month,
             (o.o_orderdate = f.first_date) AS is_first,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents,
             o.o_custkey
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    )
    SELECT order_month,
           CAST(SUM(CASE WHEN is_first THEN 1 ELSE 0 END) AS BIGINT)
             AS new_orders,
           CAST(SUM(CASE WHEN is_first THEN 0 ELSE 1 END) AS BIGINT)
             AS returning_orders,
           CAST(COUNT(DISTINCT CASE WHEN is_first THEN o_custkey END)
             AS BIGINT) AS new_customers,
           CAST(SUM(CASE WHEN is_first THEN cents ELSE 0 END) AS BIGINT)
             AS new_cents,
           CAST(SUM(CASE WHEN is_first THEN 0 ELSE cents END) AS BIGINT)
             AS returning_cents
    FROM tagged
    GROUP BY order_month
    ORDER BY order_month
    """,
)
def q_new_vs_returning(spark, sf_dir):
    """NEW VS RETURNING: each month's order count and revenue split by
    whether the order shares the customer's first-ever order date (all
    same-day first orders count as "new" — deterministic without an
    intra-day tie-break, which the fixture's date-grain timestamps
    couldn't support anyway). The acquisition-vs-retention growth
    panel, month over month.

    Scale shape: one customer-grain MIN aggregate joined back on the
    customer key (both sides shuffle-partitioned the same way — AQE
    plans one exchange each), then one month-grain conditional
    rollup. No window; the distinct new-customer count expands
    two-level (month, custkey) partial aggregation."""
    orders = read_table(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_date")
    )
    tagged = orders.join(firsts, "o_custkey").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        (F.col("o_orderdate") == F.col("first_date")).alias("is_first"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        "o_custkey",
    )
    return (
        tagged.groupBy("order_month")
        .agg(
            F.sum(F.when(F.col("is_first"), 1).otherwise(0))
            .cast("bigint")
            .alias("new_orders"),
            F.sum(F.when(F.col("is_first"), 0).otherwise(1))
            .cast("bigint")
            .alias("returning_orders"),
            F.countDistinct(
                F.when(F.col("is_first"), F.col("o_custkey"))
            )
            .cast("bigint")
            .alias("new_customers"),
            F.sum(F.when(F.col("is_first"), F.col("cents")).otherwise(0))
            .cast("bigint")
            .alias("new_cents"),
            F.sum(F.when(F.col("is_first"), 0).otherwise(F.col("cents")))
            .cast("bigint")
            .alias("returning_cents"),
        )
        .orderBy("order_month")
    )
