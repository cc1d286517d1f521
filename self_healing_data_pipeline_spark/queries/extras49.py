"""Round-6 batch 31 (SURVEY.md §2.4 analytics / §2.11 privacy):
DIFFERENCE-IN-DIFFERENCES uplift (the 2×2 causal estimator every
experimentation platform reports when only a natural pre/post split
exists) and the L-DIVERSITY audit (the sensitive-attribute companion
to q_k_anonymity — a k-anonymous group is still unsafe if everyone in
it shares the sensitive value).

Exactness: all four DiD cell means are exact-integer-cents sums over
exact counts with mirrored IEEE divisions; l-diversity is pure
integer counting on the same QI grain q_k_anonymity audits."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# Minimum distinct sensitive values per QI group (distinct
# l-diversity, Machanavajjhala et al. 2007).
_L = 3


@query(
    "q_did_uplift",
    oracle="""
    WITH j AS (
      SELECT (c.c_mktsegment = 'BUILDING') AS treated,
             (o.o_orderdate >= TIMESTAMP '1998-01-01') AS post,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), cells AS (
      SELECT treated, post,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS sum_cents,
             CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS mean_cents
      FROM j GROUP BY 1, 2
    ), wide AS (
      SELECT
        MAX(CASE WHEN treated AND post THEN mean_cents END) AS t_post,
        MAX(CASE WHEN treated AND NOT post THEN mean_cents END) AS t_pre,
        MAX(CASE WHEN NOT treated AND post THEN mean_cents END) AS c_post,
        MAX(CASE WHEN NOT treated AND NOT post THEN mean_cents END)
          AS c_pre,
        CAST(SUM(n) AS BIGINT) AS n_total
      FROM cells
    )
    SELECT n_total, t_pre, t_post, c_pre, c_post,
           (t_post - t_pre) AS treated_delta,
           (c_post - c_pre) AS control_delta,
           ((t_post - t_pre) - (c_post - c_pre)) AS did_cents
    FROM wide
    """,
)
def q_did_uplift(spark, sf_dir):
    """DIFFERENCE-IN-DIFFERENCES: did the BUILDING segment's average
    order value move differently across the 1998 boundary than
    everyone else's? DiD = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post −
    ȳ_C,pre) — the parallel-trends estimator an experimentation
    platform falls back to when treatment wasn't randomized (a
    segment-targeted promo, a regional rollout).

    Scale shape: ONE partial-aggregated 2×2 cell aggregate over the
    fact⋈broadcast-dim join, pivoted to a single row by conditional
    MAX over four cells — no window, no second pass. Cell means are
    exact-integer cents / exact counts; every subtraction is a
    mirrored IEEE chain."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    j = orders.join(
        cust.select("c_custkey", "c_mktsegment"),
        orders["o_custkey"] == cust["c_custkey"],
    ).select(
        (F.col("c_mktsegment") == "BUILDING").alias("treated"),
        (F.col("o_orderdate") >= F.lit("1998-01-01")).alias("post"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    cells = j.groupBy("treated", "post").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
    ).withColumn(
        "mean_cents",
        F.col("sum_cents").cast("double") / F.col("n").cast("double"),
    )

    def cell(t, p):
        return F.max(
            F.when(
                (F.col("treated") == t) & (F.col("post") == p),
                F.col("mean_cents"),
            )
        )

    wide = cells.agg(
        cell(True, True).alias("t_post"),
        cell(True, False).alias("t_pre"),
        cell(False, True).alias("c_post"),
        cell(False, False).alias("c_pre"),
        F.sum("n").cast("bigint").alias("n_total"),
    )
    return wide.select(
        "n_total",
        "t_pre",
        "t_post",
        "c_pre",
        "c_post",
        (F.col("t_post") - F.col("t_pre")).alias("treated_delta"),
        (F.col("c_post") - F.col("c_pre")).alias("control_delta"),
        (
            (F.col("t_post") - F.col("t_pre"))
            - (F.col("c_post") - F.col("c_pre"))
        ).alias("did_cents"),
    )


@query(
    "q_l_diversity",
    oracle=f"""
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment,
             (CAST(ROUND(c_acctbal * 100) AS BIGINT) + 1000000) // 100000
               - 10 AS bal_band,
             CAST(COUNT(*) AS BIGINT) AS grp_size,
             -- +1e6 shift: balances go negative and DuckDB's %
             -- truncates while Spark's pmod floors; they agree for
             -- non-negative dividends (1e6 % 10 = 0 keeps the digit)
             CAST(COUNT(DISTINCT
               ((CAST(ROUND(c_acctbal * 100) AS BIGINT) + 1000000) % 10)
             ) AS BIGINT) AS l_sensitive
      FROM customer GROUP BY 1, 2, 3
    )
    SELECT CAST(l_sensitive AS BIGINT) AS l_value,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(grp_size) AS BIGINT) AS n_rows,
           CAST(l_sensitive < {_L} AS BOOLEAN) AS at_risk
    FROM qi
    GROUP BY l_sensitive
    ORDER BY l_value
    """,
)
def q_l_diversity(spark, sf_dir):
    """L-DIVERSITY audit (l=3) on q_k_anonymity's QI grain (nation,
    segment, $1000 balance band): within each QI group, how many
    DISTINCT sensitive values (here the balance's last digit as the
    stand-in sensitive attribute) appear — a k-anonymous group whose
    members all share one sensitive value still leaks it, which is
    exactly what k-anonymity alone cannot see. Report: distribution
    of l across groups, rows in under-diverse groups flagged.

    Scale shape: ONE shuffle on the QI key with a distinct-count
    (partial aggregation on (QI, sensitive) then QI — Spark plans the
    two-level expand automatically), collapsed to a ≤l_max-row
    report. Pure integer counting; no floats anywhere."""
    cust = read_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    qi = cust.select(
        F.col("c_nationkey"),
        F.col("c_mktsegment"),
        (
            F.floor((cents + 1000000) / 100000) - 10
        ).cast("bigint").alias("bal_band"),
        F.pmod(cents + 1000000, F.lit(10)).alias("sensitive"),
    )
    groups = qi.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count(F.lit(1)).cast("bigint").alias("grp_size"),
        F.countDistinct("sensitive").cast("bigint").alias("l_sensitive"),
    )
    return (
        groups.groupBy(F.col("l_sensitive").alias("l_value"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("grp_size").cast("bigint").alias("n_rows"),
        )
        .withColumn("at_risk", F.col("l_value") < _L)
        .select("l_value", "n_groups", "n_rows", "at_risk")
        .orderBy("l_value")
    )
