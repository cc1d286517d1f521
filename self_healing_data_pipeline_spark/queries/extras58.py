"""Round-6 batch 41 (SURVEY.md §2.4 aggregates / §2.9 analytics):
WILSON LOWER-BOUND RANKING (the small-sample-safe way to rank entities
by a proportion — a supplier with 3/3 clean lines must NOT outrank one
with 980/1000) and the LORENZ CURVE (the decile-grain cumulative-share
table behind every inequality / concentration chart — the curve whose
area is the Gini q_gini_concentration already reports).

Exactness: successes/trials are exact BIGINTs; Wilson's one formula is
an identically-written IEEE chain on both engines. Lorenz ranks are
exact integers from the two-phase banded rank (no global sort); decile
sums are exact cents; shares are final mirrored divisions."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# Same fixed banding as q_gini_concentration: cents >> 20 ≈ $10.5k
# bands keep the phase-1 offset table at "thousands of rows" no matter
# how many customers exist.
_BAND_SHIFT = 20
_TOP = 25


@query(
    "q_wilson_ranking",
    oracle="""
    WITH s AS (
      SELECT l_suppkey,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS kept
      FROM lineitem GROUP BY 1
    ), w AS (
      SELECT l_suppkey, n_lines, kept,
             CAST(kept AS DOUBLE) / CAST(n_lines AS DOUBLE) AS phat,
             ((CAST(kept AS DOUBLE) / CAST(n_lines AS DOUBLE))
              + (1.96 * 1.96) / (2 * CAST(n_lines AS DOUBLE))
              - 1.96 * SQRT(((CAST(kept AS DOUBLE) / CAST(n_lines AS DOUBLE))
                             * (1 - CAST(kept AS DOUBLE) / CAST(n_lines AS DOUBLE))
                             + (1.96 * 1.96) / (4 * CAST(n_lines AS DOUBLE)))
                            / CAST(n_lines AS DOUBLE)))
             / (1 + (1.96 * 1.96) / CAST(n_lines AS DOUBLE)) AS wilson_lb
      FROM s
    )
    SELECT w.l_suppkey AS suppkey, sup.s_name, w.n_lines, w.kept,
           w.phat, w.wilson_lb
    FROM w JOIN supplier sup ON w.l_suppkey = sup.s_suppkey
    ORDER BY w.wilson_lb DESC, w.l_suppkey LIMIT 25
    """,
)
def q_wilson_ranking(spark, sf_dir):
    """WILSON 95% LOWER-BOUND RANKING of suppliers by clean-line
    proportion (lines not returned): lb = (p̂ + z²/2n − z·√((p̂(1−p̂) +
    z²/4n)/n)) / (1 + z²/n), z = 1.96 — the ranking rule (Wilson 1927;
    the "How Not To Sort By Average Rating" fix) that discounts
    small-sample perfection instead of letting 3/3 beat 980/1000.

    Scale shape: one supplier-grain partial aggregate over the fact
    table (exact integer successes/trials), the formula as a pure
    column expression, broadcast dim join for the name, and a top-25
    TakeOrderedAndProject with a unique tie-break. The z=1.96 chain is
    written token-for-token the same in both engines so constant
    folding yields bit-identical doubles."""
    li = read_table(spark, sf_dir, "lineitem")
    sup = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    s = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum(F.when(F.col("l_returnflag") != "R", 1).otherwise(0))
        .cast("bigint")
        .alias("kept"),
    )
    nd = F.col("n_lines").cast("double")
    phat = F.col("kept").cast("double") / nd
    z = F.lit(1.96)
    z2 = z * z
    lb = (
        phat + z2 / (2 * nd) - z * F.sqrt((phat * (1 - phat) + z2 / (4 * nd)) / nd)
    ) / (1 + z2 / nd)
    return (
        s.withColumn("phat", phat)
        .withColumn("wilson_lb", lb)
        .join(sup, F.col("suppkey") == F.col("s_suppkey"))
        .select("suppkey", "s_name", "n_lines", "kept", "phat", "wilson_lb")
        .orderBy(F.col("wilson_lb").desc(), "suppkey")
        .limit(_TOP)
    )


@query(
    "q_lorenz_curve",
    oracle="""
    WITH rev AS (
      SELECT o_custkey AS custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1
    ), ranked AS (
      SELECT custkey, cents,
             ROW_NUMBER() OVER (ORDER BY cents, custkey) AS i,
             COUNT(*) OVER () AS n
      FROM rev
    ), dec AS (
      SELECT CAST(((i - 1) * 10) // n + 1 AS BIGINT) AS decile,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(cents) AS BIGINT) AS decile_cents
      FROM ranked GROUP BY 1
    )
    SELECT decile, n_customers, decile_cents,
           CAST(SUM(decile_cents) OVER w AS BIGINT) AS cum_cents,
           CAST(SUM(n_customers) OVER w AS DOUBLE)
             / CAST(SUM(n_customers) OVER () AS DOUBLE) AS cum_pop_share,
           CAST(SUM(decile_cents) OVER w AS DOUBLE)
             / CAST(SUM(decile_cents) OVER () AS DOUBLE) AS cum_rev_share
    FROM dec
    WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW)
    ORDER BY decile
    """,
)
def q_lorenz_curve(spark, sf_dir):
    """LORENZ CURVE: customers sorted by lifetime revenue, split into
    population deciles, each row carrying the cumulative population
    and revenue shares — the 10-point curve behind "the bottom 50% of
    customers contribute 8% of revenue" (its enclosed area is the Gini
    q_gini_concentration reports; q_pareto_8020 is one point of it).

    Scale shape: customer-grain exact-cents aggregate, then the exact
    global rank WITHOUT a total-order sort — the q_gini two-phase
    banded rank (cents >> 20 band counts → band-grain cumulative
    offsets over BOUNDED band rows, + within-band row_number
    partitioned by band). Deciles come from pure integer math on
    (rank, n); the final cumulative window runs over exactly 10 rows.
    The band-offset frame KEEPS its broadcast hint: bands are value-
    domain grain (customer lifetime cents >> _BAND_SHIFT) and the spend
    distribution is SF-invariant, so the band count saturates at the
    fixed spend range rather than growing with the corpus — audited in
    tools/broadcast_census.py::BOUNDED_BUILD with decade evidence.
    Oracle keeps the plain ROW_NUMBER formulation."""
    orders = read_table(spark, sf_dir, "orders")
    rev = orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    ).withColumn("band", F.shiftright(F.col("cents"), _BAND_SHIFT))
    # Phase 1: band-grain counts -> cumulative offsets (bounded rows).
    bands = rev.groupBy("band").agg(F.count(F.lit(1)).alias("band_n"))
    wb = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = bands.select(
        "band",
        (F.sum("band_n").over(wb) - F.col("band_n")).alias("offset"),
        F.sum("band_n").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    # Phase 2: exact global rank = band offset + within-band row_number.
    ww = Window.partitionBy("band").orderBy("cents", "custkey")
    ranked = rev.join(F.broadcast(offsets), "band").withColumn(
        "i", F.col("offset") + F.row_number().over(ww)
    )
    dec = ranked.groupBy(
        (F.expr("((i - 1) * 10) div n").cast("bigint") + 1).alias("decile")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("decile_cents"),
    )
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        dec.select(
            "decile",
            "n_customers",
            "decile_cents",
            F.sum("decile_cents").over(wc).cast("bigint").alias("cum_cents"),
            (
                F.sum("n_customers").over(wc).cast("double")
                / F.sum("n_customers").over(wall).cast("double")
            ).alias("cum_pop_share"),
            (
                F.sum("decile_cents").over(wc).cast("double")
                / F.sum("decile_cents").over(wall).cast("double")
            ).alias("cum_rev_share"),
        )
        .orderBy("decile")
    )
