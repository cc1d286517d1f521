"""Round-6 batch 27 (SURVEY.md §2.4 statistics): GROUPED OLS
REGRESSION (slope / intercept / R² per segment — the profiler's
trend-fit panel, one moment pass, no per-group jobs) and GINI
CONCENTRATION (revenue inequality per nation via a two-phase bucketed
rank — the global-sort-free form of the classic Lorenz/Gini audit).

Both reuse q_corr_matrix's exactness discipline (extras42): doubles
become integer cents, every accumulated moment is an exact integer
(centered where magnitudes demand it), and the only floating-point
steps are final mirrored IEEE chains identical in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# Revenue-cents band width (2^20 cents ≈ $10.5k) for the two-phase
# rank: per-(nation, band) populations stay balanced and the band
# table is bounded (≈ max_revenue / 2^20 rows per nation).
_BAND_SHIFT = 20


@query(
    "q_regr_slope",
    oracle="""
    WITH c AS (
      SELECT l_returnflag AS grp,
             CAST(ROUND(l_quantity * 100) AS BIGINT) AS x,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
      FROM lineitem
    ), m AS (
      SELECT grp, SUM(x) // COUNT(*) AS mx, SUM(y) // COUNT(*) AS my
      FROM c GROUP BY grp
    ), moms AS (
      SELECT c.grp,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(CAST(SUM((c.x - m.mx) * (c.y - m.my)) AS BIGINT)
               AS DOUBLE) AS sxy,
             CAST(CAST(SUM((c.x - m.mx) * (c.x - m.mx)) AS BIGINT)
               AS DOUBLE) AS sxx,
             CAST(CAST(SUM((c.y - m.my) * (c.y - m.my)) AS BIGINT)
               AS DOUBLE) AS syy,
             CAST(CAST(SUM(c.x - m.mx) AS BIGINT) AS DOUBLE) AS sx,
             CAST(CAST(SUM(c.y - m.my) AS BIGINT) AS DOUBLE) AS sy
      FROM c JOIN m ON c.grp = m.grp
      GROUP BY c.grp
    )
    SELECT grp AS returnflag, n_rows AS n,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy / n - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
             * (sx / n)) AS intercept_centered,
           ((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
    FROM moms ORDER BY returnflag
    """,
)
def q_regr_slope(spark, sf_dir):
    """GROUPED OLS: per return flag, the least-squares fit of
    extendedprice on quantity — slope (price per unit quantity, cents
    per cent so the ×100 scaling cancels), the centered intercept, and
    R² — the trend line a profiler draws on every scatter panel.

    Exactness (the q_corr_matrix discipline, extras42): cents are
    exact ints, per-group integer floor means center the moments so
    n·variance-scale sums stay in int64, and slope/intercept/R² are
    mirrored IEEE chains over correctly-rounded BIGINT→DOUBLE hops.

    Scale shape: tiny group-means aggregate broadcast back, then ONE
    partial-aggregated moment pass grouped by flag — adding groups
    widens the shuffle key, never adds passes. No SinglePartition."""
    li = read_table(spark, sf_dir, "lineitem")
    c = li.select(
        F.col("l_returnflag").alias("grp"),
        F.round(F.col("l_quantity") * 100).cast("bigint").alias("x"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("y"),
    )
    sx_, sy_, n_ = F.sum("x"), F.sum("y"), F.count(F.lit(1))
    m = c.groupBy("grp").agg(
        ((sx_ - F.pmod(sx_, n_)) / n_).cast("bigint").alias("mx"),
        ((sy_ - F.pmod(sy_, n_)) / n_).cast("bigint").alias("my"),
    )
    j = c.join(F.broadcast(m), "grp")
    cx, cy = F.col("x") - F.col("mx"), F.col("y") - F.col("my")
    moms = j.groupBy("grp").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(cx * cy).cast("bigint").cast("double").alias("sxy"),
        F.sum(cx * cx).cast("bigint").cast("double").alias("sxx"),
        F.sum(cy * cy).cast("bigint").cast("double").alias("syy"),
        F.sum(cx).cast("bigint").cast("double").alias("sx"),
        F.sum(cy).cast("bigint").cast("double").alias("sy"),
    )
    n, sxy, sxx = F.col("n"), F.col("sxy"), F.col("sxx")
    syy, sx, sy = F.col("syy"), F.col("sx"), F.col("sy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return moms.select(
        F.col("grp").alias("returnflag"),
        F.col("n_rows").alias("n"),
        slope.alias("slope"),
        (sy / n - slope * (sx / n)).alias("intercept_centered"),
        (
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("r2"),
    ).orderBy("returnflag")


@query(
    "q_gini_concentration",
    oracle="""
    WITH rev AS (
      SELECT c.c_nationkey AS nationkey, o.o_custkey,
             CAST(SUM(ROUND(o.o_totalprice * 100)) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ), ranked AS (
      SELECT nationkey, cents,
             ROW_NUMBER() OVER (PARTITION BY nationkey
                                ORDER BY cents, o_custkey) AS i
      FROM rev
    ), agg AS (
      SELECT nationkey,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS total_cents,
             CAST(SUM(CAST(i AS HUGEINT) * cents) AS HUGEINT) AS s_ix
      FROM ranked GROUP BY nationkey
    )
    SELECT nationkey, n, total_cents,
           CAST(CAST(2 * s_ix - (CAST(n AS HUGEINT) + 1) * total_cents
                 AS BIGINT) AS DOUBLE)
             / CAST(CAST(CAST(n AS HUGEINT) * total_cents AS BIGINT)
                 AS DOUBLE) AS gini
    FROM agg ORDER BY nationkey
    """,
)
def q_gini_concentration(spark, sf_dir):
    """GINI CONCENTRATION of customer revenue per nation: G =
    (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx) over revenues sorted ascending —
    the inequality audit behind "top 1% of customers drive X%" and
    the skew early-warning for partitioning keys.

    The global rank i is built WITHOUT a total-order sort: revenues
    band by cents >> 20 (fixed $10.5k bands), per-(nation, band)
    counts roll into cumulative offsets via a band-grain window
    (bounded rows — thousands, not customers), and each customer's
    rank is its band offset plus its within-band row_number. The
    two-phase trick q_shard_assign / the watermark audit use, applied
    to ranking; windows partition by nation(/band) so nothing is
    SinglePartition at any corpus size. Rank-weighted sums accumulate
    in decimal(38,0) (int64 overflows near 10⁹ customers); the final
    Gini is a mirrored IEEE chain over exact integers."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    rev = (
        orders.join(
            cust.select("c_custkey", "c_nationkey"),
            orders["o_custkey"] == cust["c_custkey"],
        )
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("o_custkey").alias("custkey"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100))
            .cast("bigint")
            .alias("cents")
        )
        .withColumn("band", F.shiftright(F.col("cents"), _BAND_SHIFT))
    )
    # Phase 1: band-grain counts → cumulative offsets (rows are
    # bounded: one per non-empty (nation, band)).
    bands = rev.groupBy("nationkey", "band").agg(
        F.count(F.lit(1)).alias("band_n")
    )
    wb = (
        Window.partitionBy("nationkey")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = bands.select(
        "nationkey",
        "band",
        (F.sum("band_n").over(wb) - F.col("band_n")).alias("offset"),
    )
    # Phase 2: within-band rank + band offset = exact global rank.
    ww = Window.partitionBy("nationkey", "band").orderBy("cents", "custkey")
    ranked = (
        rev.join(offsets, ["nationkey", "band"])
        .withColumn("i", F.col("offset") + F.row_number().over(ww))
    )
    agg = ranked.groupBy("nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.sum(
            F.col("i").cast("decimal(38,0)") * F.col("cents")
        ).alias("s_ix"),
    )
    two_six = F.lit(2).cast("decimal(38,0)") * F.col("s_ix")
    np1_t = (
        (F.col("n").cast("decimal(38,0)") + 1)
        * F.col("total_cents").cast("decimal(38,0)")
    )
    n_t = (
        F.col("n").cast("decimal(38,0)")
        * F.col("total_cents").cast("decimal(38,0)")
    )
    return agg.select(
        "nationkey",
        "n",
        "total_cents",
        (
            (two_six - np1_t).cast("bigint").cast("double")
            / n_t.cast("bigint").cast("double")
        ).alias("gini"),
    ).orderBy("nationkey")
