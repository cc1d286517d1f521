"""Round-6 batch 38 (SURVEY.md §2.4 / §2.1 storage): PARETO 80/20
(how many top users drive 80% of events — the power-user
concentration headcount, answered exactly without a global sort) and
the COLUMNAR ENCODING ADVISOR (per column: distinct ratio and
page-local run statistics → dictionary / RLE / plain recommendation —
the decision parquet writers make per column chunk, surfaced as a
report so a layout service can pick sort keys that maximize runs).

Exactness: the 80% threshold is an exact integer cross-multiplication
(5·cum ≥ 4·total); run counting is integer; the only doubles are
final mirrored ratios."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# Pages follow the q_compaction_bins file model: (ship month,
# orderkey % 8). Runs never span pages — exactly parquet's RLE scope.
_ADVISOR_COLS = ("l_returnflag", "l_linestatus", "l_quantity")


@query(
    "q_pareto_8020",
    oracle="""
    WITH per_user AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1
    ), vals AS (
      SELECT n_events, CAST(COUNT(*) AS BIGINT) AS n_users
      FROM per_user GROUP BY 1
    ), c AS (
      SELECT n_events, n_users,
             SUM(n_events * n_users) OVER w AS cum_events,
             SUM(n_users) OVER w AS cum_users
      FROM vals
      WINDOW w AS (ORDER BY n_events DESC ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW)
    ), t AS (
      SELECT CAST(SUM(n_events * n_users) AS BIGINT) AS total_events,
             CAST(SUM(n_users) AS BIGINT) AS total_users
      FROM vals
    )
    SELECT t.total_users, t.total_events,
           CAST(MIN(c.cum_users) AS BIGINT) AS n80_users,
           CAST(MIN(c.cum_users) AS DOUBLE)
             / CAST(t.total_users AS DOUBLE) AS n80_user_share
    FROM c CROSS JOIN t
    WHERE 5 * c.cum_events >= 4 * t.total_events
    GROUP BY t.total_users, t.total_events
    """,
)
def q_pareto_8020(spark, sf_dir):
    """PARETO 80/20 HEADCOUNT: the minimum number of heaviest users
    whose events cover ≥80% of all events — the "how concentrated is
    my traffic" scalar behind rate-limit and caching policy. The
    crossing point is found on the COUNT-VALUE grain (distinct
    per-user event counts — bounded by max activity, not user count),
    with the threshold as exact integers: 5·cum ≥ 4·total.

    Scale shape: user-grain count, then value-grain collapse, then
    the descending cumulative runs over the BOUNDED value frame (a
    scalar-frame-sized window, same class as the ACF/KS scalar
    passes); the crossing row reduces via MIN. Never sorts users."""
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    vals = per_user.groupBy("n_events").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    w = Window.orderBy(F.col("n_events").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = vals.select(
        "n_events",
        "n_users",
        F.sum(F.col("n_events") * F.col("n_users")).over(w).alias(
            "cum_events"
        ),
        F.sum("n_users").over(w).alias("cum_users"),
    )
    t = vals.agg(
        F.sum(F.col("n_events") * F.col("n_users"))
        .cast("bigint")
        .alias("total_events"),
        F.sum("n_users").cast("bigint").alias("total_users"),
    )
    return (
        c.crossJoin(F.broadcast(t))
        .where(5 * F.col("cum_events") >= 4 * F.col("total_events"))
        .groupBy("total_users", "total_events")
        .agg(F.min("cum_users").cast("bigint").alias("n80_users"))
        .select(
            "total_users",
            "total_events",
            "n80_users",
            (
                F.col("n80_users").cast("double")
                / F.col("total_users").cast("double")
            ).alias("n80_user_share"),
        )
    )


def _advisor_oracle() -> str:
    branches = []
    for col in _ADVISOR_COLS:
        val = (
            f"CAST(ROUND({col}) AS BIGINT)"
            if col == "l_quantity"
            else f"ASCII({col})"
        )
        branches.append(
            f"""
    SELECT '{col}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(COUNT(DISTINCT v) AS BIGINT) AS ndv,
           CAST(SUM(is_run_start) AS BIGINT) AS n_runs,
           CAST(COUNT(*) AS DOUBLE) / CAST(SUM(is_run_start) AS DOUBLE)
             AS avg_run_len,
           CASE WHEN COUNT(DISTINCT v) <= 16 AND
                     COUNT(*) >= 4 * SUM(is_run_start) THEN 'RLE_DICT'
                WHEN COUNT(DISTINCT v) <= 16 THEN 'DICT'
                ELSE 'PLAIN' END AS recommendation
    FROM (
      SELECT v,
             CASE WHEN LAG(v) OVER (PARTITION BY pg ORDER BY ok, ln, v)
                       IS DISTINCT FROM v THEN 1 ELSE 0 END AS is_run_start
      FROM (
        SELECT {val} AS v,
               STRFTIME(l_shipdate, '%Y-%m') || '/' ||
                 CAST(l_orderkey % 8 AS VARCHAR) AS pg,
               l_orderkey AS ok, l_linenumber AS ln
        FROM lineitem
      )
    )"""
        )
    return " UNION ALL ".join(branches) + " ORDER BY column_name"


@query("q_encoding_advisor", oracle=_advisor_oracle())
def q_encoding_advisor(spark, sf_dir):
    """COLUMNAR ENCODING ADVISOR: for each candidate column, the
    distinct-value count and the PAGE-LOCAL run statistics (runs
    counted within the q_compaction_bins page model — (ship month,
    orderkey%8) — never across pages, exactly parquet's RLE scope
    under the (orderkey, linenumber, value) write order — the value
    tie-break makes run counts total-order deterministic because the
    fixture's (orderkey, linenumber) is not unique, and equal-value
    ties are interchangeable for run counting), and the resulting
    encoding recommendation: ≤16 NDV with avg run ≥4 → RLE_DICT,
    ≤16 NDV → DICT, else PLAIN. The report a layout service reads to
    decide whether re-sorting a table would compress it.

    Scale shape: run starts come from a lag window PARTITIONED BY
    PAGE (pages are bounded, parallel — never a table-order global
    sort); each column's stats collapse in one partial-aggregated
    pass with a two-level distinct expand. Columns widen the union,
    not the data path. Values map to exact integers (ASCII first
    char / rounded quantity) so run equality is integer equality."""
    li = read_table(spark, sf_dir, "lineitem")
    pg = F.concat(
        F.date_format("l_shipdate", "yyyy-MM"),
        F.lit("/"),
        (F.col("l_orderkey") % 8).cast("string"),
    )
    outs = []
    for col in _ADVISOR_COLS:
        v = (
            F.round(F.col(col)).cast("bigint")
            if col == "l_quantity"
            else F.ascii(F.col(col))
        )
        base = li.select(
            v.alias("v"),
            pg.alias("pg"),
            F.col("l_orderkey").alias("ok"),
            F.col("l_linenumber").alias("ln"),
        )
        wl = Window.partitionBy("pg").orderBy("ok", "ln", "v")
        runs = base.withColumn(
            "is_run_start",
            F.when(
                ~F.lag("v").over(wl).eqNullSafe(F.col("v")), 1
            ).otherwise(0),
        )
        stats = runs.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_values"),
            F.countDistinct("v").cast("bigint").alias("ndv"),
            F.sum("is_run_start").cast("bigint").alias("n_runs"),
        )
        outs.append(
            stats.select(
                F.lit(col).alias("column_name"),
                "n_values",
                "ndv",
                "n_runs",
                (
                    F.col("n_values").cast("double")
                    / F.col("n_runs").cast("double")
                ).alias("avg_run_len"),
                F.when(
                    (F.col("ndv") <= 16)
                    & (F.col("n_values") >= 4 * F.col("n_runs")),
                    "RLE_DICT",
                )
                .when(F.col("ndv") <= 16, "DICT")
                .otherwise("PLAIN")
                .alias("recommendation"),
            )
        )
    out = outs[0]
    for x in outs[1:]:
        out = out.unionAll(x)
    return out.orderBy("column_name")
