"""Round-5 batch 7 (SURVEY.md §2.9): survival analysis — a
Kaplan-Meier estimator over user activity lifetimes with right
censoring at the observation boundary, the churn-analysis op one level
above the existing retention curves.

Determinism note (the hard part of KM cross-engine): the survival
curve is a RUNNING PRODUCT of IEEE factors, and windowed product
aggregates don't guarantee a fold order (segment trees reorder the
multiplies). Both sides therefore materialize the ordered factor array
ONCE (bounded by the observation window, ≤ span days) and compute each
row's survival as an EXPLICIT LEFT FOLD over its prefix —
``F.aggregate(slice(...), 1.0, acc*x)`` vs DuckDB
``list_reduce(list_prepend(1.0, fa[1:k]), ...)`` — the same
multiplication order, hence bit-exact."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_survival_km",
    oracle="""
    WITH u AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS f, MAX(CAST(ts AS DATE)) AS l
      FROM events WHERE event_type = 'purchase' AND value >= 100.0
      GROUP BY 1
    ), du AS (
      SELECT CAST(l - f AS BIGINT) AS dur,
             CASE WHEN l = (SELECT MAX(l) FROM u) THEN 1 ELSE 0 END AS cen
      FROM u
    ), pd AS (
      SELECT dur,
             CAST(SUM(1 - cen) AS BIGINT) AS deaths,
             CAST(SUM(cen) AS BIGINT) AS censored
      FROM du GROUP BY dur
    ), r AS (
      SELECT dur, deaths, censored,
             CAST(SUM(deaths + censored) OVER (ORDER BY dur DESC)
                  AS BIGINT) AS n_at_risk
      FROM pd
    ), fct AS (
      SELECT dur, deaths, censored, n_at_risk,
             1.0 - CAST(deaths AS DOUBLE) / CAST(n_at_risk AS DOUBLE)
               AS factor
      FROM r
    ), arr AS (
      SELECT LIST(factor ORDER BY dur) AS fa, LIST(dur ORDER BY dur) AS da
      FROM fct
    )
    SELECT f.dur, f.deaths, f.censored, f.n_at_risk,
           LIST_REDUCE(
             LIST_PREPEND(1.0, fa[1:LIST_POSITION(da, f.dur)]),
             (a, b) -> a * b
           ) AS survival
    FROM fct f, arr ORDER BY f.dur
    """,
)
def q_survival_km(spark, sf_dir):
    """Kaplan-Meier survival curve over PREMIUM-PURCHASE LIFETIMES:
    per user, duration = days between first and last high-value
    purchase (the sparse stream that actually spreads lifetimes); users whose
    last event falls on the corpus's final day are RIGHT-CENSORED
    (still alive at the observation boundary — they stay in the risk
    set but never count as churn). Per duration step: deaths, censored
    exits, the at-risk count (suffix sum over the bounded timeline),
    and S(d) = prod_{k<=d} (1 - deaths_k / n_k).

    Plan: one per-user aggregate (map-side partials) → per-duration
    counts → the timeline is CALENDAR-BOUNDED (<= observation-span
    rows), so the suffix-sum window and the broadcast factor array are
    bounded stages in the q_orders_backlog discipline; survival folds
    each prefix explicitly so the multiply order matches the oracle
    exactly (see module docstring)."""
    ev = read_table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase") & (F.col("value") >= 100.0)
    )
    u = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("f"), F.max(F.to_date("ts")).alias("l")
    )
    mx = u.agg(F.max("l").alias("m"))
    du = u.crossJoin(F.broadcast(mx)).select(
        F.datediff("l", "f").cast("bigint").alias("dur"),
        F.when(F.col("l") == F.col("m"), F.lit(1)).otherwise(F.lit(0)).alias("cen"),
    )
    pd_ = du.groupBy("dur").agg(
        F.sum(F.lit(1) - F.col("cen")).cast("bigint").alias("deaths"),
        F.sum("cen").cast("bigint").alias("censored"),
    )
    w_suffix = Window.orderBy("dur").rowsBetween(0, Window.unboundedFollowing)
    fct = pd_.withColumn(
        "n_at_risk",
        F.sum(F.col("deaths") + F.col("censored")).over(w_suffix).cast("bigint"),
    ).withColumn(
        "factor",
        F.lit(1.0)
        - F.col("deaths").cast("double") / F.col("n_at_risk").cast("double"),
    )
    arr = fct.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("dur"), F.col("factor")))
        ).alias("sf")
    ).select(
        F.transform("sf", lambda x: x["factor"]).alias("fa"),
        F.transform("sf", lambda x: x["dur"]).alias("da"),
    )
    return (
        fct.crossJoin(F.broadcast(arr))
        .select(
            "dur",
            "deaths",
            "censored",
            "n_at_risk",
            F.aggregate(
                F.slice("fa", 1, F.array_position("da", F.col("dur")).cast("int")),
                F.lit(1.0),
                lambda acc, x: acc * x,
            ).alias("survival"),
        )
        .orderBy("dur")
    )
