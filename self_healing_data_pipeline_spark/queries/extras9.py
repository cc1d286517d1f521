"""Round-5 batch 4 (SURVEY.md §2.3/§2.9): time-series gap filling with
linear interpolation (the hypertable ``interpolate()`` companion to the
existing LOCF/date-series ops), bounded k-hop graph reach (the frontier
-expansion BFS pattern), and the FORWARD as-of join with tolerance
(click → next purchase within the hour) completing the as-of family.

Scale discipline: calendar-bounded ordered passes only, frontier joins
deduplicate per hop (never exponential), one shuffle per as-of side on
the join key, exact integer masses with at most two IEEE ops per
interpolated value (one divide, one add — identical operand order on
both engines, hence bit-exact)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.functions.scalar import ts_str
from self_healing_data_pipeline_spark.operators.graph import (
    CO_PAIR_CTE_SQL as _CO_PAIR_CTE,
    co_order_edges,
)
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_interpolate_hourly",
    oracle="""
    WITH present AS (
      SELECT DATE_TRUNC('hour', ts) AS hr,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' AND value >= 150.0
      GROUP BY 1
    ), cal AS (
      SELECT UNNEST(GENERATE_SERIES((SELECT MIN(hr) FROM present),
                                    (SELECT MAX(hr) FROM present),
                                    INTERVAL 1 HOUR)) AS hr
    ), marked AS (
      SELECT c.hr, p.cents,
             CAST(EPOCH(c.hr) AS BIGINT) / 3600 AS eh
      FROM cal c LEFT JOIN present p ON c.hr = p.hr
    ), filled AS (
      SELECT hr, cents, eh,
             LAST_VALUE(cents IGNORE NULLS) OVER
               (ORDER BY eh ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prev_c,
             LAST_VALUE(CASE WHEN cents IS NOT NULL THEN eh END IGNORE NULLS)
               OVER (ORDER BY eh
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prev_h,
             FIRST_VALUE(cents IGNORE NULLS) OVER
               (ORDER BY eh ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_c,
             FIRST_VALUE(CASE WHEN cents IS NOT NULL THEN eh END IGNORE NULLS)
               OVER (ORDER BY eh
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_h
      FROM marked
    )
    SELECT CAST(STRFTIME(hr, '%Y-%m-%d %H:%M:%S') AS VARCHAR) AS hour,
           CASE WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE)
                ELSE CAST(prev_c AS DOUBLE)
                     + CAST((next_c - prev_c) * (eh - prev_h) AS DOUBLE)
                       / CAST(next_h - prev_h AS DOUBLE)
           END AS revenue_cents,
           (cents IS NULL) AS is_interpolated
    FROM filled ORDER BY hr
    """,
)
def q_interpolate_hourly(spark, sf_dir):
    """Hourly revenue series for high-value purchases with LINEAR
    INTERPOLATION over missing hours — the time-series gap-fill op
    (TimescaleDB's ``interpolate()``; the LOCF companion already exists
    as ``q_events_attribution``'s fill pass).

    Plan: the present hours are one map-side-partial aggregate; the
    complete calendar comes from a bounded ``sequence()`` between the
    broadcast min/max scalars (≤ span hours — calendar-bounded, the
    q_orders_backlog discipline, so the single ordered pass over the
    grid is over bounded rows, never the event stream). prev/next
    anchors attach via two LOCF window scans (last/first IGNORE NULLS);
    the interpolated value is exact-integer numerators with ONE IEEE
    division and ONE add in the same operand order as the oracle —
    bit-exact cross-engine."""
    ev = read_table(spark, sf_dir, "events")
    present = (
        ev.where((F.col("event_type") == "purchase") & (F.col("value") >= 150.0))
        .groupBy(F.date_trunc("hour", "ts").alias("hr"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    # bounds via a window over the (bounded) present-hours aggregate +
    # limit(1): the calendar derives from the same exchange instead of
    # re-aggregating the event scan in a second branch
    wall = Window.partitionBy()
    cal = (
        present.select(
            F.min("hr").over(wall).alias("lo"), F.max("hr").over(wall).alias("hi")
        )
        .limit(1)
        .select(
            F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hr")
        )
    )
    marked = cal.join(present, "hr", "left").withColumn(
        "eh", (F.unix_timestamp("hr") / 3600).cast("bigint")
    )
    wb = Window.orderBy("eh").rowsBetween(Window.unboundedPreceding, 0)
    wf = Window.orderBy("eh").rowsBetween(0, Window.unboundedFollowing)
    filled = marked.select(
        "hr",
        "cents",
        "eh",
        F.last("cents", ignorenulls=True).over(wb).alias("prev_c"),
        F.last(
            F.when(F.col("cents").isNotNull(), F.col("eh")), ignorenulls=True
        ).over(wb).alias("prev_h"),
        F.first("cents", ignorenulls=True).over(wf).alias("next_c"),
        F.first(
            F.when(F.col("cents").isNotNull(), F.col("eh")), ignorenulls=True
        ).over(wf).alias("next_h"),
    )
    interp = F.col("prev_c").cast("double") + (
        ((F.col("next_c") - F.col("prev_c")) * (F.col("eh") - F.col("prev_h")))
        .cast("double")
        / (F.col("next_h") - F.col("prev_h")).cast("double")
    )
    return filled.select(
        ts_str("hr").alias("hour"),
        F.when(F.col("cents").isNotNull(), F.col("cents").cast("double"))
        .otherwise(interp)
        .alias("revenue_cents"),
        F.col("cents").isNull().alias("is_interpolated"),
    ).orderBy("hr")


@query(
    "q_khop_reach",
    oracle=f"""
    WITH {_CO_PAIR_CTE}, e AS (
      SELECT p1, p2 FROM cop
    ), adj AS (
      SELECT p1 AS s, p2 AS d FROM e UNION ALL SELECT p2, p1 FROM e
    ), seeds AS (
      SELECT DISTINCT s AS p FROM adj WHERE s % 100 = 0
    ), v1 AS (
      SELECT d AS p FROM adj JOIN seeds ON adj.s = seeds.p
      UNION SELECT p FROM seeds
    ), v2 AS (
      SELECT d AS p FROM adj JOIN v1 ON adj.s = v1.p
      UNION SELECT p FROM v1
    ), v3 AS (
      SELECT d AS p FROM adj JOIN v2 ON adj.s = v2.p
      UNION SELECT p FROM v2
    )
    SELECT k, n_reached FROM (
      SELECT CAST(1 AS INT) AS k, CAST((SELECT COUNT(*) FROM v1
        WHERE p NOT IN (SELECT p FROM seeds)) AS BIGINT) AS n_reached
      UNION ALL
      SELECT CAST(2 AS INT), CAST((SELECT COUNT(*) FROM v2
        WHERE p NOT IN (SELECT p FROM seeds)) AS BIGINT)
      UNION ALL
      SELECT CAST(3 AS INT), CAST((SELECT COUNT(*) FROM v3
        WHERE p NOT IN (SELECT p FROM seeds)) AS BIGINT)
    ) ORDER BY k
    """,
)
def q_khop_reach(spark, sf_dir):
    """Bounded k-hop reach (BFS frontier expansion) from a fixed seed
    set on the support-filtered part co-occurrence graph: how many
    distinct parts are within 1, 2, 3 hops of the seed parts — the
    iterative graph-traversal pattern (recommendation radius, blast-
    radius/impact analysis) expressed as per-hop frontier joins.

    Scale shape: each hop is ONE equi-join of the visited set against
    the adjacency list followed by a DISTINCT — the dedup per hop is
    what keeps expansion bounded by |V| instead of walks (exponential).
    Visited sets only ever carry node ids. The oracle unrolls the same
    three hops as chained CTEs.

    Lineage truncation (round 11): iterative frontier loops grow the
    logical plan multiplicatively — hop k's visited embeds k copies of
    the edge-build lineage, and the per-hop outputs re-execute each
    other's prefixes (measured: 224 parquet scans / 524 exchanges /
    ZERO reused in one q_khop_reach action). ``localCheckpoint`` after
    the edge build and after each hop's dedup is the standard
    iterative-plan discipline (what GraphX/MLlib checkpointing exists
    for): the adjacency is computed ONCE, each hop's visited set
    materializes once at id grain, and every downstream consumer reads
    the truncated plan — on a 1000-executor cluster this is the
    difference between one shuffle per hop and re-running the lineitem
    self-join per hop per output."""
    li = read_table(spark, sf_dir, "lineitem")
    e = co_order_edges(li)
    adj = (
        e.select(F.col("p1").alias("s"), F.col("p2").alias("d"))
        .unionAll(e.select(F.col("p2").alias("s"), F.col("p1").alias("d")))
        .localCheckpoint(eager=True)
    )
    seeds = (
        adj.select(F.col("s").alias("p"))
        .where(F.col("p") % 100 == 0)
        .distinct()
        .localCheckpoint(eager=True)
    )
    visited = seeds
    outs = []
    for k in (1, 2, 3):
        frontier = (
            visited.join(adj, visited.p == adj.s).select(F.col("d").alias("p"))
        )
        visited = visited.unionAll(frontier).distinct().localCheckpoint(
            eager=True
        )
        reached = visited.join(seeds, "p", "left_anti").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_reached")
        )
        outs.append(reached.select(F.lit(k).cast("int").alias("k"), "n_reached"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("k")


@query(
    "q_join_asof_fwd",
    oracle="""
    SELECT c.event_id,
           CAST(STRFTIME((SELECT MIN(p.ts) FROM events p
                           WHERE p.event_type = 'purchase'
                             AND p.user_id = c.user_id
                             AND p.ts >= c.ts
                             AND p.ts <= c.ts + INTERVAL 60 MINUTE),
                         '%Y-%m-%d %H:%M:%S') AS VARCHAR) AS next_purchase,
           CAST(FLOOR((EPOCH_US((SELECT MIN(p.ts) FROM events p
                                  WHERE p.event_type = 'purchase'
                                    AND p.user_id = c.user_id
                                    AND p.ts >= c.ts
                                    AND p.ts <= c.ts + INTERVAL 60 MINUTE))
                       - EPOCH_US(c.ts)) / 60000000) AS BIGINT) AS mins_to
    FROM events c WHERE c.event_type = 'click'
    """,
)
def q_join_asof_fwd(spark, sf_dir):
    """FORWARD as-of join with tolerance: each click matched to the
    user's FIRST purchase at or after it, but only within 60 minutes —
    the conversion-attribution twin of the backward ``q_join_asof``,
    completing the as-of family (backward, forward, bounded).

    Same union+window composition (never a per-row subquery — the
    correlated form is the oracle): clicks and purchases union, ONE
    shuffle on user_id, a descending scan carries the nearest future
    purchase timestamp via LOCF (purchases sort before clicks at equal
    ts so "at or after" includes exact ties), and the tolerance applies
    as a final filter on the exact µs gap."""
    ev = read_table(spark, sf_dir, "events")
    both = ev.where(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        (F.col("event_type") == "click").cast("int").alias("is_click"),
        F.when(F.col("event_type") == "purchase", F.col("ts")).alias("p_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("is_click").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    nxt = both.withColumn(
        "next_p", F.last("p_ts", ignorenulls=True).over(w)
    ).where(F.col("is_click") == 1)
    gap_us = F.unix_micros(F.col("next_p").cast("timestamp")) - F.unix_micros(
        F.col("ts").cast("timestamp")
    )
    within = F.col("next_p").isNotNull() & (gap_us <= 60 * 60 * 1000 * 1000)
    return nxt.select(
        "event_id",
        F.when(within, ts_str("next_p")).alias("next_purchase"),
        F.when(within, F.floor(gap_us / F.lit(60_000_000)).cast("bigint")).alias(
            "mins_to"
        ),
    )
