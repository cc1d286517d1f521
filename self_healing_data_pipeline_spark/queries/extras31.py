"""Round-6 batch 13 (SURVEY.md §2.9/§2.11): LINK PREDICTION by
neighbor-set Jaccard over the shared co-occurrence graph (the
"which parts will be bought together next" recommender-graph op) and
an STL-lite SEASONAL DECOMPOSITION of daily revenue (trend /
weekday-seasonal / residual in exact integer millicents).

Both reuse shared machinery: the graph comes from `operators/graph.py`
(one definition, one oracle CTE — the q_part_triangles contract); the
decomposition composes the day-grain + calendar-bounded-window
discipline of q_changepoint_cusum and q_dow_seasonality."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.operators.graph import (
    CO_PAIR_CTE_SQL,
    co_order_edges,
)
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_graph_neighbor_jaccard",
    oracle=f"""
    WITH {CO_PAIR_CTE_SQL}, adj AS (
      SELECT p1 AS u, p2 AS v FROM cop
      UNION ALL
      SELECT p2 AS u, p1 AS v FROM cop
    ), deg AS (
      SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY 1
    ), wedges AS (
      SELECT a.v AS a, b.v AS b, CAST(COUNT(*) AS BIGINT) AS common
      FROM adj a JOIN adj b ON a.u = b.u AND a.v < b.v
      GROUP BY 1, 2
    ), cand AS (
      SELECT w.a, w.b, w.common FROM wedges w
      WHERE NOT EXISTS (SELECT 1 FROM cop c
                        WHERE c.p1 = w.a AND c.p2 = w.b)
    ), scored AS (
      SELECT c.a, c.b, c.common, da.d AS deg_a, db.d AS deg_b,
             CAST(c.common AS DOUBLE)
               / CAST(da.d + db.d - c.common AS DOUBLE) AS jaccard
      FROM cand c
      JOIN deg da ON c.a = da.u
      JOIN deg db ON c.b = db.u
    )
    SELECT a, b, common, deg_a, deg_b, jaccard
    FROM scored ORDER BY jaccard DESC, a, b LIMIT 20
    """,
)
def q_graph_neighbor_jaccard(spark, sf_dir):
    """LINK PREDICTION by neighbor-set Jaccard: for part pairs that
    are NOT yet co-purchased edges, |N(a)∩N(b)| / |N(a)∪N(b)| over
    the shared support-filtered co-occurrence graph — the classic
    similarity index that predicts the next edge; top-20 predicted
    links with their common-neighbor evidence.

    Determinism: common counts and degrees are exact integers; the
    score is ONE IEEE division of exact operands (union size by
    inclusion-exclusion, integer add/sub) — identical doubles both
    engines; total (score, a, b) tie-break.

    Scale shape: wedges enumerate at their center (volume Σ deg(c)² —
    support-filtering already caps it; the production knob is a hub
    cap on wedge centers, standard in link prediction); existing edges
    drop via LEFT ANTI against the edge list; degrees join back on the
    node key. Same Σ|block|² family as q_part_triangles, measured in
    the same probe."""
    li = read_table(spark, sf_dir, "lineitem")
    # Lineage truncation (round 11 convention, q_part_triangles note):
    # edges is read three times (both adj directions + the anti-join)
    # and adj three more (degrees + both wedge sides); AQE defeats
    # ReuseExchange across these subtrees, so each reference re-ran
    # the lineitem self-join. Materialize both once.
    edges = co_order_edges(li).localCheckpoint(eager=True)
    adj = (
        edges.select(F.col("p1").alias("u"), F.col("p2").alias("v"))
        .unionAll(edges.select(F.col("p2").alias("u"), F.col("p1").alias("v")))
        .localCheckpoint(eager=True)
    )
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    a = adj.select(F.col("u"), F.col("v").alias("a"))
    b = adj.select(F.col("u").alias("u2"), F.col("v").alias("b"))
    wedges = (
        a.join(b, (F.col("u") == F.col("u2")) & (F.col("a") < F.col("b")))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("common"))
    )
    cand = wedges.join(
        edges,
        (wedges["a"] == edges["p1"]) & (wedges["b"] == edges["p2"]),
        "left_anti",
    )
    scored = (
        cand.join(deg.select(F.col("u").alias("a"), F.col("d").alias("deg_a")), "a")
        .join(deg.select(F.col("u").alias("b"), F.col("d").alias("deg_b")), "b")
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("deg_a") + F.col("deg_b") - F.col("common")).cast("double"),
        )
    )
    return (
        scored.select("a", "b", "common", "deg_a", "deg_b", "jaccard")
        .orderBy(F.desc("jaccard"), F.asc("a"), F.asc("b"))
        .limit(20)
    )


@query(
    "q_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1
    ), tr AS (
      SELECT day, cents,
             SUM(cents * 1000) OVER w AS wsum,
             COUNT(*) OVER w AS wn
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ), t2 AS (
      SELECT day, cents,
             (wsum - ((wsum % wn) + wn) % wn) // wn AS trend_mc,
             cents * 1000 - (wsum - ((wsum % wn) + wn) % wn) // wn AS det_mc
      FROM tr
    ), seas AS (
      SELECT DAYOFWEEK(day) + 1 AS dow,
             SUM(det_mc) AS ssum, CAST(COUNT(*) AS BIGINT) AS sn
      FROM t2 GROUP BY 1
    ), s2 AS (
      SELECT dow, (ssum - ((ssum % sn) + sn) % sn) // sn AS seasonal_mc
      FROM seas
    ), mx AS (SELECT MAX(day) AS max_day FROM daily)
    SELECT STRFTIME(t.day, '%Y-%m-%d') AS day_str,
           t.cents,
           CAST(t.trend_mc AS BIGINT) AS trend_mc,
           CAST(s.seasonal_mc AS BIGINT) AS seasonal_mc,
           CAST(t.det_mc - s.seasonal_mc AS BIGINT) AS residual_mc
    FROM t2 t
    JOIN s2 s ON DAYOFWEEK(t.day) + 1 = s.dow, mx
    WHERE t.day > mx.max_day - INTERVAL 28 DAY
    ORDER BY day_str
    """,
)
def q_seasonal_decompose(spark, sf_dir):
    """STL-lite SEASONAL DECOMPOSITION of daily revenue: trend =
    centered 7-day moving average, seasonal = per-weekday mean of the
    detrended series, residual = the rest — reported for the last 28
    days in exact integer MILLICENTS. The decomposition behind
    q_seasonal_anomaly's adjusted thresholds, materialized as data.

    Determinism: every mean is exact-integer FLOOR division — written
    as (x − posmod(x, n)) / n on BOTH engines because DuckDB's `//`
    truncates while Spark's pmod form floors (they disagree on the
    negative detrended sums; the posmod form floors on both). The
    millicent scale keeps every intermediate < 2^53.

    Scale shape: the raw scan collapses map-side to the day grain;
    the centered-MA window and the weekday rollup run over the
    CALENDAR-BOUNDED grain (the q_changepoint_cusum class — its
    SinglePartition is over ~10³ rows regardless of fact volume);
    the 7-row seasonal profile broadcasts back."""
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "cents",
        F.sum(F.col("cents") * 1000).over(w).alias("wsum"),
        F.count(F.lit(1)).over(w).alias("wn"),
    )

    def floordiv(x, n):
        return ((x - F.pmod(x, n)) / n).cast("bigint")

    t2 = tr.select(
        "day",
        "cents",
        floordiv(F.col("wsum"), F.col("wn")).alias("trend_mc"),
        (F.col("cents") * 1000 - floordiv(F.col("wsum"), F.col("wn"))).alias(
            "det_mc"
        ),
    )
    dow = F.dayofweek("day").cast("bigint")
    seas = t2.groupBy(dow.alias("dow")).agg(
        F.sum("det_mc").alias("ssum"),
        F.count(F.lit(1)).cast("bigint").alias("sn"),
    )
    s2 = seas.select(
        "dow", floordiv(F.col("ssum"), F.col("sn")).alias("seasonal_mc")
    )
    mx = daily.agg(F.max("day").alias("max_day"))
    return (
        t2.join(F.broadcast(s2), dow == F.col("dow"))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("day") > F.date_sub(F.col("max_day"), 28))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day_str"),
            "cents",
            "trend_mc",
            "seasonal_mc",
            (F.col("det_mc") - F.col("seasonal_mc"))
            .cast("bigint")
            .alias("residual_mc"),
        )
        .orderBy("day_str")
    )
