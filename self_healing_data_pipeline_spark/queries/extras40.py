"""Round-6 batch 22 (SURVEY.md §2.5 windows / §2.9): INVENTORY-FLOOR
running balance — the clamped recurrence stock = max(0, stock + δ)
that a plain running sum cannot express — solved in CLOSED FORM via
the Lindley reflection identity (W_n = S_n − min(0, min prefix S)),
so the "sequential" operator becomes two partitioned windows; and an
ACTIVITY HEATMAP (weekday × hour grid with exact-ppm shares), the
ops-dashboard staple.

The identity matters at 100 TB: the obvious implementation is a
per-key sequential fold (mapInPandas — the q_ema shape, one float of
Python state per key); the reflection form stays entirely in JVM
window aggregates with no Python worker in the path."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_inventory_floor",
    oracle="""
    WITH d AS (
      SELECT l_suppkey AS sk,
             CASE WHEN l_returnflag = 'R'
                  THEN CAST(ROUND(l_quantity) AS BIGINT)
                  ELSE -CAST(ROUND(l_quantity) AS BIGINT) END AS delta,
             l_shipdate AS o1, l_orderkey AS o2, l_linenumber AS o3
      FROM lineitem
    ), s AS (
      SELECT sk, delta, o1, o2, o3,
             SUM(delta) OVER (PARTITION BY sk ORDER BY o1, o2, o3, delta
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS ps
      FROM d
    ), s2 AS (
      SELECT sk, delta, ps,
             MIN(ps) OVER (PARTITION BY sk ORDER BY o1, o2, o3, delta
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS prev_min
      FROM s
    )
    SELECT sk AS suppkey,
           CAST(COUNT(*) AS BIGINT) AS n_moves,
           CAST(SUM(delta) AS BIGINT) AS net_delta,
           CAST(SUM(delta) - LEAST(CAST(0 AS BIGINT), MIN(ps)) AS BIGINT)
             AS final_stock,
           CAST(SUM(CASE WHEN ps < COALESCE(
                           LEAST(CAST(0 AS BIGINT), prev_min),
                           CAST(0 AS BIGINT))
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clamps
    FROM s2 GROUP BY sk ORDER BY sk
    """,
)
def q_inventory_floor(spark, sf_dir):
    """INVENTORY-FLOOR balance per supplier: receipts (+qty on
    returned lines) and issues (−qty) fold through the clamped
    recurrence stock = max(0, stock + δ) — which NO windowed running
    sum expresses directly. The LINDLEY REFLECTION identity solves it
    closed-form: W_n = S_n − min(0, min_k S_k), and a clamp fires at
    step i iff S_i < min(0, min_{k<i} S_k). Per supplier: moves, net
    delta, final floored stock, and how many times the floor bit.

    Plan: two per-supplier windows over exact integer prefix sums —
    entirely JVM-side, no sequential Python fold (the naive
    alternative), no SinglePartition. Bucketed-by-supplier layouts
    make the window exchange-free. Exact integers throughout; the
    (shipdate, orderkey, linenumber) order is total."""
    li = read_table(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity")).cast("bigint")
    d = li.select(
        F.col("l_suppkey").alias("sk"),
        F.when(F.col("l_returnflag") == "R", qty).otherwise(-qty).alias(
            "delta"
        ),
        F.col("l_shipdate").alias("o1"),
        F.col("l_orderkey").alias("o2"),
        F.col("l_linenumber").alias("o3"),
    )
    # ORDER TOTALITY (round-12 fix, found by the full-registry sf0.1
    # oracle sweep): the synthetic fixture's (l_orderkey, l_linenumber)
    # is NOT unique (118k duplicate pairs at sf0.1), so ordering by
    # (o1, o2, o3) alone left tied rows in arbitrary engine order and
    # the clamp count was NONDETERMINISTIC whenever tied rows carried
    # different deltas (exactly one such group at sf0.1 — the observed
    # ±1 flake). Appending delta as the last key makes tied rows fully
    # interchangeable for the recurrence: any order among rows equal on
    # (o1, o2, o3, delta) yields the identical prefix-sum sequence, so
    # both engines are deterministic and agree. TPC-H-strict data
    # (unique (orderkey, linenumber)) is unaffected.
    cur = Window.partitionBy("sk").orderBy("o1", "o2", "o3", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prev = Window.partitionBy("sk").orderBy("o1", "o2", "o3", "delta").rowsBetween(
        Window.unboundedPreceding, -1
    )
    s = d.withColumn("ps", F.sum("delta").over(cur))
    s2 = s.withColumn("prev_min", F.min("ps").over(prev))
    zero = F.lit(0).cast("bigint")
    prev_floor = F.coalesce(F.least(zero, F.col("prev_min")), zero)
    return (
        s2.groupBy(F.col("sk").alias("suppkey"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_moves"),
            F.sum("delta").cast("bigint").alias("net_delta"),
            (F.sum("delta") - F.least(zero, F.min("ps")))
            .cast("bigint")
            .alias("final_stock"),
            F.sum(F.when(F.col("ps") < prev_floor, 1).otherwise(0))
            .cast("bigint")
            .alias("n_clamps"),
        )
        .orderBy("suppkey")
    )


@query(
    "q_events_heatmap",
    oracle="""
    WITH g AS (
      SELECT DAYOFWEEK(CAST(ts AS DATE)) + 1 AS dow,
             HOUR(ts) AS hour,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT CAST(SUM(n_events) AS BIGINT) AS total FROM g
    )
    SELECT CAST(g.dow AS BIGINT) AS dow,
           CAST(g.hour AS BIGINT) AS hour,
           g.n_events,
           CAST(g.n_events * 1000000 // t.total AS BIGINT) AS share_ppm
    FROM g, tot t
    ORDER BY dow, hour
    """,
)
def q_events_heatmap(spark, sf_dir):
    """ACTIVITY HEATMAP: the weekday × hour event grid with exact-ppm
    shares — the ops-dashboard staple that shows traffic shape at a
    glance (and the input to q_dow_seasonality-style adjustments at
    hour grain).

    Scale shape: one partial-aggregated collapse to the ≤168-cell
    grid, broadcast 1-row total, integer ppm. DuckDB's DAYOFWEEK is
    0-based → +1 aligns with Spark (the q_dow_seasonality
    convention)."""
    e = read_table(spark, sf_dir, "events")
    g = e.groupBy(
        F.dayofweek(F.col("ts").cast("date")).cast("bigint").alias("dow"),
        F.hour("ts").cast("bigint").alias("hour"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    tot = g.agg(F.sum("n_events").cast("bigint").alias("total"))
    scaled = F.col("n_events") * F.lit(1000000)
    ppm = ((scaled - F.pmod(scaled, F.col("total"))) / F.col("total")).cast(
        "bigint"
    )
    return (
        g.crossJoin(F.broadcast(tot))
        .select("dow", "hour", "n_events", ppm.alias("share_ppm"))
        .orderBy("dow", "hour")
    )
