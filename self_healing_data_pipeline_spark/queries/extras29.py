"""Round-6 batch 11 (SURVEY.md §2.9 streaming ops / reporting):
WATERMARK TUNING AUDIT (how many events each candidate watermark delay
would drop — the number that picks `withWatermark` in production) and
a SHIP-SLA attainment report (per-priority fraction shipped within
30/60/90 days, exact ppm).

Reference scope: operational lateness/SLA reporting over the delegated
SQL surface (`APP/services/pgliteService.ts:36-49`)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# Candidate watermark delays (minutes) — the tuning grid.
_WM_DELAYS = (1, 5, 15)
_SLA_DAYS = (30, 60, 90)


@query(
    "q_watermark_audit",
    oracle=f"""
    WITH arr AS (
      SELECT event_type,
             EPOCH_US(ts) AS us,
             MAX(EPOCH_US(ts)) OVER (PARTITION BY event_type
                                     ORDER BY event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS max_seen_us
      FROM events
    ), lateness AS (
      SELECT event_type,
             CASE WHEN max_seen_us IS NULL OR max_seen_us <= us THEN 0
                  ELSE max_seen_us - us END AS late_us
      FROM arr
    ), grid AS (
      SELECT * FROM (VALUES {", ".join(f"({d})" for d in _WM_DELAYS)})
        AS t(delay_min)
    )
    SELECT l.event_type,
           CAST(g.delay_min AS BIGINT) AS delay_min,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN l.late_us > g.delay_min * 60000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           CAST(SUM(CASE WHEN l.late_us > g.delay_min * 60000000
                         THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS dropped_ppm
    FROM lateness l, grid g
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_watermark_audit(spark, sf_dir):
    """WATERMARK TUNING AUDIT: for each candidate delay (1/5/15 min),
    how many events would arrive LATER than the watermark and be
    dropped by a streaming aggregation — the measurement that picks
    `withWatermark` in production instead of guessing. An event's
    lateness is (max event-time already seen in arrival order) − (its
    own event-time); arrival order is ingest id (event_id), the same
    convention as the repo's replay tests.

    Determinism: exact integer microseconds end-to-end; the drop rate
    is exact integer ppm (floor division).

    Scale shape: the arrival-order running max does NOT partition by
    event_type alone (a handful of types would serialize the scan at
    100× — the r4-verdict failure class); it uses the TWO-PHASE
    decomposition (q_pack_context's prefix-sum pattern, with max):
    arrival-contiguous event-id buckets → per-(type, bucket) maxima →
    prefix max over the tiny bucket grain broadcast back → narrow
    in-bucket running max; max-seen = greatest(prior buckets, within
    bucket). Then a 3-row broadcast delay grid and a partial-
    aggregated (type × delay) rollup. No per-type serial pass."""
    e = read_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    base = e.select(
        "event_type",
        "event_id",
        us.alias("us"),
        F.shiftright(F.col("event_id"), 12).alias("bkt"),
    )
    bmax = base.groupBy("event_type", "bkt").agg(F.max("us").alias("bmax"))
    wprev = (
        Window.partitionBy("event_type")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bmax.select(
        "event_type", "bkt", F.max("bmax").over(wprev).alias("prior_max")
    )
    win = (
        Window.partitionBy("event_type", "bkt")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    arr = (
        base.join(F.broadcast(offsets), ["event_type", "bkt"])
        .withColumn("in_bkt_max", F.max("us").over(win))
        .select(
            "event_type",
            "us",
            # greatest() skips NULLs: first bucket has no prior_max,
            # first row in a bucket has no in_bkt_max, both-null (the
            # type's very first arrival) stays NULL -> lateness 0
            F.greatest(F.col("prior_max"), F.col("in_bkt_max")).alias(
                "max_seen_us"
            ),
        )
    )
    late = arr.select(
        "event_type",
        F.when(
            F.col("max_seen_us").isNull()
            | (F.col("max_seen_us") <= F.col("us")),
            F.lit(0).cast("bigint"),
        )
        .otherwise(F.col("max_seen_us") - F.col("us"))
        .alias("late_us"),
    )
    grid = F.broadcast(
        spark.createDataFrame([(d,) for d in _WM_DELAYS], "delay_min int")
    )
    j = late.crossJoin(grid)
    dropped = F.sum(
        F.when(
            F.col("late_us") > F.col("delay_min").cast("bigint") * 60000000,
            1,
        ).otherwise(0)
    ).cast("bigint")
    n = F.count(F.lit(1)).cast("bigint")
    agg = j.groupBy(
        "event_type", F.col("delay_min").cast("bigint").alias("delay_min")
    ).agg(dropped.alias("n_dropped"), n.alias("n_events"))
    scaled = F.col("n_dropped") * F.lit(1000000)
    ppm = (
        (scaled - F.pmod(scaled, F.col("n_events"))) / F.col("n_events")
    ).cast("bigint")
    return agg.select(
        "event_type",
        "delay_min",
        "n_events",
        "n_dropped",
        ppm.alias("dropped_ppm"),
    ).orderBy("event_type", "delay_min")


@query(
    "q_ship_sla",
    oracle=f"""
    WITH j AS (
      SELECT o.o_orderpriority AS priority,
             DATEDIFF('day', CAST(o.o_orderdate AS DATE),
                      CAST(l.l_shipdate AS DATE)) AS lag_days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           {", ".join(
               f"CAST(SUM(CASE WHEN lag_days <= {d} THEN 1 ELSE 0 END)"
               f" * 1000000 // COUNT(*) AS BIGINT) AS within_{d}d_ppm"
               for d in _SLA_DAYS
           )}
    FROM j GROUP BY 1 ORDER BY 1
    """,
)
def q_ship_sla(spark, sf_dir):
    """SHIP-SLA ATTAINMENT: per order priority, the exact-ppm fraction
    of lines shipped within 30/60/90 days of the order date — the
    fulfillment scorecard every ops review reads next to
    q_supplier_scorecard's vendor lags and q_orders_backlog's open
    balance.

    Scale shape: one fact⋈fact equi-join on the order key (bucketed
    layouts make it shuffle-free — q_join_bucketed's contract), lag in
    exact integer days, three conditional partial-aggregated counters
    in ONE pass (the q_dq_expectations one-scan discipline), ppm by
    integer floor division."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("lag_days"),
    )
    n = F.count(F.lit(1)).cast("bigint")
    agg = j.groupBy("priority").agg(
        n.alias("n_lines"),
        *[
            F.sum(F.when(F.col("lag_days") <= d, 1).otherwise(0))
            .cast("bigint")
            .alias(f"hit_{d}")
            for d in _SLA_DAYS
        ],
    )
    cols = ["priority", "n_lines"]
    out = agg
    for d in _SLA_DAYS:
        scaled = F.col(f"hit_{d}") * F.lit(1000000)
        out = out.withColumn(
            f"within_{d}d_ppm",
            (
                (scaled - F.pmod(scaled, F.col("n_lines"))) / F.col("n_lines")
            ).cast("bigint"),
        )
        cols.append(f"within_{d}d_ppm")
    return out.select(*cols).orderBy("priority")
