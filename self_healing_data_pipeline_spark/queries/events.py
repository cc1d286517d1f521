"""Stream-shaped queries over the events table (SURVEY.md §2.9).

Each is the *batch twin* of a Structured Streaming operator (the streaming
forms — readStream + withWatermark + the same transforms — live in
``streaming.windows`` and are unit-tested with the rate/memory sources).
Batch twins are DuckDB-checkable; the semantics are identical.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.functions.scalar import dec, ts_str
from self_healing_data_pipeline_spark.operators.windows import keep_first, sessionize
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_stream_tumbling",
    oracle="""
    SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_tumbling(spark, sf_dir):
    """1-hour tumbling window aggregate (streaming twin adds
    withWatermark('ts', ...) and writeStream)."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .select(
            ts_str(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "q_stream_sliding",
    oracle="""
    SELECT STRFTIME(win_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events
    FROM (
      SELECT e.ts,
             DATE_TRUNC('hour', e.ts)
               + (CAST(FLOOR(EXTRACT(MINUTE FROM e.ts) / 15) AS INTEGER) - 3 + o.off)
                 * INTERVAL 15 MINUTE AS win_start
      FROM events e
      CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS off) o
    )
    WHERE ts >= win_start AND ts < win_start + INTERVAL 1 HOUR
    GROUP BY 1
    """,
)
def q_stream_sliding(spark, sf_dir):
    """1-hour window sliding every 15 min — each event lands in 4 windows.
    Spark's window() generates the assignment natively; the oracle expands
    it with a cross-joined offset table."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(ts_str(F.col("w.start")).alias("window_start"), "n_events")
    )


@query(
    "q_stream_session",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           STRFTIME(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
    FROM sessions GROUP BY user_id, session_id
    """,
)
def q_stream_session(spark, sf_dir):
    """Gap-based sessionization (30-min gap) — batch twin of
    session_window(ts, '30 minutes'); see operators.windows.sessionize."""
    ev = read_table(spark, sf_dir, "events")
    sess = sessionize(ev, key="user_id", ts="ts", tie_break="event_id", gap_minutes=30)
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            ts_str(F.min("ts")).alias("session_start"),
            ts_str(F.max("ts")).alias("session_end"),
        )
        .select(
            "user_id",
            F.col("session_id").cast("bigint").alias("session_id"),
            "n_events",
            "session_start",
            "session_end",
        )
    )


@query(
    "q_stream_late_data",
    oracle="""
    SELECT event_id, user_id,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
    FROM events
    WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 1 DAY
    """,
)
def q_stream_late_data(spark, sf_dir):
    """Late-data horizon as a batch query: keep events within the
    watermark delay of the stream's max event time — the batch twin of
    withWatermark's retention rule (§2.9)."""
    ev = read_table(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts").alias("m"))
    return (
        ev.crossJoin(F.broadcast(max_ts))
        .filter(F.col("ts") >= F.col("m") - F.expr("INTERVAL 1 DAY"))
        .select("event_id", "user_id", ts_str("ts").alias("ts_s"))
    )


@query(
    "q_dedup_keep_first",
    oracle="""
    SELECT event_id, user_id, event_type,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_dedup_keep_first(spark, sf_dir):
    """Keep the first event per (user, type) under a total order — the
    batch twin of streaming dropDuplicatesWithinWatermark."""
    ev = read_table(spark, sf_dir, "events")
    first = keep_first(
        ev,
        keys=["user_id", "event_type"],
        order_by=[F.col("ts").asc(), F.col("event_id").asc()],
    )
    return first.select(
        "event_id", "user_id", "event_type", ts_str("ts").alias("ts_s")
    )


@query(
    "q_stream_interval_join",
    oracle="""
    SELECT c.event_id AS click_id, c.user_id,
           STRFTIME(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           COUNT(*) AS n_prior_views
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON v.user_id = c.user_id
     AND v.ts > c.ts - INTERVAL 30 MINUTE
     AND v.ts <= c.ts
    GROUP BY c.event_id, c.user_id, c.ts
    """,
)
def q_stream_interval_join(spark, sf_dir):
    """Equi + time-interval join (batch twin of the stream-stream join in
    streaming.windows.streaming_interval_join): each click paired with the
    same user's views in the preceding 30 minutes, reduced to a per-click
    count. The equi key (user_id) makes it a hash join with the interval
    as a post-join filter — one shuffle per side on user_id; in the
    streaming form the same bounded interval is what gives buffered rows
    a provable lifetime (state ∝ rate × interval, not stream length)."""
    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("ts_c"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("user_id_v"), F.col("ts").alias("ts_v")
    )
    return (
        clicks.join(
            views,
            (F.col("user_id") == F.col("user_id_v"))
            & (F.col("ts_v") > F.col("ts_c") - F.expr("INTERVAL 30 MINUTES"))
            & (F.col("ts_v") <= F.col("ts_c")),
        )
        .groupBy("click_id", "user_id", "ts_c")
        .agg(F.count(F.lit(1)).alias("n_prior_views"))
        .select(
            "click_id",
            "user_id",
            ts_str("ts_c").alias("click_ts"),
            "n_prior_views",
        )
    )
