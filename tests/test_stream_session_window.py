"""Streaming ``F.session_window`` ≡ batch sessionize (r11 verdict task 9).

q_stream_session's batch form (lag/cumsum gap sessionization) is
oracle-green; this test drives the STREAMING twin
(``streaming.windows.streaming_session_agg``: readStream file source →
withWatermark → session_window groupBy) over the REAL events fixture at
sf0.001, multi-epoch (one ts-range file per trigger, so sessions that
span an epoch boundary must merge in state), and asserts the end state
is IDENTICAL to the batch form:

* same (user_id, session_start) set, same n_events per session,
* streaming session_end == batch last-event ts + the 30-minute gap
  (session_window's end is close-time, the batch form's is last event).

The epoch files are event-time ordered, so the 10-minute watermark is
active but never clips — any divergence is a real semantics bug, not
late-data policy.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.operators.windows import sessionize
from self_healing_data_pipeline_spark.sources.readers import read_table
from self_healing_data_pipeline_spark.streaming.windows import (
    streaming_session_agg,
)

SF_DIR = "/root/testdata/sf0.001"
GAP_MIN = 30


def _write_epoch_files(spark, tmp_path):
    """events fixture → 3 event-time-ordered parquet files (epochs)."""
    ev = (
        read_table(spark, SF_DIR, "events")
        .select("user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"))
    )
    bounds = ev.select(
        F.percentile_approx("ts", [1.0 / 3, 2.0 / 3], 10000).alias("qs")
    ).head()["qs"]
    src = tmp_path / "events_stream"
    src.mkdir()
    slices = [
        ev.filter(F.col("ts") <= bounds[0]),
        ev.filter((F.col("ts") > bounds[0]) & (F.col("ts") <= bounds[1])),
        ev.filter(F.col("ts") > bounds[1]),
    ]
    base = None
    for i, part in enumerate(slices):
        out = tmp_path / f"epoch{i}"
        part.coalesce(1).write.mode("overwrite").parquet(str(out))
        files = [f for f in os.listdir(out) if f.endswith(".parquet")]
        assert len(files) == 1
        dst = src / f"e{i}.parquet"
        os.rename(out / files[0], dst)
        if base is None:
            base = os.path.getmtime(dst)
        os.utime(dst, (base + i, base + i))  # arrival order = event time
    return src, ev


def test_streaming_session_window_equals_batch_sessionize(spark, tmp_path):
    src, ev = _write_epoch_files(spark, tmp_path)
    stream = (
        spark.readStream.schema("user_id long, event_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    sessions = streaming_session_agg(
        stream, ts="ts", key="user_id", gap=f"{GAP_MIN} minutes",
        watermark="10 minutes",
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("stream_sessions")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream drain timed out"
    got = spark.sql("select * from stream_sessions")

    batch = (
        sessionize(
            ev, key="user_id", ts="ts", tie_break="event_id",
            gap_minutes=GAP_MIN,
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("last_event"),
        )
    )
    merged = got.alias("s").join(
        batch.alias("b"),
        ["user_id", "session_start"],
        "full_outer",
    )
    n_stream, n_batch = got.count(), batch.count()
    assert n_stream == n_batch > 0, (n_stream, n_batch)
    bad = merged.filter(
        F.col("s.n_events").isNull()
        | F.col("b.n_events").isNull()
        | (F.col("s.n_events") != F.col("b.n_events"))
        | (
            F.col("s.session_end")
            != F.col("b.last_event") + F.expr(f"INTERVAL {GAP_MIN} MINUTES")
        )
    )
    rows = bad.limit(5).collect()
    assert not rows, f"stream/batch session divergence: {rows}"
