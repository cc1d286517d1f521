"""Incremental rollup maintenance (streaming.rollup): batched partials
must converge to the direct aggregate, independent of batch order, and
replay must be idempotent."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.sources.readers import read_table
from self_healing_data_pipeline_spark.streaming.rollup import (
    aggregate_batch,
    merge_rollup,
    read_rollup,
)


def _direct(ev):
    return {
        (r["bucket"], r["event_type"]): (r["n"], r["sum_cents"])
        for r in aggregate_batch(
            ev, F.date_trunc("hour", "ts"), ["event_type"], "value"
        ).collect()
    }


def _rolled(spark, state_dir):
    return {
        (r["bucket"], r["event_type"]): (r["n"], r["sum_cents"])
        for r in read_rollup(spark, state_dir).collect()
    }


def test_batched_rollup_equals_direct_aggregate(spark, sf_dir, tmp_path):
    ev = read_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    direct = _direct(ev)
    state = str(tmp_path / "state")
    # three arbitrary batches by event residue — NOT time-ordered
    for epoch, residue in enumerate([0, 1, 2]):
        batch = read_table(spark, sf_dir, "events").filter(
            F.col("event_id") % 3 == residue
        )
        partials = aggregate_batch(
            batch, F.date_trunc("hour", "ts"), ["event_type"], "value"
        )
        merge_rollup(spark, partials, state, ["event_type"], epoch)
    assert _rolled(spark, state) == direct


def test_rollup_is_batch_order_independent_and_replay_safe(spark, tmp_path):
    rows = [
        ("2024-01-01 00:10:00", "click", 1.25),
        ("2024-01-01 00:40:00", "click", 2.75),
        ("2024-01-01 01:10:00", "view", 4.00),
        ("2024-01-01 00:20:00", "view", 0.50),
    ]
    df = spark.createDataFrame(rows, "ts string, event_type string, value double")
    df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    direct = _direct(df)
    batches = [df.filter(F.col("value") < 2), df.filter(F.col("value") >= 2)]
    for case, perm in enumerate(itertools.permutations(range(2))):
        state = str(tmp_path / f"s{case}")
        for epoch, bi in enumerate(perm):
            partials = aggregate_batch(
                batches[bi], F.date_trunc("hour", "ts"), ["event_type"], "value"
            )
            merge_rollup(spark, partials, state, ["event_type"], epoch)
            if epoch == len(perm) - 1:  # crash-replay of the last epoch
                merge_rollup(spark, partials, state, ["event_type"], epoch)
        assert _rolled(spark, state) == direct, perm


def test_read_rollup_derives_avg(spark, tmp_path):
    df = spark.createDataFrame(
        [("2024-01-01 00:00:01", "a", 1.00), ("2024-01-01 00:59:59", "a", 3.00)],
        "ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    state = str(tmp_path / "s")
    merge_rollup(
        spark,
        aggregate_batch(df, F.date_trunc("hour", "ts"), ["event_type"], "value"),
        state,
        ["event_type"],
        0,
    )
    row = read_rollup(spark, state).collect()[0]
    assert row["n"] == 2 and row["sum_value"] == 4.0 and row["avg_value"] == 2.0


def test_maintain_rollup_stream_matches_direct(spark, tmp_path):
    """True readStream path: two event files drained as separate epochs
    must converge to the direct aggregate of all rows."""
    import os

    from pyspark.sql import types as T

    from self_healing_data_pipeline_spark.streaming.rollup import maintain_rollup

    src = tmp_path / "events"
    src.mkdir()
    (src / "e1.csv").write_text(
        "ts,event_type,value\n"
        "2024-01-01 00:10:00,click,1.25\n"
        "2024-01-01 01:10:00,view,4.00\n"
    )
    (src / "e2.csv").write_text(
        "ts,event_type,value\n"
        "2024-01-01 00:40:00,click,2.75\n"
        "2024-01-01 00:20:00,view,0.50\n"
    )
    now = os.path.getmtime(src / "e2.csv")
    os.utime(src / "e1.csv", (now - 10, now - 10))
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    state = str(tmp_path / "state")
    maintain_rollup(
        spark,
        str(src),
        state,
        str(tmp_path / "ckpt"),
        schema,
        max_files_per_trigger=1,
    )
    all_rows = spark.read.schema(schema).option("header", True).csv(str(src))
    assert _rolled(spark, state) == _direct(all_rows)
