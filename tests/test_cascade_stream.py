"""Streaming intake funnel ≡ batch filter cascade.

The continuous twin (streaming/cascade.py) folds doc_id-ordered
micro-batches through the SHARED gates (operators/cascade.py) plus a
fingerprint registry; after draining the whole corpus its funnel
report must equal q_filter_cascade's cell-for-cell (same sequential
first-survivor dedup semantics under the in-order delivery contract).
Also pins replay idempotence (at-least-once foreachBatch) and
batch-cut invariance (1 epoch vs 3 epochs)."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.sources.readers import read_table
from self_healing_data_pipeline_spark.streaming.cascade import (
    apply_cascade_batch,
    read_funnel,
)


def _epochs(docs, n):
    lo, hi = docs.agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
    ).first()
    span = (hi - lo) // n + 1
    return [
        docs.filter(
            (F.col("doc_id") >= lo + i * span)
            & (F.col("doc_id") < lo + (i + 1) * span)
        )
        for i in range(n)
    ]


def _rows(df):
    return [
        (
            r["stage_idx"],
            r["stage"],
            r["n_in"],
            r["n_dropped"],
            r["n_out"],
            round(r["drop_rate"], 12),
        )
        for r in df.orderBy("stage_idx").collect()
    ]


def test_streaming_funnel_matches_batch_cascade(spark, sf_dir, tmp_path):
    from self_healing_data_pipeline_spark.registry import QUERIES, load_all

    load_all()
    docs = read_table(spark, sf_dir, "documents")
    state = str(tmp_path / "funnel3")
    for i, ep in enumerate(_epochs(docs, 3)):
        apply_cascade_batch(spark, ep, state, epoch_id=i)
    got = _rows(read_funnel(spark, state))
    want = _rows(QUERIES["q_filter_cascade"](spark, sf_dir))
    assert got == want

    # batch-cut invariance: one epoch carrying everything agrees
    state1 = str(tmp_path / "funnel1")
    apply_cascade_batch(spark, docs, state1, epoch_id=0)
    assert _rows(read_funnel(spark, state1)) == want

    # replay idempotence: re-running the LAST epoch (at-least-once
    # foreachBatch) must not change counters or registry
    apply_cascade_batch(spark, _epochs(docs, 3)[2], state, epoch_id=2)
    assert _rows(read_funnel(spark, state)) == want
