"""Incremental JOIN-view maintenance tests (streaming/incremental_join):
equivalence with the batch join under arbitrary batch splits, deletes on
both sides, replay idempotence, and the true-streaming wiring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from self_healing_data_pipeline_spark.streaming.incremental_join import (
    apply_join_delta_batch,
    maintain_join,
    read_join_view,
    read_side,
)

LEFT_COLS = ["cust_id", "cust_name"]
RIGHT_COLS = ["ord_cust", "ord_total"]

SCHEMA = T.StructType(
    [
        T.StructField("side", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("cust_id", T.LongType()),
        T.StructField("cust_name", T.StringType()),
        T.StructField("ord_cust", T.LongType()),
        T.StructField("ord_total", T.LongType()),
    ]
)


def _row(side, op, seq, **kw):
    return (
        side,
        op,
        seq,
        kw.get("cust_id"),
        kw.get("cust_name"),
        kw.get("ord_cust"),
        kw.get("ord_total"),
    )


def _apply(spark, rows, root, epoch):
    apply_join_delta_batch(
        spark,
        spark.createDataFrame(rows, SCHEMA),
        str(root),
        left_key="cust_id",
        right_key="ord_cust",
        left_cols=LEFT_COLS,
        right_cols=RIGHT_COLS,
        epoch_id=epoch,
    )


def _view(spark, root):
    df = read_join_view(spark, str(root))
    if df is None:
        return set()
    return {
        (r["cust_id"], r["cust_name"], r["ord_cust"], r["ord_total"])
        for r in df.collect()
    }


def test_join_view_matches_batch_join_and_handles_deletes(spark, tmp_path):
    root = tmp_path / "j1"
    # epoch 0: two customers, one matching order
    _apply(
        spark,
        [
            _row("left", "upsert", 1, cust_id=1, cust_name="alice"),
            _row("left", "upsert", 1, cust_id=2, cust_name="bob"),
            _row("right", "upsert", 1, ord_cust=1, ord_total=100),
        ],
        root,
        0,
    )
    assert _view(spark, root) == {(1, "alice", 1, 100)}
    # epoch 1: order for bob, rename alice (join must re-pair, not dup)
    _apply(
        spark,
        [
            _row("right", "upsert", 2, ord_cust=2, ord_total=50),
            _row("left", "upsert", 2, cust_id=1, cust_name="alice2"),
        ],
        root,
        1,
    )
    assert _view(spark, root) == {
        (1, "alice2", 1, 100),
        (2, "bob", 2, 50),
    }
    # epoch 2: delete bob (left) -> his pair disappears; delete alice's
    # order (right) -> her pair disappears though she still exists
    _apply(
        spark,
        [
            _row("left", "delete", 3, cust_id=2),
            _row("right", "delete", 3, ord_cust=1),
        ],
        root,
        2,
    )
    assert _view(spark, root) == set()
    left = read_side(spark, str(root), "left")
    assert {r["cust_id"] for r in left.collect()} == {1}


def test_arbitrary_batch_splits_converge_to_batch_join(spark, tmp_path):
    # 8 left upserts, 10 right upserts + a couple of deletes, split into
    # different batch layouts -> identical final views
    lefts = [
        _row("left", "upsert", i, cust_id=i % 5, cust_name=f"c{i}")
        for i in range(1, 9)
    ]
    rights = [
        _row("right", "upsert", i, ord_cust=i % 6, ord_total=i * 10)
        for i in range(1, 11)
    ]
    deletes = [
        _row("left", "delete", 99, cust_id=3),
        _row("right", "delete", 99, ord_cust=0),
    ]
    events = lefts + rights + deletes

    views = []
    for tag, chunks in (
        ("one", [events]),
        ("three", [events[:7], events[7:15], events[15:]]),
        ("many", [[e] for e in events]),
    ):
        root = tmp_path / f"split_{tag}"
        for i, chunk in enumerate(chunks):
            _apply(spark, chunk, root, i)
        views.append(_view(spark, root))
    assert views[0] == views[1] == views[2]

    # ground truth: plain batch join of the final sides
    final_left = {(i % 5): f"c{i}" for i in range(1, 9)}
    final_left.pop(3)
    final_right = {(i % 6): i * 10 for i in range(1, 11)}
    final_right.pop(0)
    want = {
        (k, v, k, final_right[k])
        for k, v in final_left.items()
        if k in final_right
    }
    assert views[0] == want


def test_replay_is_idempotent(spark, tmp_path):
    root = tmp_path / "replay"
    b0 = [
        _row("left", "upsert", 1, cust_id=1, cust_name="a"),
        _row("right", "upsert", 1, ord_cust=1, ord_total=7),
    ]
    b1 = [_row("right", "upsert", 2, ord_cust=1, ord_total=8)]
    _apply(spark, b0, root, 0)
    _apply(spark, b1, root, 1)
    before = _view(spark, root)
    _apply(spark, b1, root, 1)  # at-least-once redelivery of epoch 1
    assert _view(spark, root) == before == {(1, "a", 1, 8)}


def test_maintain_join_streaming_wiring(spark, tmp_path):
    import time

    src = tmp_path / "feed"
    b0 = [
        _row("left", "upsert", 1, cust_id=1, cust_name="a"),
        _row("left", "upsert", 1, cust_id=2, cust_name="b"),
        _row("right", "upsert", 1, ord_cust=2, ord_total=5),
    ]
    b1 = [
        _row("right", "upsert", 2, ord_cust=1, ord_total=9),
        _row("left", "delete", 2, cust_id=2),
    ]
    for i, rows in enumerate([b0, b1]):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        time.sleep(1.1)  # distinct mod times -> deterministic batch order
    maintain_join(
        spark,
        str(src),
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        SCHEMA,
        left_key="cust_id",
        right_key="ord_cust",
        left_cols=LEFT_COLS,
        right_cols=RIGHT_COLS,
        max_files_per_trigger=1,
    )
    assert _view(spark, tmp_path / "state") == {(1, "a", 1, 9)}


def test_same_key_names_rejected(spark, tmp_path):
    with pytest.raises(ValueError):
        apply_join_delta_batch(
            spark,
            spark.createDataFrame([], SCHEMA),
            str(tmp_path / "bad"),
            left_key="k",
            right_key="k",
            left_cols=["k"],
            right_cols=["k"],
            epoch_id=0,
        )


def test_delta_join_never_recomputes_standing_pairs(spark, tmp_path):
    """The per-batch plan touches only delta-keyed rows: after a delta
    for key 1, the join snapshot's rows for OTHER keys are byte-identical
    carried-forward rows (same values), and the fresh-pair branch input
    is the single touched key."""
    root = tmp_path / "noredo"
    base = [
        _row("left", "upsert", 1, cust_id=k, cust_name=f"c{k}")
        for k in range(10)
    ] + [
        _row("right", "upsert", 1, ord_cust=k, ord_total=k * 100)
        for k in range(10)
    ]
    _apply(spark, base, root, 0)
    _apply(
        spark,
        [_row("left", "upsert", 2, cust_id=1, cust_name="NEW")],
        root,
        1,
    )
    view = _view(spark, root)
    assert (1, "NEW", 1, 100) in view
    assert len(view) == 10
    untouched = {v for v in view if v[0] != 1}
    assert untouched == {(k, f"c{k}", k, k * 100) for k in range(10) if k != 1}
