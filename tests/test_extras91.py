"""Batch-74 semantics pins (the GROUPS-mode precedent: hash gates prove
cross-engine agreement; these tests pin the SEMANTICS independently).

- Interval RANGE frame: hand-computed fixture — the 1-hour-PRECEDING
  bound is INCLUSIVE and RANGE peers (equal timestamps) enter together.
- SemDeDup: independent numpy twin of the whole pipeline (seed
  centroids → argmax assignment → within-cluster cosines → keep-first
  drop rule) must reproduce the dropped set and each dup_of exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from self_healing_data_pipeline_spark import registry
from self_healing_data_pipeline_spark.queries.extras91 import (
    _RANGE_INTERVAL_SQL,
    _SEMDEDUP_MIN_K,
    _SEMDEDUP_TARGET_CLUSTER,
    _SEMDEDUP_TAU,
)

registry.load_all()


def test_interval_range_frame_hand_computed(spark):
    rows = [
        (1, 10, "2024-01-01 00:00:00", 1.0),
        (2, 10, "2024-01-01 00:30:00", 2.0),
        (3, 10, "2024-01-01 01:00:00", 4.0),  # 00:00 is EXACTLY 1h back
        (4, 10, "2024-01-01 01:00:00", 8.0),  # RANGE peer of event 3
        (5, 10, "2024-01-01 02:45:00", 16.0),  # alone in its hour
        (6, 20, "2024-01-01 00:59:00", 32.0),  # other partition
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    ).selectExpr(
        "event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts", "value"
    )
    df.createOrReplaceTempView("__ri_fixture")
    out = {
        r["event_id"]: (r["n_1h"], r["sum_1h"])
        for r in spark.sql(
            _RANGE_INTERVAL_SQL.format(
                ts_fmt="date_format(ts, 'yyyy-MM-dd HH:mm:ss')",
                table="__ri_fixture",
            )
        ).collect()
    }
    # Inclusive lower bound: events 3/4 see event 1 (exactly 1h back),
    # event 2, and EACH OTHER (equal-ts peers enter the frame together).
    assert out[1] == (1, 1.0)
    assert out[2] == (2, 3.0)
    assert out[3] == (4, 15.0)
    assert out[4] == (4, 15.0)
    assert out[5] == (1, 16.0)
    assert out[6] == (1, 32.0)


def test_semdedup_matches_numpy_twin(spark, sf_dir):
    out = registry.QUERIES["q_semdedup"](spark, sf_dir).collect()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values(
        "vec_id"
    )
    X = np.stack(emb["embedding"].to_numpy()).astype("float64")
    ids = emb["vec_id"].to_numpy()
    k = max(_SEMDEDUP_MIN_K, len(ids) // _SEMDEDUP_TARGET_CLUSTER)
    seeds = X[:k]
    nrm = np.linalg.norm(seeds, axis=1)
    nrm[nrm == 0] = 1.0
    assign = (X @ (seeds / nrm[:, None]).T).argmax(axis=1)
    xn = X / np.linalg.norm(X, axis=1)[:, None]
    expect = {}
    for c in np.unique(assign):
        idx = np.where(assign == c)[0]
        s = xn[idx] @ xn[idx].T
        for j in range(1, len(idx)):
            earlier = np.where(s[j, :j] >= _SEMDEDUP_TAU)[0]
            if len(earlier):
                e = earlier[0]  # lowest id: idx is vec_id-sorted
                expect[int(ids[idx[j]])] = (
                    int(c),
                    int(ids[idx[e]]),
                    float(s[j, e]),
                )
    got = {
        r["vec_id"]: (r["cluster_id"], r["dup_of"], r["cos_sim"])
        for r in out
    }
    assert set(got) == set(expect)
    for v, (c, dup, cos) in expect.items():
        assert got[v][0] == c
        assert got[v][1] == dup
        # engine folds float32 PRODUCTS (array<float> zip_with); the
        # twin is float64 BLAS — agree to single-precision tolerance
        assert abs(got[v][2] - cos) < 1e-5


def test_batch74_plan_shapes(spark, sf_dir):
    import io
    from contextlib import redirect_stdout

    for key in ("q_window_range_interval", "q_semdedup"):
        buf = io.StringIO()
        with redirect_stdout(buf):
            registry.QUERIES[key](spark, sf_dir).explain("formatted")
        p = buf.getvalue()
        assert "SinglePartition" not in p, key
        assert "CartesianProduct" not in p, key
