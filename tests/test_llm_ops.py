"""LLM-corpus operator tests: invariants the oracle compare can't express
(coverage, partition completeness, determinism across partitionings)."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import QUERIES, load_all

load_all()


def test_sample_hash_fraction_and_determinism(spark, sf_dir):
    total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    got = QUERIES["q_sample_hash"](spark, sf_dir)
    n = got.count()
    assert 0.03 * total <= n <= 0.25 * total  # ~10.2% expected
    # repartitioning must not change a hash-based sample
    ids = {r["doc_id"] for r in got.collect()}
    again = {
        r["doc_id"]
        for r in QUERIES["q_sample_hash"](spark, sf_dir)
        .repartition(13)
        .collect()
    }
    assert ids == again


def test_split_assign_partitions_whole_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = {r["split"]: r for r in QUERIES["q_split_assign"](spark, sf_dir).collect()}
    assert set(rows) == {"train", "val", "test"}
    assert sum(r["n_docs"] for r in rows.values()) == docs.count()
    total_chars = docs.agg(F.sum("n_chars")).collect()[0][0]
    assert sum(r["total_chars"] for r in rows.values()) == total_chars
    # train is the large split
    assert rows["train"]["n_docs"] > rows["val"]["n_docs"]
    assert rows["train"]["n_docs"] > rows["test"]["n_docs"]


def test_doc_chunks_cover_every_document(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chunks = QUERIES["q_doc_chunks"](spark, sf_dir)
    per_doc = {
        r["doc_id"]: r
        for r in chunks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.max("chunk_idx").alias("max_idx"),
            F.sum("chunk_len").alias("sum_len"),
        )
        .collect()
    }
    assert set(per_doc) == {r["doc_id"] for r in docs.select("doc_id").collect()}
    for r in docs.select("doc_id", F.length("text").alias("n")).collect():
        info = per_doc[r["doc_id"]]
        assert info["n_chunks"] == info["max_idx"] + 1  # contiguous indices
        # stride 150 / window 200: chunks cover [1, n] — the last chunk
        # must START within the text AND reach its end (the tail-loss
        # defect the round-6 coverage audit caught: floor-based chunk
        # counts dropped up to 149 tail chars on most docs)
        last_start = info["max_idx"] * 150
        assert last_start + 1 <= max(r["n"], 1)
        assert last_start + 200 >= r["n"]
        # ... and the windows reach the end: total chunk chars ≥ n
        assert info["sum_len"] >= min(r["n"], 200)


def test_contamination_pairs_cross_probe_boundary(spark, sf_dir):
    rows = QUERIES["q_contamination"](spark, sf_dir).collect()
    assert len(rows) > 0  # fixture contains near-dup pairs crossing %10
    for r in rows:
        assert r["probe_id"] % 10 == 0
        assert r["doc_id"] % 10 != 0
        assert r["n_shared_shingles"] >= 2


def test_text_repetition_bounds(spark, sf_dir):
    rows = QUERIES["q_text_repetition"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 1 <= r["top_gram_count"] <= r["n_grams"]
        assert 0.0 < r["rep_ratio"] <= 1.0


def test_ingest_quarantine_routing_totals(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = {r["status"]: r for r in QUERIES["q_ingest_quarantine"](spark, sf_dir).collect()}
    assert set(rows) == {"loaded", "malformed", "missing_required_field"}
    assert sum(r["n_records"] for r in rows.values()) == ev.count()
    assert rows["loaded"]["sum_value_loaded"] is not None
    assert rows["malformed"]["sum_value_loaded"] is None  # nothing parsed


def test_dedup_incremental_returns_only_novel_incoming(spark, sf_dir):
    rows = QUERIES["q_dedup_incremental"](spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r["doc_id"] % 5 == 0 for r in rows)  # only the incoming batch
    assert all(len(r["fingerprint"]) == 16 for r in rows)


def test_embed_centroids_shape_and_bounds(spark, sf_dir):
    rows = QUERIES["q_embed_centroids"](spark, sf_dir).collect()
    langs = {
        r["lang"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("lang")
        .distinct()
        .collect()
    }
    assert {r["lang"] for r in rows} == langs
    assert {r["dim"] for r in rows} == set(range(8))
    assert len(rows) == len(langs) * 8
    for r in rows:
        assert -1.0 <= r["centroid"] <= 1.0  # mean of unit-scale components


def test_corpus_build_routes_every_document_once(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = QUERIES["q_corpus_build"](spark, sf_dir).collect()
    assert len(rows) == docs.count()  # total routing: nothing dropped on the floor
    routes = {r["route"] for r in rows}
    assert routes <= {"train", "val", "test", "dropped_duplicate"}
    # duplicates are exactly the non-representatives
    for r in rows:
        assert (r["route"] == "dropped_duplicate") == (not r["is_representative"])
    # each fingerprint keeps exactly one representative
    reps = [r for r in rows if r["is_representative"]]
    assert len({r["fingerprint"] for r in reps}) == len(reps)


def test_ann_queries_report_recall_witness(spark, sf_dir):
    for key in ("q_sim_ann_lsh", "q_sim_ivf"):
        rows = QUERIES[key](spark, sf_dir).collect()
        assert len(rows) == 10
        recall = sum(r["in_exact_topk"] for r in rows) / 10
        assert recall >= 0.7, f"{key} recall@10 degraded to {recall}"
