"""Corpus-build tour: the training-data pipeline end-to-end.

Run: python examples/corpus_build.py [sf_dir]

Walks the documents fixture through the full corpus decision chain a
nightly 100 TB build would run — every step a registered, oracle-checked
query:

1. routing   — dedup + train/val/test split in one plan (q_corpus_build)
2. novelty   — which docs of an incoming batch are new (q_dedup_incremental)
3. quality   — repetition scoring + PII scan (q_text_repetition, q_pii_scan)
4. chunks    — fixed-window segmentation (q_doc_chunks)
5. decontam  — benchmark-overlap candidates (q_contamination)
6. mixing    — length-weighted deterministic sampling (q_sample_weighted)
7. packing   — 512-token context windows with provenance (q_pack_context)
8. registry  — continuous keep-first dedup vs ALL history
              (streaming/dedup_registry, the forever-running form of 2)
9. indexing  — inverted-index posting lists + phrase query over the
              corpus (q_inverted_index, q_phrase_search) — the serving
              side a curated corpus feeds
10. audit    — exact-Jaccard near-dup pairs the MinHash path must not
              miss (q_dedup_jaccard_prefix) and the split-leakage
              check (q_split_leakage)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark import get_spark
from self_healing_data_pipeline_spark.registry import QUERIES, load_all

load_all()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-build")

    routed = QUERIES["q_corpus_build"](spark, sf_dir)
    print("== routing (dedup + split) ==")
    routed.groupBy("route").count().orderBy("route").show()

    print("== incoming-batch novelty ==")
    novel = QUERIES["q_dedup_incremental"](spark, sf_dir)
    print(f"genuinely new docs in the incoming batch: {novel.count()}")

    print("== quality flags ==")
    rep = QUERIES["q_text_repetition"](spark, sf_dir)
    rep.orderBy(F.desc("rep_ratio")).limit(5).show()
    pii = QUERIES["q_pii_scan"](spark, sf_dir)
    pii.filter((F.col("n_emails") > 0) | (F.col("n_phones") > 0)).show(5)

    print("== chunking ==")
    chunks = QUERIES["q_doc_chunks"](spark, sf_dir)
    chunks.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("chunk_hash").alias("distinct_chunks"),
    ).show()

    print("== decontamination candidates ==")
    QUERIES["q_contamination"](spark, sf_dir).orderBy(
        F.desc("n_shared_shingles")
    ).show(5)

    print("== mixture sampling (length-weighted, deterministic) ==")
    QUERIES["q_sample_weighted"](spark, sf_dir).show()

    print("== context-window packing ==")
    QUERIES["q_pack_context"](spark, sf_dir).limit(5).show()

    print("== streaming dedup registry (two arriving batches) ==")
    import tempfile

    from self_healing_data_pipeline_spark.sources.readers import read_table
    from self_healing_data_pipeline_spark.streaming.dedup_registry import (
        apply_dedup_batch,
        read_registry,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    mid = docs.agg(F.max("doc_id")).collect()[0][0] // 2
    with tempfile.TemporaryDirectory() as d:
        rdir, adir = os.path.join(d, "reg"), os.path.join(d, "acc")
        apply_dedup_batch(spark, docs.filter(F.col("doc_id") <= mid), rdir, adir, 0)
        apply_dedup_batch(spark, docs.filter(F.col("doc_id") > mid), rdir, adir, 1)
        reg = read_registry(spark, rdir)
        print(
            f"registry: {reg.count()} unique contents from {docs.count()} docs"
        )

    print("== search index + phrase query ==")
    QUERIES["q_inverted_index"](spark, sf_dir).orderBy(
        F.desc("df")
    ).limit(5).show(truncate=24)
    QUERIES["q_phrase_search"](spark, sf_dir).limit(5).show()

    print("== exactness audit (prefix-filtered Jaccard + leakage) ==")
    QUERIES["q_dedup_jaccard_prefix"](spark, sf_dir).limit(5).show()
    QUERIES["q_split_leakage"](spark, sf_dir).show()

    spark.stop()


if __name__ == "__main__":
    main()
