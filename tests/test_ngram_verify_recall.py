"""Recall pin for q_dedup_ngram_verify's LSH candidate stage.

The key is rows-only BY DESIGN (round-10 promotion triage): its MinHash
banding is honestly probabilistic at J=0.5, and a measured sweep found
one true pair escaping the 8×4 bands at sf0.1 (255/256; 28/28 and 25/25
at sf0.001/sf0.01). This test pins the sf-fixture behavior so a future
change to the signature kernel, band count, or bucket cap that QUIETLY
degrades recall fails CI instead of shipping: at the test SF, the
LSH-candidate → exact-verify pipeline must still find EVERY pair the
complete shared-shingle formulation finds.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_lsh_verified_pairs_equal_complete_exact_pairs(spark, sf_dir):
    import pytest

    from self_healing_data_pipeline_spark.operators.dedup import (
        minhash_lsh_pairs,
        shingle_exploded,
    )
    from self_healing_data_pipeline_spark.sources.readers import read_table

    if sf_dir.rstrip("/").endswith("sf0.1"):
        # the pin holds at sf0.001/sf0.01 (28/28 and 25/25); at sf0.1
        # the SAME measurement that motivated keeping the key rows-only
        # found exactly one true pair escaping the 8x4 bands (255/256)
        # — asserting 100% there would be a guaranteed false red
        # (review finding)
        pytest.skip("documented 255/256 fixture recall at sf0.1")

    docs = read_table(spark, sf_dir, "documents")

    cand = set(
        map(
            tuple,
            minhash_lsh_pairs(docs, "doc_id", "text")
            .select("id_l", "id_r")
            .collect(),
        )
    )

    # complete truth: exact word-5-gram Jaccard >= 0.5 over all pairs
    # sharing at least one shingle (integer cross-multiplied threshold)
    sh = shingle_exploded(docs, n=5)
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("s"))
    x, y = sh.alias("x"), sh.alias("y")
    inter = (
        x.join(
            y,
            (F.col("x.sh") == F.col("y.sh"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .groupBy(
            F.col("x.doc_id").alias("d1"), F.col("y.doc_id").alias("d2")
        )
        .agg(F.count(F.lit(1)).alias("i"))
    )
    truth = set(
        map(
            tuple,
            inter.join(
                sz.withColumnRenamed("doc_id", "d1").withColumnRenamed(
                    "s", "s1"
                ),
                "d1",
            )
            .join(
                sz.withColumnRenamed("doc_id", "d2").withColumnRenamed(
                    "s", "s2"
                ),
                "d2",
            )
            .filter(
                2 * F.col("i") >= F.col("s1") + F.col("s2") - F.col("i")
            )
            .select("d1", "d2")
            .collect(),
        )
    )
    assert truth, "fixture has no true near-dup pairs — test is vacuous"
    missed = truth - cand
    assert not missed, (
        f"LSH candidates miss {len(missed)} of {len(truth)} true "
        f"J>=0.5 pairs at the test SF (e.g. {sorted(missed)[:3]}) — "
        "recall regressed vs the pinned 100% fixture recall"
    )
