"""Hot-SHINGLE adversarial guards for the dedup family (round-8
verdict task 6, the knob-level twin of tools/sf1_probe.py --boiler).

A hot join key is handled by salting/AQE; the dedup operators' worst
case is different — ONE hot shingle (site boilerplate in a large
corpus fraction) inflating posting lists and LSH buckets. Two guards
keep pair counts bounded and these tests pin each:

- rare-first prefix order: ``prefix_rows`` ranks each doc's shingles
  by global (df, sh) ascending, so a corpus-wide boilerplate shingle
  is the LAST candidate for any prefix — docs that only share
  boilerplate never become prefix-join candidates;
- ``max_bucket``: LSH buckets above the cap (degenerate boilerplate
  collisions that would emit O(size²) pairs) are dropped outright.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.operators.dedup import (
    minhash_lsh_pairs,
    prefix_rows,
    shingle_grain,
)

BOILER = "this site uses cookies accept our policy"  # one hot 5-gram+


def _docs_with_boilerplate(spark, n=40):
    # every doc starts with the SAME boilerplate run; the remaining
    # words are doc-unique, so no pair is a true near-dup
    rows = [
        (i, BOILER + " " + " ".join(f"w{i}x{j}" for j in range(12)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prefix_rows_exclude_hot_shingles(spark):
    docs = _docs_with_boilerplate(spark)
    grain = shingle_grain(docs)
    # threshold 4/5: prefix keeps s - ceil(0.8 s) + 1 rarest shingles
    pref = prefix_rows(grain, 4, 5)
    n_docs = docs.count()
    # every boilerplate-run shingle has df == n_docs (hot); doc-unique
    # shingles have df == 1 and MUST fill the prefixes first
    hot_in_prefix = (
        pref.join(
            grain.select("sh", "df").distinct(), "sh"
        )
        .filter(F.col("df") == n_docs)
        .count()
    )
    assert hot_in_prefix == 0
    # and therefore the prefix-grain self-join generates ZERO candidate
    # pairs for docs that share ONLY boilerplate
    a = pref.alias("a")
    b = pref.alias("b")
    cand = (
        a.join(b, (F.col("a.sh") == F.col("b.sh"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    assert cand == 0


def test_minhash_max_bucket_caps_boilerplate_buckets(spark):
    docs = _docs_with_boilerplate(spark)
    # with a tiny cap, any degenerate bucket the shared boilerplate
    # creates is dropped: pair count is bounded by bands * C(cap, 2)
    # regardless of how many docs share the hot shingles
    pairs_capped = minhash_lsh_pairs(
        docs, "doc_id", "text", max_bucket=3
    ).count()
    assert pairs_capped <= 8 * 3  # bands * C(3,2)
    # the cap is the only thing standing between a 40-doc boilerplate
    # bucket and O(size^2) pairs: verify the knob actually changes
    # behavior on this corpus (uncapped >= capped, strictly more when
    # any bucket exceeded the cap)
    pairs_uncapped = minhash_lsh_pairs(
        docs, "doc_id", "text", max_bucket=10_000
    ).count()
    assert pairs_uncapped >= pairs_capped
