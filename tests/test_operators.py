"""Golden-output unit tests for composition operators on tiny literal
DataFrames (SURVEY.md §5 strategy #3)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    ngram_jaccard,
    normalize_text,
    simhash_signatures,
)
from self_healing_data_pipeline_spark.operators.relational import asof_join, top_k
from self_healing_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
    similarity_join,
)
from self_healing_data_pipeline_spark.operators.windows import keep_first, sessionize


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), "p1"), (1, ts("2024-01-01 12:00:00"), "p2"),
         (2, ts("2024-01-01 09:00:00"), "p3")],
        "k int, lts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 09:30:00"), 10.0),
         (1, ts("2024-01-01 10:00:00"), 20.0),   # ties with p1 → inclusive
         (1, ts("2024-01-01 11:00:00"), 30.0),
         (2, ts("2024-01-01 09:30:00"), 40.0)],  # after p3 → no match
        "k int, rts timestamp, val double",
    )
    out = asof_join(left, right, "k", "lts", "rts", ["val"])
    got = {r["tag"]: r["asof_val"] for r in out.collect()}
    assert got == {"p1": 20.0, "p2": 30.0, "p3": None}


def test_asof_join_pandas_matches_window_composition(spark):
    from self_healing_data_pipeline_spark.operators.relational import asof_join_pandas

    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), "p1"), (1, ts("2024-01-01 12:00:00"), "p2"),
         (2, ts("2024-01-01 09:00:00"), "p3")],
        "k int, lts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), 20.0),
         (1, ts("2024-01-01 11:00:00"), 30.0),
         (2, ts("2024-01-01 09:30:00"), 40.0)],
        "k int, rts timestamp, val double",
    )
    out = asof_join_pandas(left, right, "k", "lts", "rts", ["val"])
    got = {r["tag"]: r["asof_val"] for r in out.collect()}
    assert got == {"p1": 20.0, "p2": 30.0, "p3": None}


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 12:00:00"), "p")], "k int, lts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 09:00:00"), 1.0)], "k int, rts timestamp, val double"
    )
    out = asof_join(left, right, "k", "lts", "rts", ["val"], tolerance="1 HOUR")
    assert out.collect()[0]["asof_val"] is None


def test_sessionize_gap_boundaries(spark):
    ev = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00:00"), 1),
         (1, ts("2024-01-01 10:29:00"), 2),   # within 30min → same session
         (1, ts("2024-01-01 11:10:00"), 3),   # 41min gap → new session
         (2, ts("2024-01-01 10:00:00"), 4)],
        "user_id int, ts timestamp, event_id int",
    )
    out = sessionize(ev, gap_minutes=30).orderBy("event_id").collect()
    assert [r["session_id"] for r in out] == [1, 1, 2, 1]


def test_keep_first_deterministic_winner(spark):
    df = spark.createDataFrame(
        [("a", 2, "keep"), ("a", 5, "drop"), ("b", 1, "only")],
        "k string, ord int, tag string",
    )
    out = keep_first(df, ["k"], [F.col("ord").asc()])
    assert {r["tag"] for r in out.collect()} == {"keep", "only"}


def test_dedup_exact_representative(spark):
    df = spark.createDataFrame(
        [("x", 10), ("x", 3), ("y", 7)], "k string, id int"
    )
    out = dedup_exact(df, ["k"], [F.col("id").asc()])
    assert sorted(r["id"] for r in out.collect()) == [3, 7]


def test_normalize_text(spark):
    df = spark.createDataFrame([("  Hello,   WORLD!! 42 ",)], "t string")
    assert df.select(normalize_text("t").alias("n")).collect()[0]["n"] == "hello world 42"


def test_minhash_finds_near_duplicates(spark):
    words = [f"word{i}" for i in range(60)]
    base = " ".join(words)
    near_words = list(words)
    near_words[30] = "changed"  # one word differs → Jaccard ≈ 0.84
    near = " ".join(near_words)
    other = " ".join(f"other{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string"
    )
    pairs = {(r["id_l"], r["id_r"]) for r in
             minhash_lsh_pairs(docs, "doc_id", "text").collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_simhash_near_dups_have_small_hamming_distance(spark):
    words = [f"w{i}" for i in range(80)]
    near = list(words)
    near[40] = "x"
    docs = spark.createDataFrame(
        [(1, " ".join(words)), (2, " ".join(near)),
         (3, " ".join(f"z{i}" for i in range(80)))],
        "doc_id long, text string",
    )
    sig = {r["doc_id"]: r["simhash"] for r in
           simhash_signatures(docs, "doc_id", "text").collect()}

    def ham(a, b):
        return bin((a ^ b) & (2 ** 64 - 1)).count("1")

    assert ham(sig[1], sig[2]) < 16 < ham(sig[1], sig[3])


def test_simhash_pairs_pigeonhole_finds_near_pair(spark):
    from self_healing_data_pipeline_spark.operators.dedup import simhash_pairs

    words = [f"w{i}" for i in range(80)]
    near = list(words)
    near[40] = "x"
    docs = spark.createDataFrame(
        [(1, " ".join(words)), (2, " ".join(near)),
         (3, " ".join(f"z{i}" for i in range(80)))],
        "doc_id long, text string",
    )
    got = {(r["id_l"], r["id_r"]): r["hamming"]
           for r in simhash_pairs(docs, "doc_id", "text", max_hamming=12).collect()}
    assert (1, 2) in got and got[(1, 2)] <= 12
    assert (1, 3) not in got and (2, 3) not in got


def test_simhash_pairs_complete_mode_fails_loudly_on_oversized_bucket(spark):
    # The md5/complete-pairs mode asserts a COMPLETE pair set, so a
    # bucket over max_bucket must raise (silent recall loss would
    # contradict the oracle); the default probabilistic mode drops it.
    import pytest
    from py4j.protocol import Py4JJavaError

    from self_healing_data_pipeline_spark.operators.dedup import simhash_pairs

    text = " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(i, text) for i in range(5)], "doc_id long, text string"
    )  # 5 identical docs -> one bucket of 5 in every band
    # specific error surface only (round-11 advisor item: a bare
    # Exception subsumed the tuple, so ANY error mentioning max_bucket
    # — e.g. an AnalysisException from a plan change — passed); match
    # the full contract message, not just the knob name
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    with pytest.raises(
        (Py4JJavaError, SparkRuntimeException),
        match="complete-pairs contract",
    ):
        simhash_pairs(
            docs, "doc_id", "text", max_hamming=8, max_bucket=4,
            use_md5=True,
        ).collect()
    # drop mode: the oversized bucket silently vanishes, no pairs
    assert (
        simhash_pairs(
            docs, "doc_id", "text", max_hamming=8, max_bucket=4
        ).count()
        == 0
    )


def test_ngram_jaccard_identical_and_disjoint(spark):
    df = spark.createDataFrame(
        [("a b c d e f g", "a b c d e f g", "x y z w v u t")],
        "t1 string, t2 string, t3 string",
    )
    row = df.select(
        ngram_jaccard(F.col("t1"), F.col("t2"), 3).alias("same"),
        ngram_jaccard(F.col("t1"), F.col("t3"), 3).alias("diff"),
    ).collect()[0]
    assert row["same"] == 1.0
    assert row["diff"] == 0.0


def test_ngram_jaccard_udf_matches_hof(spark):
    """The Arrow kernel must agree bit-for-bit with the Catalyst HOF form
    (it replaces it in the hot verify path)."""
    from self_healing_data_pipeline_spark.operators.dedup import ngram_jaccard_udf

    pairs = [
        ("the quick brown fox jumps over the lazy dog", "the quick brown fox jumps over a lazy dog"),
        ("a b c d e f g", "x y z w v u t"),
        ("Short, Text!", "short text"),
        ("", "anything at all here"),
        ("one two", "one two"),
    ]
    df = spark.createDataFrame(pairs, "tl string, tr string")
    rows = df.select(
        ngram_jaccard(F.col("tl"), F.col("tr"), 3).alias("hof"),
        ngram_jaccard_udf(3)(F.col("tl"), F.col("tr")).alias("udf"),
    ).collect()
    for r in rows:
        assert r["hof"] == r["udf"], (r["hof"], r["udf"])


def test_brute_force_topk_orders_by_score(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.5, 0.5]), (3, [-1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = brute_force_topk(emb, [1.0, 0.0], k=2)
    assert [r["vec_id"] for r in out.collect()] == [1, 2]


def test_similarity_join_blocks_and_thresholds(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [1.0, 0.01], 0), (3, [1.0, 0.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    out = similarity_join(emb, "label", 0.9)
    pairs = {(r["id_l"], r["id_r"]) for r in out.collect()}
    assert pairs == {(1, 2)}  # 3 is in another block despite identical vector


def test_banded_range_join_matches_plain_theta_join(spark):
    from self_healing_data_pipeline_spark.operators.relational import range_join

    l = spark.createDataFrame([(i, float(i * 7 % 100)) for i in range(40)], "lid int, lv double")
    r = spark.createDataFrame([(i, float(i * 13 % 100)) for i in range(40)], "rid int, rv double")
    cond = (r["rv"] >= l["lv"] - 10) & (r["rv"] <= l["lv"] + 10)
    plain = {(x["lid"], x["rid"]) for x in range_join(l, r, cond).collect()}
    banded = {
        (x["lid"], x["rid"])
        for x in range_join(
            l, r, cond, left_value=l["lv"], right_value=r["rv"], band_width=10.0
        ).collect()
    }
    assert banded == plain  # boundary-straddling pairs must not be dropped


def test_ivf_topk_finds_exact_neighbors_when_probing_enough(spark):
    import numpy as np

    from self_healing_data_pipeline_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    rng = np.random.Generator(np.random.PCG64(7))
    vecs = rng.standard_normal((60, 8)).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    q = [float(x) for x in vecs[5]]
    exact = [r["vec_id"] for r in brute_force_topk(emb, q, k=3).collect()]
    approx = [r["vec_id"] for r in
              ivf_topk(emb, q, k=3, n_centroids=4, n_probe=4).collect()]
    assert approx == exact  # probing all lists == exact


def test_ivf_train_separates_blobs(spark):
    import numpy as np

    from self_healing_data_pipeline_spark.operators.similarity import (
        ivf_assignments,
        ivf_train,
    )

    rng = np.random.Generator(np.random.PCG64(11))
    blob_a = rng.standard_normal((30, 6)) * 0.05 + np.array([1, 0, 0, 0, 0, 0])
    blob_b = rng.standard_normal((30, 6)) * 0.05 + np.array([0, 1, 0, 0, 0, 0])
    vecs = np.vstack([blob_a, blob_b]).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    centroids = ivf_train(emb, n_centroids=2, iters=3)
    got = ivf_assignments(emb, centroids).select("vec_id", "centroid_id").collect()
    by_blob = {0: set(), 1: set()}
    for r in got:
        by_blob[0 if r["vec_id"] < 30 else 1].add(r["centroid_id"])
    assert len(by_blob[0]) == 1 and len(by_blob[1]) == 1  # each blob pure
    assert by_blob[0] != by_blob[1]  # and separated


def test_similarity_join_lsh_finds_near_identical_vectors(spark):
    import numpy as np

    from self_healing_data_pipeline_spark.operators.similarity import (
        similarity_join_lsh,
    )

    rng = np.random.Generator(np.random.PCG64(3))
    base = rng.standard_normal((20, 16)).astype("float32")
    vecs = list(base) + [base[4] + 0.001]  # vec 20 ≈ vec 4
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    pairs = {(r["id_l"], r["id_r"]) for r in
             similarity_join_lsh(emb, threshold=0.99, dim=16).collect()}
    assert (4, 20) in pairs


def test_top_k_tie_break(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 5.0), (3, 1.0)], "id int, v double")
    out = top_k(df, [F.col("v").desc(), F.col("id").asc()], 2)
    assert [r["id"] for r in out.collect()] == [1, 2]
