"""SF1 probe tier: measure the suite's heaviest keys at 10× the bench
fixture (sf0.1 → sf1-equivalent) — the round-7 judge task for the
shingle-heavy tail, where the 10× driver probes (sf0.01 → sf0.1) are
too small to expose window-prep skew or candidate-pair blow-up.

The driver ships no sf1 fixture, so this tool SYNTHESIZES one under
``.scratch/sf1/`` from sf0.1 with replica salting that preserves the
fixture's per-replica statistics while keeping replicas disjoint:

- ``documents``: 10 replicas; a replica-unique salt token is inserted
  before every 4th word, so every word-5-gram window contains a salt
  and shingle spaces are DISJOINT across replicas, while the original
  words (langid markers, stopword ratios, near-dup alignment within a
  replica) survive — the honest "corpus grew 10×, content statistics
  unchanged" scenario. (Naive replication without salting would make
  every doc a 10-way exact duplicate — a quadratic pair explosion
  that measures the synthetic artifact, not the operator.)
- ``lineitem`` / ``orders`` / ``customer`` / ``part`` / ``supplier``:
  10 replicas with all join keys offset by r·10⁷ — 10 disjoint copies
  of the key graph. ``region``/``nation``/``events`` copy through
  unchanged (bounded dims; nanos-timestamp file).
- ``embeddings``: 10 replicas with vec_id offset (per-row kernels
  don't care about values).

Usage: python tools/sf1_probe.py [--only q_a,q_b] [--rebuild]
Prints one JSON line of {key: {sf01, sf1, ratio}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, ".scratch", "sf1")
REPLICAS = 10
OFF = 10_000_000

#: The bench tail this tier watches (slowest keys of BENCH_r06, minus
#: streaming-registry machinery whose scratch epochs dwarf the query).
PROBE_KEYS = [
    "q_recursive_reach",
    "q_dedup_containment",
    "q_embedding_quantize",
    "q_doc_novelty",
    "q_dedup_jaccard_prefix",
    "q_neardup_registry",
    "q_dedup_threshold_sweep",
    "q_incremental_join_view",
    "q_dedup_clusters",
    "q_fuzzy_match",
    # round-7 additions: sf1 evidence for the new keys
    "q_ann_ivfadc",
    "q_catalog_graph",
    "q_catalog_graph_impact",
    "q_filter_cascade",
    "q_token_budget",
    "q_ols_trend",
    "q_embedding_pca",
    # round-8 additions: the graph/stream tail (r7 verdict task 5) —
    # iterative graph ops are where 10× nonlinearity hides (frontier ×
    # degree); events now replicates so the stream keys see real 10×.
    "q_pagerank",
    "q_label_propagation",
    "q_part_triangles",
    "q_khop_reach",
    "q_graph_neighbor_jaccard",  # round-11: Σdeg² wedge family, truncated
    "q_join_discovery_sketch",
    "q_stream_heavy_hitters",
    # round-9 additions (r8 verdict task 5): batches 61-66 at true 10×
    # of sf0.1 — rolling distinct is frontier×window-sized, the
    # order-independent checksum fold at 10×, multi-measure pivot
    # state, the set-intersection audience overlap, and the skew-safe
    # sessionization twin on the uniform tier (its skew story is the
    # SKEW_KEYS row).
    "q_sessionize_twophase",
    "q_rolling_active_users",
    "q_table_checksum",
    "q_pivot_multi_agg",
    "q_type_user_overlap",
    # round-9 batch 69: the two-phase EXCLUDE rewrite's whole claim is
    # that the window input is bounded by the value DOMAIN — at 10×
    # rows the frame densifies but the group grain doesn't grow.
    "q_window_exclude",
    # round-10 additions (r9 verdict task 5): batches 67-68, 70-71 at
    # true 10× — the decorrelated LATERAL aggregate join, the
    # WindowGroupLimit DISTINCT ON path, bounded listagg state,
    # percentile_cont's two rank-probe rows per group, the two-stage
    # ANN whose shortlist L = n/10 grows LINEARLY (the probe confirms
    # the exact rerank term, not the truth eval, dominates), and the
    # GROUPS-mode group-grain rewrite (window input bounded by the
    # value domain, like q_window_exclude).
    "q_join_lateral",
    "q_distinct_on",
    "q_string_agg",
    "q_percentile_within_group",
    "q_ann_two_stage",
    "q_window_groups_mode",
    # round-10 batch 72 lands in the same family: the composed
    # GROUPS+EXCLUDE arithmetic shares the group-grain bound, and the
    # window-FILTER key is a plain running frame over per-customer
    # partitions (expect flat).
    "q_window_groups_exclude",
    "q_window_agg_filter",
    # round-10 batch 74: the interval RANGE frame is a plain per-user
    # window (expect flat); SemDeDup's claim is the K = n/125 rule —
    # at 10× vectors K grows 16→160, clusters stay ~125, so the pair
    # join must scale LINEARLY (a fixed K would be quadratic here).
    "q_window_range_interval",
    "q_semdedup",
    # round-12 additions (r11 verdict task 8): the 10 slowest keys of
    # the r12 bench still lacking an sf1 row — FK discovery's
    # column-pair sweep, the basket-pair self-join (bounded by
    # per-order width), lineage's capture+closure, the simhash banded
    # pair join at 10× the band buckets, the HLL accuracy gate, MAD's
    # double median, bit-exact embedding dedup, the GK sketch + rank
    # verify join, and the two heaviest remaining TPC-H shapes (Q21's
    # triple-lineitem self-join, Q16's not-in + distinct-count).
    # (q_dedup_registry stays excluded: streaming-registry scratch
    # epochs dwarf the query — the tool's documented policy.)
    "q_join_discovery",
    "q_basket_pairs",
    "q_lineage_downstream",
    "q_dedup_simhash_pairs",
    "q_distinct_sketch_accuracy",
    "q_dq_outlier_mad",
    "q_dedup_embedding",
    "q_agg_approx_percentile",
    "q_tpch_q21",
    "q_tpch_q16",
    # round-12 addition: the last bench heavy with no SCALE.md row —
    # 3-epoch exact-dedup registry (state = fingerprint grain).
    "q_dedup_registry",
]

#: Skew-adversarial tier (r7 verdict task 6): same 10× volume as the
#: uniform tier, but one hot key absorbs ~20% of mass on each skew
#: axis (supplier on lineitem, user on events, customer on orders,
#: source on documents). `--skew` times these keys on BOTH tiers; the
#: ratio isolates skew sensitivity at constant volume.
SKEW_KEYS = [
    "q_skew_salted_join",  # lineitem⋈supplier: the salted-join path itself
    "q_table_diff",        # diff joins on the (still-unique) PK: expect flat
    "q_sessionize",        # per-user windows: one user = 20% of the stream
    "q_sessionize_twophase",  # the chunked mitigation: same oracle, capped partitions
    "q_pack_context",      # per-source two-phase prefix sum: one hot source
    # round-8 batch-62 keys under the hot user / hot source
    "q_rolling_active_users",  # 7x fan-out of (day,user) grain: hot user dedups first
    "q_oov_rate",              # token counts + hot source in the source-grain agg
    # per-user/per-key folds and aggregates under the hot user/customer
    "q_ema",             # secondary-sort mapInPandas fold per user partition
    "q_heavy_hitters",   # Misra-Gries partials: hot user IS the heavy hitter
    "q_customer_rfm",    # value-bucket NTILE cut points under a hot customer
]
SKEW_OUT = os.path.join(REPO, ".scratch", "sf1skew")

#: Boilerplate-skew tier (r8 verdict task 6): the dedup prefix filters'
#: worst case is not a hot JOIN key but a hot SHINGLE — site chrome
#: shared by a large corpus fraction inflating posting lists (df) and
#: LSH buckets. This tier prepends ONE fixed 16-word boilerplate run to
#: every 5th document of the uniform sf1 tier (~20% of docs across ALL
#: replicas share its word-5-grams — deliberately crossing the replica
#: salting, the worst case the salting otherwise prevents). The guards
#: under test: rare-first (df, sh) prefix order pushes hot shingles out
#: of every prefix (prefix_rows), and max_bucket drops degenerate LSH
#: buckets (pairs_within_buckets).
BOILER_KEYS = [
    "q_dedup_containment",
    "q_dedup_jaccard_prefix",
    "q_dedup_minhash",
    "q_dedup_substring",
]
BOILER_OUT = os.path.join(REPO, ".scratch", "sf1boiler")
BOILERPLATE = (
    "this site uses cookies accept our policy terms privacy contact "
    "about home navigation menu search login subscribe"
)

#: Embedding-skew tier (round 10): the similarity family's adversary is
#: not a hot JOIN key but a hot VECTOR — a boilerplate/template page
#: embedded millions of times, collapsing ~20% of the corpus onto one
#: point. One IVF/IVFADC list absorbs that mass (probe-side blow-up),
#: LSH buckets degenerate (max_bucket cap under test), exact top-k hits
#: massive score TIES (the unique vec_id tie-break under test), and the
#: two-stage shortlist fills with clones. Every 5th vector's embedding
#: is replaced by the corpus's first vector across ALL replicas; ids
#: and labels keep the uniform tier's replication, so any wall delta vs
#: the uniform tier is the hot-vector skew at constant volume.
EMBSKEW_KEYS = [
    "q_sim_topk",        # exact top-k: 20% ties at the same score
    "q_sim_ivf",         # IVF: one centroid's list holds 20% of vectors
    "q_ann_ivfadc",      # same list blow-up through the ADC path
    "q_sim_ann_lsh",     # LSH: one bucket at 20% mass (cap under test)
    "q_ann_two_stage",   # shortlist fills with clones; rerank stays L-bounded
    "q_embedding_dedup_bitexact",  # 20% of rows in ONE dedup group
    "q_kmeans_assign",   # one cluster absorbs the mass; argmax stays narrow
    "q_semdedup",        # value-grain collapse vs the hot-cluster pair bomb
]
EMBSKEW_OUT = os.path.join(REPO, ".scratch", "sf1embskew")

#: Long-document tier (round 10): web corpora carry pathological
#: documents — a few megabyte-scale pages among millions of kilobyte
#: ones. Per-doc kernels that are superlinear in doc length (BPE's
#: merge loop, shingle matrices), Arrow batches that suddenly hold
#: hundreds of KB per row, and the greedy packer handed a doc bigger
#: than its budget are the failure modes. Every 200th doc's text is
#: repeated 500x (~250 docs of ~100-300 KB at sf1) — volume grows a
#: few % but per-DOC extremes grow ~500x, so a blow-up is attributable
#: to the long-doc path, not data size.
LONGDOC_KEYS = [
    "q_text_token_count",      # O(len) split — expect near-flat
    "q_text_quality",          # ratio heuristics, O(len)
    "q_doc_chunks",            # chunker emits ~500x chunks for hot docs
    "q_pack_context",          # packer vs docs larger than the budget
    "q_dedup_minhash",         # signature kernel: shingles x num_hashes
    "q_text_token_bpe_exact",  # BPE merge loop — the superlinear risk
    # strided-span consumers refit onto operators.text.strided_spans
    # after q_doc_chunks' 52x exposed the explode-then-substring class
    "q_dedup_substring",
    "q_dedup_explain",
    "q_contamination",
    "q_dict_candidates",  # fourth member found by the round-10 re-audit
    # shingles() itself (the whole set-similarity family's gram source)
    # was O(tokens^2) via a computed split inside a transform lambda --
    # jaccard_prefix did not finish a 10-min probe before the zip_with
    # chain rewrite; these two pin the family linear
    "q_dedup_jaccard_prefix",
    "q_dedup_containment",
    # round-11 additions (r10 verdict task 7): the n-gram /
    # window-over-token text keys that share shapes with the fixed
    # class but had no longdoc row yet
    "q_text_keyphrase",
    "q_text_bigram_coherence",
    "q_text_tfidf_top",
    "q_trending_terms",
    "q_word_burstiness",
]
LONGDOC_OUT = os.path.join(REPO, ".scratch", "sf1longdoc")


def build_longdoc(spark) -> None:
    """Long-document twin of the uniform sf1 tier: identical tables,
    but every 200th doc's text is REPEAT'd 500x (and n_chars updated).
    Everything else copies through, so any wall delta is the long-doc
    path at (almost) constant row count."""
    from pyspark.sql import functions as F

    if not os.path.isdir(OUT):
        build(spark)
    tmp = LONGDOC_OUT + ".building"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    d = spark.read.parquet(os.path.join(OUT, "documents.parquet"))
    text = F.when(
        F.col("doc_id") % 200 == 0, F.repeat(F.col("text"), 500)
    ).otherwise(F.col("text"))
    d.select(
        "doc_id",
        text.alias("text"),
        "lang",
        "source",
        F.length(text).cast("long").alias("n_chars"),
    ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    for name in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ):
        src = os.path.join(OUT, f"{name}.parquet")
        dst = os.path.join(tmp, f"{name}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
    if os.path.exists(LONGDOC_OUT):
        shutil.rmtree(LONGDOC_OUT)
    os.rename(tmp, LONGDOC_OUT)


def build_embskew(spark) -> None:
    """Hot-vector twin of the uniform sf1 tier: identical tables, but
    every 5th vec_id's embedding is the corpus's FIRST embedding (one
    point carrying ~20% of the vector mass across all replicas —
    deliberately crossing the replica id-offsetting). Volume, ids, and
    labels are constant vs the uniform tier, so any wall delta is the
    hot-vector skew."""
    from pyspark.sql import functions as F

    if not os.path.isdir(OUT):
        build(spark)
    tmp = EMBSKEW_OUT + ".building"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    e = spark.read.parquet(os.path.join(OUT, "embeddings.parquet"))
    first = e.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    hot = F.array(*[F.lit(float(v)).cast("float") for v in first])
    cols = [c for c in e.columns if c != "embedding"]
    e.select(
        *cols,
        F.when(F.col("vec_id") % 5 == 0, hot)
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    ).select(*e.columns).write.mode("overwrite").parquet(
        os.path.join(tmp, "embeddings.parquet")
    )
    for name in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents",
    ):
        src = os.path.join(OUT, f"{name}.parquet")
        dst = os.path.join(tmp, f"{name}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
    if os.path.exists(EMBSKEW_OUT):
        shutil.rmtree(EMBSKEW_OUT)
    os.rename(tmp, EMBSKEW_OUT)


def build_boiler(spark) -> None:
    """Boilerplate twin of the uniform sf1 tier: identical tables, but
    every 5th document gets the fixed BOILERPLATE run PREPENDED (hot
    shingles with df ≈ 20% of the corpus, position-aligned so the
    stride-sampled substring spans collide too). Volume is constant vs
    the uniform tier, so any wall delta is the hot-shingle skew."""
    from pyspark.sql import functions as F

    if not os.path.isdir(OUT):
        build(spark)
    tmp = BOILER_OUT + ".building"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    d = spark.read.parquet(os.path.join(OUT, "documents.parquet"))
    text = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(F.lit(BOILERPLATE + " "), F.col("text")),
    ).otherwise(F.col("text"))
    d.select(
        "doc_id",
        text.alias("text"),
        "lang",
        "source",
        F.length(text).cast("long").alias("n_chars"),
    ).write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    for name in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ):
        src = os.path.join(OUT, f"{name}.parquet")
        dst = os.path.join(tmp, f"{name}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
    if os.path.exists(BOILER_OUT):
        shutil.rmtree(BOILER_OUT)
    os.rename(tmp, BOILER_OUT)


def build(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    tmp = OUT + ".building"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)

    def replicate(name: str, transform):
        df = spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))
        parts = [transform(df, r) for r in range(REPLICAS)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(
            os.path.join(tmp, f"{name}.parquet")
        )

    def _salted_docs(df, r):
        # Insert a replica-unique token BEFORE every 4th word: at most
        # 4 original words sit between salts, so EVERY word-5-gram
        # window contains a salt token and shingle spaces are DISJOINT
        # across replicas, while the original words — and with them
        # langid markers, stopword ratios, and near-dup alignment
        # within a replica — survive intact. (Every-5th spacing was
        # tried and REJECTED: it leaves one salt-free 5-gram per run,
        # shared byte-identical across all replicas — synthetic
        # cross-replica candidates in every shingle join. A per-token
        # suffix was also REJECTED: it destroyed the \b-anchored
        # language markers, zeroing langid-gated stages.) The salt
        # repeats the replica digit 3x so 40-char prefixes of sibling
        # replicas differ by >4 edits — no cross-replica fuzzy pairs.
        salted = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w, i: F.when(
                    i % 4 == 0, F.concat(F.lit(f"q{r}{r}{r}z "), w)
                ).otherwise(w),
            ),
            " ",
        )
        return df.select(
            (F.col("doc_id") + r * OFF).alias("doc_id"),
            salted.alias("text"),
            "lang",
            "source",
            # keep the fixture invariant n_chars == length(text)
            F.length(salted).cast("long").alias("n_chars"),
        )

    replicate("documents", _salted_docs)
    replicate(
        "lineitem",
        lambda df, r: df.withColumn(
            "l_orderkey", F.col("l_orderkey") + r * OFF
        )
        .withColumn("l_partkey", F.col("l_partkey") + r * OFF)
        .withColumn("l_suppkey", F.col("l_suppkey") + r * OFF),
    )
    replicate(
        "orders",
        lambda df, r: df.withColumn(
            "o_orderkey", F.col("o_orderkey") + r * OFF
        ).withColumn("o_custkey", F.col("o_custkey") + r * OFF),
    )
    replicate(
        "customer",
        lambda df, r: df.withColumn(
            "c_custkey", F.col("c_custkey") + r * OFF
        ),
    )
    replicate(
        "embeddings",
        lambda df, r: df.withColumn("vec_id", F.col("vec_id") + r * OFF),
    )
    replicate(
        "part",
        lambda df, r: df.withColumn("p_partkey", F.col("p_partkey") + r * OFF),
    )
    replicate(
        "supplier",
        lambda df, r: df.withColumn("s_suppkey", F.col("s_suppkey") + r * OFF),
    )
    # Tiny dims copy through as-is (bounded at any SF).
    for name in ("region", "nation"):
        shutil.copy(
            os.path.join(SRC, f"{name}.parquet"),
            os.path.join(tmp, f"{name}.parquet"),
        )
    # events replicates via PYARROW (round 8, for the stream-tail keys):
    # the fixture's timestamp type must survive byte-exact in the footer
    # (read_parquet keys its ns→µs conversion off it), which a Spark
    # round trip would not preserve at every SF. user_id/event_id offset
    # per replica — 10 disjoint user populations, i.e. "the stream grew
    # 10×, per-user behavior unchanged"; timestamps unchanged so window
    # grains hold.
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    ev = pq.read_table(os.path.join(SRC, "events.parquet"))
    parts = []
    for r in range(REPLICAS):
        t = ev
        for key in ("event_id", "user_id"):
            t = t.set_column(
                t.schema.get_field_index(key),
                key,
                pc.add(t[key], r * OFF),
            )
        parts.append(t)
    pq.write_table(
        pa.concat_tables(parts), os.path.join(tmp, "events.parquet")
    )
    if os.path.exists(OUT):
        shutil.rmtree(OUT)
    os.rename(tmp, OUT)


def build_skew(spark) -> None:
    """Skewed twin of :func:`build`: identical replication EXCEPT rows
    whose original key ≡ 0 (mod 5) collapse onto ONE hot key across all
    replicas (~20% of total mass on a single value), and every 5th
    document's ``source`` becomes the single hot source. Dimensions and
    non-skew columns replicate exactly like the uniform tier, so any
    wall-clock delta vs the uniform tier is the skew, not the volume."""
    from pyspark.sql import functions as F

    tmp = SKEW_OUT + ".building"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)

    def replicate(name: str, transform):
        df = spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))
        parts = [transform(df, r) for r in range(REPLICAS)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(
            os.path.join(tmp, f"{name}.parquet")
        )

    def hot(col: str, r: int):
        # ~20% of rows (orig key % 5 == 0) onto the single key 1, which
        # exists in the replicated dimension (replica 0 keeps original
        # keys); the rest offset per replica like the uniform tier
        return F.when(F.col(col) % 5 == 0, F.lit(1)).otherwise(
            F.col(col) + r * OFF
        )

    replicate(
        "lineitem",
        lambda df, r: df.withColumn(
            "l_orderkey", F.col("l_orderkey") + r * OFF
        )
        .withColumn("l_partkey", F.col("l_partkey") + r * OFF)
        .withColumn("l_suppkey", hot("l_suppkey", r)),
    )
    replicate(
        "orders",
        lambda df, r: df.withColumn(
            "o_orderkey", F.col("o_orderkey") + r * OFF
        ).withColumn("o_custkey", hot("o_custkey", r)),
    )
    replicate(
        "customer",
        lambda df, r: df.withColumn("c_custkey", F.col("c_custkey") + r * OFF),
    )
    replicate(
        "supplier",
        lambda df, r: df.withColumn("s_suppkey", F.col("s_suppkey") + r * OFF),
    )
    replicate(
        "part",
        lambda df, r: df.withColumn("p_partkey", F.col("p_partkey") + r * OFF),
    )
    replicate(
        "documents",
        lambda df, r: df.select(
            (F.col("doc_id") + r * OFF).alias("doc_id"),
            "text",
            "lang",
            F.when(F.col("doc_id") % 5 == 0, F.lit("hot_source"))
            .otherwise(F.col("source"))
            .alias("source"),
            "n_chars",
        ),
    )
    replicate(
        "embeddings",
        lambda df, r: df.withColumn("vec_id", F.col("vec_id") + r * OFF),
    )
    for name in ("region", "nation"):
        shutil.copy(
            os.path.join(SRC, f"{name}.parquet"),
            os.path.join(tmp, f"{name}.parquet"),
        )
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    ev = pq.read_table(os.path.join(SRC, "events.parquet"))
    parts = []
    for r in range(REPLICAS):
        t = ev
        t = t.set_column(
            t.schema.get_field_index("event_id"),
            "event_id",
            pc.add(t["event_id"], r * OFF),
        )
        # numpy for the modulo remap (pyarrow.compute ships no mod kernel)
        import numpy as np

        uid = t["user_id"]
        uid_np = uid.to_numpy()
        new_uid = np.where(uid_np % 5 == 0, 1, uid_np + r * OFF)
        t = t.set_column(
            t.schema.get_field_index("user_id"),
            "user_id",
            pa.array(new_uid, type=uid.type),
        )
        parts.append(t)
    pq.write_table(
        pa.concat_tables(parts), os.path.join(tmp, "events.parquet")
    )
    if os.path.exists(SKEW_OUT):
        shutil.rmtree(SKEW_OUT)
    os.rename(tmp, SKEW_OUT)


def main() -> int:
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    from self_healing_data_pipeline_spark.registry import QUERIES, load_all
    from self_healing_data_pipeline_spark.session import get_spark

    load_all()
    spark = get_spark("sf1-probe")
    def run_tier(flag, keys, out_dir, label, build_fn, metric):
        """Shared A/B tier loop (review finding: --boiler/--embskew/
        --longdoc/--skew were four copy-pastes): ensure both fixtures,
        give each key an untimed warm pass PER TIER (the query shape's
        one-time codegen/JIT otherwise lands on whichever tier runs
        first and fakes a delta), then time uniform and variant runs
        and report per-key ratios."""
        if "--rebuild" in sys.argv or not os.path.isdir(out_dir):
            t0 = time.perf_counter()
            build_fn(spark)
            print(f"built {out_dir} in {time.perf_counter() - t0:.0f}s",
                  file=sys.stderr)
        if not os.path.isdir(OUT):
            build(spark)
        results = {}
        for q in keys:
            if only and q not in only:
                continue
            for d in (OUT, out_dir):  # untimed warm pass per tier
                QUERIES[q](spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
            t0 = time.perf_counter()
            QUERIES[q](spark, OUT).write.format("noop").mode(
                "overwrite"
            ).save()
            uniform = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            QUERIES[q](spark, out_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            variant = round(time.perf_counter() - t0, 2)
            results[q] = {
                "sf1_uniform": uniform,
                label: variant,
                "ratio": round(variant / uniform, 2) if uniform else None,
            }
            print(json.dumps({q: results[q]}), file=sys.stderr)
        print(json.dumps({"metric": metric, "results": results}))

    TIERS = {
        "--boiler": (BOILER_KEYS, BOILER_OUT, "sf1_boiler", build_boiler,
                     "sf1_boiler_probe"),
        "--embskew": (EMBSKEW_KEYS, EMBSKEW_OUT, "sf1_embskew",
                      build_embskew, "sf1_embskew_probe"),
        "--longdoc": (LONGDOC_KEYS, LONGDOC_OUT, "sf1_longdoc",
                      build_longdoc, "sf1_longdoc_probe"),
        "--skew": (SKEW_KEYS, SKEW_OUT, "sf1_skew", build_skew,
                   "sf1_skew_probe"),
    }
    for flag, (keys, out_dir, label, build_fn, metric) in TIERS.items():
        if flag in sys.argv:
            run_tier(flag, keys, out_dir, label, build_fn, metric)
            return 0
    if "--rebuild" in sys.argv or not os.path.isdir(OUT):
        t0 = time.perf_counter()
        build(spark)
        print(f"built {OUT} in {time.perf_counter() - t0:.0f}s",
              file=sys.stderr)

    def timed(qname: str, d: str) -> float:
        t0 = time.perf_counter()
        QUERIES[qname](spark, d).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.perf_counter() - t0, 2)

    results = {}
    for q in PROBE_KEYS:
        if only and q not in only:
            continue
        small = timed(q, SRC)
        large = timed(q, OUT)
        results[q] = {
            "sf01": small,
            "sf1": large,
            "factor": REPLICAS,
            "ratio": round(large / small, 2) if small else None,
        }
        print(json.dumps({q: results[q]}), file=sys.stderr)
    print(json.dumps({"metric": "sf1_probe", "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
