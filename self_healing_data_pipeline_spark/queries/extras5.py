"""Round-4 additions (SURVEY.md §2.11 corpus/LLM-pipeline ops + §2.4
sketch accuracy + §2.9 event analytics): context-window packing, domain
mixture rebalancing, Markov transition matrices, HLL accuracy gates,
bigram coherence scoring, and cross-document substring-span dedup.

Scale notes follow the repo discipline: every aggregate is a map-side
partial, ratios are single IEEE divisions over exact integer sums, and
nothing shuffles text when a fingerprint suffices (substring dedup
shuffles 32-hex span hashes, never spans).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

_CTX = 512  # tokens per packed context window
_SPAN = 64  # substring-dedup span length
_STRIDE = 32  # span stride (overlapping halves so no dup straddles a gap)
_PFX_BUCKET = 4096  # doc_ids per prefix-sum bucket (two-phase running sum)


@query(
    "q_pack_context",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source,
             LEN(string_split(text, ' ')) AS n_tokens
      FROM documents
    ), spans AS (
      SELECT doc_id, source, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens
               AS start_tok
      FROM toks
    )
    , wins AS (
      SELECT source, doc_id,
             UNNEST(generate_series(
               CAST(FLOOR(start_tok / {_CTX}.0) AS BIGINT),
               CAST(FLOOR((start_tok + n_tokens - 1) / {_CTX}.0) AS BIGINT)
             )) AS window_id
      FROM spans
    )
    SELECT source, window_id,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM wins
    GROUP BY source, window_id
    ORDER BY source, window_id
    """,
)
def q_pack_context(spark, sf_dir):
    """Context-window packing — the training-data step that concatenates
    documents per source and slices the token stream into fixed
    512-token windows (how LLM pretraining actually packs sequences;
    cf. the fixed-budget shard packing of ``q_shard_assign``, which packs
    whole docs by chars). Output: per (source, window) the documents the
    window draws from — the provenance index needed for per-example
    attribution and loss masking at window boundaries.

    Plan: the running token offset is a TWO-PHASE distributed prefix sum
    (a corpus has few sources, so a plain per-source ordered window would
    serialize each source through one task): docs bucket into contiguous
    doc_id ranges (4096 ids/bucket), phase 1 aggregates one token
    subtotal per (source, bucket) — a table 3-4 orders of magnitude
    smaller than the corpus — and turns it into per-bucket cumulative
    offsets with a window over that small table (partitioned by source;
    input is bucket-grain, never doc-grain); phase 2 broadcasts the
    offsets back and runs the running sum WITHIN each (source, bucket)
    partition, which parallelizes across buckets. Then an engine-side
    ``explode(sequence(...))`` over each doc's touched window range —
    expansion is bounded by tokens/512 per doc, and the shuffle key is
    (source, window_id): partition-parallel at any corpus size
    (tests/test_scale_shapes.py asserts no SinglePartition and that the
    doc-bearing window partitions by the bucket)."""
    d = read_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    toks = d.select(
        "doc_id",
        "source",
        n_tokens.alias("n_tokens"),
        F.floor(F.col("doc_id") / _PFX_BUCKET).alias("__pfx_bucket"),
    )
    # phase 1: per-(source, bucket) subtotals -> cumulative bucket offsets
    wb = (
        Window.partitionBy("source")
        .orderBy("__pfx_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        toks.groupBy("source", "__pfx_bucket")
        .agg(F.sum("n_tokens").alias("__sub"))
        .select(
            "source",
            "__pfx_bucket",
            F.coalesce(F.sum("__sub").over(wb), F.lit(0)).alias("__bucket_off"),
        )
    )
    # phase 2: narrow within-bucket running sum + the broadcast offset
    ww = (
        Window.partitionBy("source", "__pfx_bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = (
        toks.join(F.broadcast(offsets), ["source", "__pfx_bucket"])
        .withColumn(
            "start_tok",
            F.col("__bucket_off") + F.sum("n_tokens").over(ww) - F.col("n_tokens"),
        )
    )
    return (
        spans.select(
            "doc_id",
            "source",
            F.explode(
                F.sequence(
                    F.floor(F.col("start_tok") / _CTX),
                    F.floor((F.col("start_tok") + F.col("n_tokens") - 1) / _CTX),
                )
            ).alias("window_id"),
        )
        .groupBy("source", "window_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "window_id")
    )


@query(
    "q_domain_mixture",
    oracle="""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_before FROM documents GROUP BY source
    ), target AS (
      SELECT MIN(n_before) AS floor_n FROM counts
    ), rated AS (
      SELECT c.source, c.n_before,
             CAST(FLOOR(256.0 * t.floor_n / c.n_before) AS BIGINT) AS keep_256
      FROM counts c CROSS JOIN target t
    )
    SELECT d.source, r.n_before, r.keep_256,
           COUNT(*) FILTER (
             WHERE r.keep_256 >= 256
                OR SUBSTRING(MD5(CAST(d.doc_id AS VARCHAR)), 1, 2)
                   < printf('%02x', r.keep_256)
           ) AS n_kept
    FROM documents d JOIN rated r ON d.source = r.source
    GROUP BY d.source, r.n_before, r.keep_256
    ORDER BY d.source
    """,
)
def q_domain_mixture(spark, sf_dir):
    """Domain-mixture rebalancing: downsample every source to (about)
    the smallest source's size with a DETERMINISTIC per-row hash test —
    the corpus-mixing step of a pretraining data recipe, seedless and
    partition-invariant like ``q_sample_hash``. The keep rate is
    quantized to k/256 and applied as a 2-hex-digit md5 prefix
    threshold, so membership is a pure function of doc_id and the
    per-source count: re-ingesting or re-partitioning the corpus keeps
    the SAME documents.

    Plan: one tiny per-source count aggregate (broadcast back), then a
    narrow map-side filter — no shuffle touches document text."""
    d = read_table(spark, sf_dir, "documents")
    # the smallest source's size is a window min OVER the per-source
    # counts (one subtree; a separate agg branch would re-scan), so the
    # whole query reads documents exactly twice: once for rates, once
    # for the filtered count — the two-pass minimum for global-rate
    # sampling
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_before"))
    rated = counts.select(
        "source",
        "n_before",
        F.floor(
            256.0
            * F.min("n_before").over(Window.partitionBy())
            / F.col("n_before")
        )
        .cast("bigint")
        .alias("keep_256"),
    )
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    thresh = F.lpad(F.lower(F.conv(F.col("keep_256").cast("string"), 10, 16)), 2, "0")
    return (
        d.join(F.broadcast(rated), "source")
        .groupBy("source", "n_before", "keep_256")
        .agg(
            F.count(
                F.when((F.col("keep_256") >= 256) | (h < thresh), 1)
            ).alias("n_kept")
        )
        .orderBy("source")
    )


@query(
    "q_events_markov",
    oracle="""
    WITH steps AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events
    ), trans AS (
      SELECT from_type, to_type, COUNT(*) AS n
      FROM steps WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
    FROM trans
    ORDER BY from_type, to_type
    """,
)
def q_events_markov(spark, sf_dir):
    """First-order Markov transition matrix over user event streams
    (the behavioral-model summary behind ``q_events_top_paths``): for
    each (from, to) event-type pair, the transition count and its
    row-normalized probability. The probability is ONE IEEE division of
    two exact integer counts — order-independent, cross-engine stable.

    Plan: one user-partitioned window (LEAD), one (from, to) aggregate
    with map-side partials, one tiny window over the |types|² matrix."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    steps = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    trans = steps.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wrow = Window.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wrow).cast("double")).alias(
            "p"
        ),
    ).orderBy("from_type", "to_type")


@query(
    "q_distinct_sketch_accuracy",
    oracle="""
    SELECT 'l_partkey' AS col, COUNT(DISTINCT l_partkey) AS exact_distinct,
           TRUE AS approx_within_5pct FROM lineitem
    UNION ALL
    SELECT 'o_custkey', COUNT(DISTINCT o_custkey), TRUE FROM orders
    UNION ALL
    SELECT 'user_id', COUNT(DISTINCT user_id), TRUE FROM events
    ORDER BY col
    """,
)
def q_distinct_sketch_accuracy(spark, sf_dir):
    """HLL sketch accuracy GATE: per column, the exact distinct count
    (oracle-verified) alongside an in-row witness that the
    ``approx_count_distinct`` estimate (rsd=0.02, the profiler's
    cardinality sketch) lands within ±5% of it. The oracle expects the
    witness TRUE — if Spark's HLL ever drifts out of tolerance the hash
    check fails, so sketch accuracy is pinned by the correctness gate
    itself, at every SF the driver runs."""
    frames = []
    for tbl, col in (
        ("lineitem", "l_partkey"),
        ("orders", "o_custkey"),
        ("events", "user_id"),
    ):
        t = read_table(spark, sf_dir, tbl)
        frames.append(
            t.agg(
                F.countDistinct(col).alias("exact_distinct"),
                F.approx_count_distinct(col, rsd=0.02).alias("est"),
            ).select(
                F.lit(col).alias("col"),
                "exact_distinct",
                (
                    F.abs(F.col("est") - F.col("exact_distinct"))
                    <= 0.05 * F.col("exact_distinct")
                ).alias("approx_within_5pct"),
            )
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.orderBy("col")


@query(
    "q_text_bigram_coherence",
    oracle="""
    WITH idx AS (
      SELECT doc_id, string_split(lower(text), ' ') AS arr,
             UNNEST(generate_series(
               1, LEN(string_split(lower(text), ' ')) - 1)) AS i
      FROM documents
    ), pairs AS (
      SELECT doc_id, arr[CAST(i AS INT)] AS w1,
             arr[CAST(i AS INT) + 1] AS w2
      FROM idx
    ), c2 AS (
      SELECT w1, w2, COUNT(*) AS n2 FROM pairs GROUP BY w1, w2
    ), c1 AS (
      SELECT w1, COUNT(*) AS n1 FROM pairs GROUP BY w1
    )
    SELECT p.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(c2.n2) AS BIGINT) AS corpus_bigram_mass,
           CAST(SUM(c1.n1) AS BIGINT) AS corpus_unigram_mass,
           CAST(SUM(c2.n2) AS DOUBLE) / CAST(SUM(c1.n1) AS DOUBLE)
             AS coherence
    FROM pairs p
    JOIN c2 ON p.w1 = c2.w1 AND p.w2 = c2.w2
    JOIN c1 ON p.w1 = c1.w1
    GROUP BY p.doc_id
    ORDER BY p.doc_id
    """,
)
def q_text_bigram_coherence(spark, sf_dir):
    """Perplexity-proxy document scoring from a corpus-trained bigram
    model — the fluency/quality signal a data pipeline computes without
    an LM: for each document, how typical its word transitions are,
    scored as Σ c(w1,w2) / Σ c(w1) over its bigrams (a ratio of two
    exact integer masses — ONE IEEE division per doc, engine-stable,
    unlike a sum of per-bigram log-probs whose float order would
    drift). High = made of common transitions; low = unusual text.

    Plan: tokenize ONCE (posexplode), LEAD per doc for bigrams, then
    pre-aggregate the token stream to (doc_id, w1, w2, cnt) BEFORE any
    join — repeated bigrams within a document collapse, so the two
    model-count joins (on (w1, w2) and on w1) move doc-grain counted
    rows, not the raw token stream, cutting both shuffle volume and the
    Zipf skew mass on the w1 key ("the" carries one row per document
    that uses it, not one per occurrence; AQE skew-join splitting covers
    the residual head). Model masses then weight by cnt:
    Σ cnt·n over the collapsed rows equals the per-occurrence sum
    exactly, so the doc score is unchanged. Shuffles carry words and
    counts, never documents."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("ord", "w"),
    )
    wseq = Window.partitionBy("doc_id").orderBy("ord")
    pairs = (
        toks.select(
            "doc_id",
            F.col("w").alias("w1"),
            F.lead("w").over(wseq).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    c2 = pairs.groupBy("w1", "w2").agg(F.sum("cnt").alias("n2"))
    c1 = pairs.groupBy("w1").agg(F.sum("cnt").alias("n1"))
    return (
        pairs.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("cnt") * F.col("n2")).cast("bigint").alias(
                "corpus_bigram_mass"
            ),
            F.sum(F.col("cnt") * F.col("n1")).cast("bigint").alias(
                "corpus_unigram_mass"
            ),
            (
                F.sum(F.col("cnt") * F.col("n2")).cast("double")
                / F.sum(F.col("cnt") * F.col("n1")).cast("double")
            ).alias("coherence"),
        )
        .orderBy("doc_id")
    )


@query(
    "q_dedup_substring",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, text,
             UNNEST(generate_series(
               1, CAST(n_chars AS BIGINT) - {_SPAN - 1}, {_STRIDE}
             )) AS p
      FROM documents WHERE n_chars >= {_SPAN}
    ), spans AS (
      SELECT doc_id,
             MD5(SUBSTRING(text, CAST(p AS INTEGER), {_SPAN})) AS span_hash
      FROM pos
    )
    SELECT span_hash,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_occurrences
    FROM spans
    GROUP BY span_hash
    HAVING COUNT(DISTINCT doc_id) >= 2
    ORDER BY span_hash
    """,
)
def q_dedup_substring(spark, sf_dir):
    """Cross-document repeated-substring detection (the Lee et al. 2022
    "Deduplicating Training Data" signal, stride-sampled): hash every
    64-char span at stride 32 and report spans appearing in
    ≥2 distinct documents. Stride 32 = span/2 guarantees any
    shared region ≥ 96 chars yields at least one ALIGNED
    common span for exact duplicates; it is the hash-sampled stand-in
    for the suffix-array exact method, which is the right trade at
    corpus scale.

    Plan: span extraction via the shared linear cell/lead-window form
    (``operators.text.strided_spans`` — round-10 long-doc fix; the
    original explode-then-substring shape was quadratic per doc on
    100 KB+ documents: full-text duplication per span row plus
    substring's O(pos) char scan), md5 immediately — the gram shuffle
    and the aggregate carry 32-hex hashes, never text. Distinct-doc
    counting is a two-level aggregate with map-side partials."""
    from self_healing_data_pipeline_spark.operators.text import (
        strided_spans,
    )

    d = read_table(spark, sf_dir, "documents")
    spans = strided_spans(
        d.filter(F.col("n_chars") >= _SPAN),
        "doc_id",
        F.col("text"),
        _SPAN,
        _STRIDE,
    ).select("doc_id", F.md5("span_text").alias("span_hash"))
    return (
        spans.groupBy("span_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy("span_hash")
    )
