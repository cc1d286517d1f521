"""Tier-C north-star queries: dedup, similarity, text analysis, UDF surface
(SURVEY.md §2.10-2.11, build step 7)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from self_healing_data_pipeline_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    normalize_text,
)
from self_healing_data_pipeline_spark.operators.similarity import (
    blocked_dedup_survivors,
    brute_force_topk,
    ivf_topk,
    lsh_ann_topk,
    similarity_join,
)
from self_healing_data_pipeline_spark.operators.text import (
    lang_id,
    quality_score,
    token_count,
    top_terms,
)
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

from self_healing_data_pipeline_spark.operators.dedup import (
    NORMALIZE_TEXT_SQL as _NORM_SQL,
)


@query(
    "q_dedup_normalized",
    oracle=f"""
    SELECT SUBSTRING(MD5({_NORM_SQL.format(c='text')}), 1, 16) AS fingerprint,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS representative_id
    FROM documents
    GROUP BY 1
    """,
)
def q_dedup_normalized(spark, sf_dir):
    """Normalized-text dedup groups keyed on a 64-bit fingerprint.

    normalize → md5-prefix fingerprint (computed map-side) → hash-groupBy.
    The shuffle key is 16 hex chars, not the document text, so shuffle
    bytes stay O(|groups| × 16) instead of O(corpus) — the difference
    between a metadata-sized shuffle and re-shuffling all 100 TB. md5 is
    computed identically over UTF-8 in Spark and DuckDB, so the oracle
    twins exactly.
    """
    docs = read_table(spark, sf_dir, "documents")
    fp = F.substring(F.md5(normalize_text("text")), 1, 16)
    return docs.groupBy(fp.alias("fingerprint")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("representative_id"),
    )


@query(
    "q_dedup_keep_first_docs",
    oracle="""
    SELECT lang, source, doc_id, n_chars FROM (
      SELECT lang, source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang, source
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
)
def q_dedup_keep_first_docs(spark, sf_dir):
    """Exact dedup by key with deterministic representative (longest doc,
    then lowest id) — dropDuplicates with a defined winner."""
    docs = read_table(spark, sf_dir, "documents")
    return dedup_exact(
        docs.select("lang", "source", "doc_id", "n_chars"),
        keys=["lang", "source"],
        order_by=[F.col("n_chars").desc(), F.col("doc_id").asc()],
    )


@query(
    "q_dedup_pairs",
    oracle=f"""
    WITH n AS (SELECT doc_id, lang, {_NORM_SQL.format(c='text')} AS nt FROM documents)
    SELECT l.doc_id AS id_l, r.doc_id AS id_r
    FROM n l JOIN n r
      ON l.lang = r.lang AND SUBSTRING(l.nt, 1, 40) = SUBSTRING(r.nt, 1, 40)
     AND l.doc_id < r.doc_id
    """,
)
def q_dedup_pairs(spark, sf_dir):
    """Candidate dup pairs via blocked self-join (block = lang + normalized
    40-char prefix): the O(Σ|block|²) pattern that replaces O(n²) at scale."""
    docs = read_table(spark, sf_dir, "documents")
    n = docs.select(
        "doc_id",
        "lang",
        F.substring(normalize_text("text"), 1, 40).alias("blk"),
    )
    l = n.alias("l")
    r = n.alias("r")
    return (
        l.join(
            r,
            (F.col("l.lang") == F.col("r.lang"))
            & (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("id_l"), F.col("r.doc_id").alias("id_r"))
    )


@query("q_dedup_minhash")  # LSH banding is not SQL-expressible → rows-only
def q_dedup_minhash(spark, sf_dir):
    """MinHash+LSH candidate pairs (32 hashes, 8 bands over 5-gram shingles).
    See operators.dedup.minhash_lsh_pairs for the scale analysis."""
    docs = read_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, "doc_id", "text")


@query(
    "q_sim_topk",
    oracle="""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           (SELECT SUM(CAST(e.embedding[i] * q.qv[i] AS DOUBLE))
              FROM generate_series(1, 64) AS t(i)) AS score
    FROM embeddings e, q
    ORDER BY score DESC, e.vec_id ASC
    LIMIT 10
    """,
)
def q_sim_topk(spark, sf_dir):
    """Exact vector top-k: dot product vs the vec_id=0 embedding, all in
    Catalyst (zip_with + aggregate) → TakeOrderedAndProject."""
    emb = read_table(spark, sf_dir, "embeddings")
    qvec = (
        emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    )
    return brute_force_topk(emb, list(qvec), k=10)


@query("q_sim_ann_lsh")  # approximate: candidate set differs by design → rows-only
def q_sim_ann_lsh(spark, sf_dir):
    """LSH-bucketed approximate NN for the same query vector — the scale
    path (probes ~n/2^bits · tables rows instead of n). Self-witnessing:
    each returned neighbor carries ``in_exact_topk`` (membership in the
    brute-force top-10), so the rows-only record shows measured recall,
    not just a candidate list."""
    import math

    emb = read_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    # Size the code so buckets hold ~128 vectors, and probe 8 tables:
    # recall per table is p^bits with p = 1 - θ/π, so fewer bits + more
    # tables trades probe cost for recall. The fixture's vectors are
    # near-uniform random — the worst case for LSH (true neighbors are
    # only ~0.3-similar); the witness column records the achieved recall
    # honestly rather than hiding it.
    n = emb.count()
    bits = max(2, int(math.log2(max(n / 128, 2))))
    ann = lsh_ann_topk(emb, list(qvec), k=10, tables=8, bits=bits)
    exact = brute_force_topk(emb, list(qvec), k=10).select(
        F.col("vec_id").alias("exact_id")
    )
    return ann.join(
        F.broadcast(exact), ann["vec_id"] == F.col("exact_id"), "left"
    ).select(
        "vec_id", "score", F.col("exact_id").isNotNull().alias("in_exact_topk")
    )


@query("q_sim_join_lsh")  # LSH candidate generation → rows-only
def q_sim_join_lsh(spark, sf_dir):
    """Label-free embedding near-dup pairs: LSH-bucket candidates + exact
    cosine verify ≥ 0.4 (the 100 TB path when no blocking key exists).
    4 tables × 4 bits ≈ 50% recall at the threshold on random data —
    recall/bucket-size is the tunable LSH trade. The verified cosine rides
    in the output so the rows-only record witnesses every pair actually
    clears the threshold."""
    from self_healing_data_pipeline_spark.operators.similarity import (
        similarity_join_lsh,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    return similarity_join_lsh(emb, threshold=0.4, bits=4).select(
        "id_l", "id_r", "cosine_sim", (F.col("cosine_sim") >= 0.4).alias("above_threshold")
    )


def _sim_ivf_oracle() -> str:
    """Full SQL replay of q_sim_ivf (round-9 promotion #6, the
    q_ann_recall_at_k technique): deterministic seed centroids, probe
    selection, argmax assignment, candidate scoring and the exact
    baseline are all arithmetic over the fixture; dot products mirror
    functions.vector.dot_product (float32 products, strict left-fold
    double accumulation). Same numpy-pairwise-vs-sequential-fold
    last-ulp residual as q_kmeans_assign — only matters at argmax/
    probe-rank ties; verified bit-green at all three SFs."""

    def dot32(a, b):
        return (
            f"list_reduce(list_transform(range(1, len({a}) + 1), "
            f"i -> CAST({a}[i] * {b}[i] AS DOUBLE)), (x, y) -> x + y)"
        )

    def dot64(a, b):
        return (
            f"list_reduce(list_transform(range(1, len({a}) + 1), "
            f"i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
        )

    return f"""
    WITH q AS (
      SELECT embedding AS qv,
             list_transform(embedding, v -> CAST(v AS DOUBLE)) AS qd
      FROM embeddings WHERE vec_id = 0
    ), ed AS (
      SELECT vec_id,
             list_transform(embedding, v -> CAST(v AS DOUBLE)) AS x
      FROM embeddings
    ), cent AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS centroid_id,
             list_transform(x, v -> v / (CASE WHEN nrm = 0 THEN 1.0
                                              ELSE nrm END)) AS cd
      FROM (SELECT vec_id, x,
                   SQRT(list_reduce(list_transform(x, u -> u * u),
                                    (a, b) -> a + b)) AS nrm
            FROM (SELECT vec_id, x FROM ed ORDER BY vec_id LIMIT 16))
    ), probe AS (
      SELECT centroid_id FROM (
        SELECT cent.centroid_id,
               ROW_NUMBER() OVER (
                 ORDER BY {dot64('cent.cd', 'q.qd')} DESC,
                          cent.centroid_id) AS rn
        FROM cent, q) WHERE rn <= 4
    ), assign AS (
      SELECT vec_id, centroid_id FROM (
        SELECT ed.vec_id, cent.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY ed.vec_id
                 ORDER BY {dot64('ed.x', 'cent.cd')} DESC,
                          cent.centroid_id) AS rn
        FROM ed, cent) WHERE rn = 1
    ), ann AS (
      SELECT e.vec_id, {dot32('e.embedding', 'q.qv')} AS score
      FROM embeddings e
      JOIN assign a ON a.vec_id = e.vec_id
      CROSS JOIN q
      WHERE a.centroid_id IN (SELECT centroid_id FROM probe)
      ORDER BY score DESC, e.vec_id LIMIT 10
    ), exact AS (
      SELECT vec_id AS exact_id FROM (
        SELECT e.vec_id,
               ROW_NUMBER() OVER (
                 ORDER BY {dot32('e.embedding', 'q.qv')} DESC,
                          e.vec_id) AS rn
        FROM embeddings e, q) WHERE rn <= 10
    )
    SELECT a.vec_id, a.score,
           (e.exact_id IS NOT NULL) AS in_exact_topk
    FROM ann a LEFT JOIN exact e ON a.vec_id = e.exact_id
    ORDER BY a.vec_id
    """


@query("q_sim_ivf", oracle=_sim_ivf_oracle())
def q_sim_ivf(spark, sf_dir):
    """IVF-style ANN (coarse quantizer + probed inverted lists) — the
    partition-pruned alternative to LSH bucketing. Carries the same
    ``in_exact_topk`` recall witness as q_sim_ann_lsh. Oracle-backed
    since round 9 (promotion #6): the entire pipeline — seed centroids,
    probe selection, argmax assignment, candidate scoring, exact
    baseline — is deterministic arithmetic, replayed in DuckDB with
    mirrored float chains, so the driver hash-verifies the ANN answer
    and its scores, not just a recall bound."""
    emb = read_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    ann = ivf_topk(emb, list(qvec), k=10)
    exact = brute_force_topk(emb, list(qvec), k=10).select(
        F.col("vec_id").alias("exact_id")
    )
    return ann.join(
        F.broadcast(exact), ann["vec_id"] == F.col("exact_id"), "left"
    ).select(
        "vec_id", "score", F.col("exact_id").isNotNull().alias("in_exact_topk")
    )


@query(
    "q_sim_join",
    oracle="""
    SELECT l.vec_id AS id_l, r.vec_id AS id_r
    FROM embeddings l JOIN embeddings r
      ON l.label = r.label AND l.vec_id < r.vec_id
    WHERE (SELECT SUM(CAST(l.embedding[i] * r.embedding[i] AS DOUBLE))
             FROM generate_series(1, 64) AS t(i))
          / (SQRT((SELECT SUM(CAST(l.embedding[i] * l.embedding[i] AS DOUBLE))
                     FROM generate_series(1, 64) AS t(i)))
             * SQRT((SELECT SUM(CAST(r.embedding[i] * r.embedding[i] AS DOUBLE))
                       FROM generate_series(1, 64) AS t(i))))
          >= 0.2
    """,
)
def q_sim_join(spark, sf_dir):
    """Blocked pairwise cosine-similarity join (block = label, τ=0.2).
    Pair ids only in the checked output; scores are float-sensitive."""
    emb = read_table(spark, sf_dir, "embeddings")
    return similarity_join(emb, block_col="label", threshold=0.2).select(
        "id_l", "id_r"
    )


@query(
    "q_dedup_embedding",
    oracle="""
    SELECT e.vec_id
    FROM embeddings e
    WHERE NOT EXISTS (
      SELECT 1 FROM embeddings l
      WHERE l.label = e.label AND l.vec_id < e.vec_id
        AND (SELECT SUM(CAST(l.embedding[i] * e.embedding[i] AS DOUBLE))
               FROM generate_series(1, 64) AS t(i))
            / (SQRT((SELECT SUM(CAST(l.embedding[i] * l.embedding[i] AS DOUBLE))
                       FROM generate_series(1, 64) AS t(i)))
               * SQRT((SELECT SUM(CAST(e.embedding[i] * e.embedding[i] AS DOUBLE))
                         FROM generate_series(1, 64) AS t(i))))
            >= 0.2
    )
    """,
)
def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup DEDUP: keep each row with no lower-id
    neighbor at cosine ≥ τ within its block (keep-first representative).

    Round 12: runs at VALUE grain via operators.similarity.
    blocked_dedup_survivors — the semdedup_drops collapse. The sf1
    probe caught the vector-grain form at 15.8× wall for 10× data
    (replicated corpora grow blocks linearly → the blocked pair join
    quadratically); collapsing bit-identical vectors first is EXACT
    for keep-first semantics (see the operator docstring) and re-probes
    linear. The DuckDB oracle deliberately stays at vector grain — an
    independent formulation, not a rewrite twin."""
    emb = read_table(spark, sf_dir, "embeddings")
    return blocked_dedup_survivors(
        emb, block_col="label", threshold=0.2
    ).select("vec_id")


@query(
    "q_text_tokens",
    oracle=f"""
    SELECT token, COUNT(*) AS n FROM (
      SELECT UNNEST(STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ')) AS token
      FROM documents
    ) WHERE LENGTH(token) > 0
    GROUP BY token ORDER BY n DESC, token ASC LIMIT 20
    """,
)
def q_text_tokens(spark, sf_dir):
    """Corpus top terms: tokenize → explode → count → top-k."""
    return top_terms(read_table(spark, sf_dir, "documents"), "text", 20)


@query(
    "q_text_rollup",
    oracle="""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY lang, source ORDER BY lang, source
    """,
)
def q_text_rollup(spark, sf_dir):
    """Per-language/source corpus rollup."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
        .orderBy("lang", "source")
    )


@query(
    "q_text_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(LEN(LIST_FILTER(STRING_SPLIT({_NORM_SQL.format(c='text')}, ' '),
                                t -> LENGTH(t) > 0)) AS BIGINT) AS n_tokens,
           CAST(LENGTH(text) AS BIGINT) AS n_chars_actual
    FROM documents
    """,
)
def q_text_token_count(spark, sf_dir):
    """Per-doc token counting (whitespace mode)."""
    docs = read_table(spark, sf_dir, "documents")
    toks = F.split(normalize_text("text"), " ")
    return docs.select(
        "doc_id",
        F.size(F.filter(toks, lambda t: F.length(t) > 0)).cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_actual"),
    )


@query(
    "q_text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           CAST('0x' || SUBSTR(MD5({_NORM_SQL.format(c='text')}), 1, 15)
                AS BIGINT) AS fingerprint
    FROM documents
    """,
)
def q_text_fingerprint(spark, sf_dir):
    """64-bit content fingerprints of normalized text — PROMOTED to
    oracle-backed (round-10): the fingerprint is now the first 15 hex
    digits (60 bits, always in signed-BIGINT range) of md5(normalized
    text), an algorithm both engines share bit-for-bit, instead of
    Spark-private xxhash64 (still available as
    ``operators.text.fingerprint64`` for engine-internal fast paths).
    Same narrow no-shuffle map either way; md5-vs-xxhash cost is
    irrelevant next to the scan. Spark converts hex via ``conv(...,16,
    10)``; DuckDB casts the '0x'-prefixed literal."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.conv(F.substring(F.md5(normalize_text("text")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("fingerprint"),
    )


def _marker_counts_sql() -> str:
    from self_healing_data_pipeline_spark.operators.text import LANG_MARKERS

    cols = ",\n           ".join(
        "LEN(REGEXP_EXTRACT_ALL(norm, '\\b(" + "|".join(ws) + ")\\b'))"
        f" AS s_{lang}"
        for lang, ws in LANG_MARKERS.items()
    )
    return cols


def _langid_case_sql() -> str:
    from self_healing_data_pipeline_spark.operators.text import LANG_MARKERS

    langs = list(LANG_MARKERS)
    best = "GREATEST(" + ", ".join(f"s_{l}" for l in langs) + ")"
    whens = "\n           ".join(
        f"WHEN s_{l} = {best} AND s_{l} > 0 THEN '{l}'" for l in langs
    )
    return f"CASE {whens} ELSE 'und' END"


@query(
    "q_text_langid",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, lang, {_NORM_SQL.format(c='text')} AS norm FROM documents
    ), scored AS (
      SELECT doc_id, lang,
           {{marker_cols}}
      FROM base
    )
    SELECT doc_id, lang, {{case_expr}} AS lang_pred FROM scored
    """.format(marker_cols=_marker_counts_sql(), case_expr=_langid_case_sql()),
)
def q_text_langid(spark, sf_dir):
    """Heuristic language ID (stopword-family argmax) vs the labeled
    lang. Oracle-backed as of round 5: the marker hit counts are exact
    integers (one RE2/Java regex count per family — \\b-anchored whole-
    word alternations agree across leftmost-first vs leftmost-longest
    engines) and the argmax tie-break is the same CASE precedence, so
    the prediction is deterministic cross-engine. The oracle's regex
    and precedence are BUILT FROM the same ``LANG_MARKERS`` dict the
    Spark operator uses."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", lang_id("text").alias("lang_pred"))


@query(
    "q_text_quality",
    oracle="""
    WITH base AS (
      SELECT doc_id, text, n_chars,
             TRIM(REGEXP_REPLACE(LOWER(text), '[^a-z0-9]+', ' ', 'g')) AS norm
      FROM documents
    ), c AS (
      SELECT doc_id,
        CAST(n_chars AS DOUBLE) AS n,
        CAST(LENGTH(norm) - LENGTH(REPLACE(norm, ' ', '')) + 1 AS DOUBLE)
          AS n_toks,
        CAST(LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
          AS alpha,
        CAST(LENGTH(text) AS DOUBLE) AS lc,
        CAST(LEN(REGEXP_EXTRACT_ALL(norm, '{stop_pat}')) AS DOUBLE)
          AS stop_hits
      FROM base
    )
    SELECT doc_id,
      (CASE WHEN n >= 100 AND n <= 20000 THEN 0.25 ELSE 0.0 END
       + CASE WHEN (n / n_toks) >= 3.0 AND (n / n_toks) <= 12.0
              THEN 0.25 ELSE 0.0 END
       + (CASE WHEN lc > 0 THEN alpha / lc ELSE 0.0 END) * 0.25
       + LEAST((CASE WHEN n_toks > 0 THEN stop_hits / n_toks ELSE 0.0 END)
               * 2.5, 1.0) * 0.25
      ) AS quality
    FROM c
    """.format(
        stop_pat=r"\b("
        + "|".join(
            __import__(
                "self_healing_data_pipeline_spark.operators.text",
                fromlist=["_STOPWORDS"],
            )._STOPWORDS
        )
        + r")\b"
    ),
)
def q_text_quality(spark, sf_dir):
    """Deterministic quality scores (length/alpha/stopword/word-len
    bands). Oracle-backed as of round 5: every component is a regex
    count or length ratio of exact integers, and the oracle mirrors the
    Spark operator's IEEE operand order term by term (band constants
    first, then alpha ratio, then the capped stopword ratio) — raw
    doubles are bit-identical cross-engine, so the former round(4) is
    dropped rather than risking engine-specific tie rounding."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", quality_score("text", "n_chars").alias("quality")
    )


@query(
    "q_pandas_udf",
    oracle="""
    SELECT o_orderkey,
           o_totalprice * 0.07 + 5.0 AS fee
    FROM orders
    """,
)
def q_pandas_udf(spark, sf_dir):
    """Vectorized (Arrow) pandas UDF — the sanctioned slow path for logic
    Catalyst can't express (reference twin: LLM-generated Python transform
    scripts, geminiService.ts:150-159). Checked against a SQL oracle
    (same IEEE multiply-add on both sides → bit-identical doubles)."""

    @pandas_udf("double")
    def fee_udf(price: pd.Series) -> pd.Series:
        return price * 0.07 + 5.0

    o = read_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", fee_udf(F.col("o_totalprice")).alias("fee"))


@query(
    "q_sim_range",
    oracle="""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           (SELECT SUM(CAST(e.embedding[i] * q.qv[i] AS DOUBLE))
              FROM generate_series(1, 64) AS t(i)) AS score
    FROM embeddings e, q
    WHERE (SELECT SUM(CAST(e.embedding[i] * q.qv[i] AS DOUBLE))
             FROM generate_series(1, 64) AS t(i)) >= 0.25
    ORDER BY score DESC, e.vec_id ASC
    """,
)
def q_sim_range(spark, sf_dir):
    """Range (radius) similarity query: ALL vectors whose dot product
    with the query vector clears a threshold — the retrieval sibling of
    top-k where the result size is data-dependent (dedup candidates,
    recall-oriented retrieval). Same narrow-map shape as q_sim_topk
    (zip_with + aggregate, one broadcast 64-float query vector, no
    shuffle) but with a filter instead of TakeOrdered — embarrassingly
    parallel at any scale. Products stay float32 before the double
    accumulation (functions.vector.dot_product), matching the oracle's
    float×float→CAST(DOUBLE) exactly → bit-identical scores."""
    from self_healing_data_pipeline_spark.functions.vector import dot_product

    emb = read_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    qcol = F.array(*[F.lit(float(x)).cast("float") for x in qvec])
    return (
        emb.select(
            "vec_id", dot_product(F.col("embedding"), qcol).alias("score")
        )
        .filter(F.col("score") >= 0.25)
        .orderBy(F.desc("score"), F.asc("vec_id"))
    )
