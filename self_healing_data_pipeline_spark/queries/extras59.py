"""Round-6 batch 42 (SURVEY.md §2.11 dedup / storage ops): CONTAINMENT
DEDUP (directional |A∩B|/|A| over word-shingle sets — catches a doc
QUOTED OR EMBEDDED inside a larger one, which symmetric Jaccard misses
because the union is dominated by the container) and SHARED-SUBSTRING
DICTIONARY CANDIDATES (the top repeated 16-char grams across the
corpus — what a zstd-style dictionary trainer samples; pairs with
q_encoding_advisor / q_compaction_bins as the storage-layout suite).

Exactness: shingle intersections and gram counts are exact integers;
the containment ratio and savings estimate are final divisions /
products of exact counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.operators.dedup import (
    NORMALIZE_TEXT_SQL as _NORM,
)
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

_SHINGLE5_SQL = f"""
    SELECT DISTINCT doc_id,
           ARRAY_TO_STRING(a[CAST(i AS INT):CAST(i AS INT) + 4], ' ') AS sh
    FROM (
      SELECT doc_id, a,
             UNNEST(GENERATE_SERIES(1, GREATEST(LEN(a) - 4, 1))) AS i
      FROM (
        SELECT doc_id, STRING_SPLIT({_NORM.format(c='text')}, ' ') AS a
        FROM documents
      )
    )
"""

_GRAM_LEN = 16
_GRAM_STRIDE = 8
_DICT_TOP = 50


@query(
    "q_dedup_containment",
    oracle=f"""
    WITH sh AS ({_SHINGLE5_SQL}),
    sz AS (SELECT doc_id, COUNT(*) AS s FROM sh GROUP BY doc_id),
    inter AS (
      SELECT x.doc_id AS contained_id, y.doc_id AS container_id,
             COUNT(*) AS i
      FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id <> y.doc_id
      GROUP BY 1, 2
    )
    SELECT contained_id, container_id,
           CAST(i AS BIGINT) AS n_shared,
           CAST(sa.s AS BIGINT) AS n_contained,
           CAST(sb.s AS BIGINT) AS n_container,
           CAST(i AS DOUBLE) / sa.s AS containment
    FROM inter
    JOIN sz sa ON contained_id = sa.doc_id
    JOIN sz sb ON container_id = sb.doc_id
    WHERE 5 * i >= 4 * sa.s
    ORDER BY contained_id, container_id
    """,
)
def q_dedup_containment(spark, sf_dir):
    """DIRECTIONAL CONTAINMENT >= 0.8 pairs over word-5-gram shingle
    sets: |A∩B| / |A| — the sub-document detector. A short doc pasted
    into a long one scores containment ≈ 1 while its Jaccard can be
    arbitrarily low (union grows with the container), so this is the
    dedup pass that catches quotes, boilerplate embeddings, and
    train-on-test paste-ins that q_dedup_jaccard_prefix's symmetric
    threshold structurally cannot.

    Candidates never go all-pairs: the ASYMMETRIC prefix filter
    (PPJoin containment variant) keeps only each doc's s −
    ceil(0.8·s) + 1 rarest shingles (exact-integer ceil, rare-first
    (df, sh) order) on the CONTAINED side — if containment ≥ 0.8, at
    least one prefix shingle must appear in the container — and joins
    them against the full posting list, whose fan-out is bounded by
    the document frequency of a doc's RAREST shingles (small by
    construction of the order). Verification fetches the two shingle
    arrays and checks 5·|A∩B| ≥ 4·|A| in exact integers. The oracle
    is the complete shared-shingle formulation over ALL ordered
    pairs — equality proves the prefix filter lost nothing."""
    from self_healing_data_pipeline_spark.operators.dedup import prefix_rows
    from self_healing_data_pipeline_spark.operators.shingle_pass import (
        shingle_frames,
    )

    docs = read_table(spark, sf_dir, "documents")
    # Shared shingle prep from ONE materialized pass (round-12 plan
    # audit: the independent grain/exploded/sets calls re-ran the
    # normalize+shingle chain 4x — see shingle_frames): the contained
    # side keeps its 0.8-threshold prefix; the container side is the
    # FULL posting list (asymmetric PPJoin containment variant).
    sh, grain, sets = shingle_frames(docs)
    prefix = prefix_rows(grain, 4, 5)
    post = sh.select(F.col("doc_id").alias("d2"), F.col("sh").alias("sh2"))
    cand = (
        prefix.join(post, (prefix.sh == post.sh2) & (prefix.doc_id != post.d2))
        .select(F.col("doc_id").alias("contained_id"), F.col("d2").alias("container_id"))
        .distinct()
    )
    return (
        cand.join(
            sets.select(
                F.col("doc_id").alias("contained_id"), F.col("shs").alias("a")
            ),
            "contained_id",
        )
        .join(
            sets.select(
                F.col("doc_id").alias("container_id"), F.col("shs").alias("b")
            ),
            "container_id",
        )
        .select(
            "contained_id",
            "container_id",
            F.size(F.array_intersect("a", "b")).cast("bigint").alias("n_shared"),
            F.size("a").cast("bigint").alias("n_contained"),
            F.size("b").cast("bigint").alias("n_container"),
        )
        .where(F.lit(5) * F.col("n_shared") >= F.lit(4) * F.col("n_contained"))
        .select(
            "contained_id",
            "container_id",
            "n_shared",
            "n_contained",
            "n_container",
            (
                F.col("n_shared").cast("double") / F.col("n_contained")
            ).alias("containment"),
        )
        .orderBy("contained_id", "container_id")
    )


@query(
    "q_dict_candidates",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_NORM.format(c='text')} AS nt FROM documents
    ), g AS (
      SELECT doc_id, SUBSTR(nt, CAST(i AS INT), {_GRAM_LEN}) AS gram
      FROM (
        SELECT doc_id, nt,
               UNNEST(GENERATE_SERIES(
                 1, LEN(nt) - {_GRAM_LEN - 1}, {_GRAM_STRIDE})) AS i
        FROM t WHERE LEN(nt) >= {_GRAM_LEN}
      )
    )
    SELECT gram,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST((COUNT(*) - 1) * {_GRAM_LEN - 2} AS BIGINT) AS est_savings
    FROM g GROUP BY gram HAVING COUNT(*) >= 2
    ORDER BY est_savings DESC, gram LIMIT {_DICT_TOP}
    """,
)
def q_dict_candidates(spark, sf_dir):
    """SHARED-SUBSTRING DICTIONARY CANDIDATES: the top-50 repeated
    16-char grams (sampled at stride 8, the aligned sampling a
    zstd-style dictionary trainer uses) across the normalized corpus,
    scored by the standard savings model (occurrences−1) · (len −
    ref_cost) — the shortlist a column-store hands its dictionary
    builder before compressing a string column, and the corpus-level
    complement of q_encoding_advisor's page-local run statistics.

    Scale shape: grams come from the shared LINEAR span extractor
    (`operators.text.strided_spans` — round-10 class audit: the
    earlier `transform(sequence(...), i -> substring(nt, i, 16))` form
    was the q_doc_chunks quadratic on long documents, O(pos) per gram
    from substring's UTF-8 walk), one gram-grain partial-aggregated
    count (shuffle carries the 16-char gram, never documents), HAVING
    ≥2 prunes the singleton long tail before ranking, and the top-50
    is a TakeOrderedAndProject with the gram itself as tie-break."""
    docs = read_table(spark, sf_dir, "documents")
    from self_healing_data_pipeline_spark.operators.dedup import normalize_text
    from self_healing_data_pipeline_spark.operators.text import strided_spans

    t = docs.select("doc_id", normalize_text("text").alias("nt")).where(
        F.length("nt") >= _GRAM_LEN
    )
    g = strided_spans(
        t, "doc_id", F.col("nt"), _GRAM_LEN, _GRAM_STRIDE, out_col="gram"
    ).select("doc_id", "gram")
    return (
        g.groupBy("gram")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        )
        .where(F.col("n_occurrences") >= 2)
        .select(
            "gram",
            "n_occurrences",
            "n_docs",
            ((F.col("n_occurrences") - 1) * (_GRAM_LEN - 2))
            .cast("bigint")
            .alias("est_savings"),
        )
        .orderBy(F.col("est_savings").desc(), "gram")
        .limit(_DICT_TOP)
    )
