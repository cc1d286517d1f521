"""Round-5 batch 6 (SURVEY.md §2.11): the query side of the search
engine — phrase search through a POSITIONAL posting join, and posting-
list gap statistics (the delta-encoding compression diagnostic) —
composing with the ``q_inverted_index`` build step from `extras8`.

Scale discipline: the phrase plan touches only the two posting lists of
the phrase terms (filtered BEFORE the join, the classic phrase-query
plan), the gap windows partition by term, and the probe phrase itself
is the corpus's top bigram resolved from a bounded TakeOrdered + broadcast."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.operators.dedup import (
    NORMALIZE_TEXT_SQL as _NORM,
    normalize_text,
)
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# Corpus bigram counts (token stream pairs), shared by the phrase CTEs.
_BIGRAMS_SQL = f"""
    SELECT a[CAST(i AS INT)] AS w1, a[CAST(i AS INT) + 1] AS w2,
           COUNT(*) AS c
    FROM (
      SELECT doc_id, a, UNNEST(GENERATE_SERIES(1, LEN(a) - 1)) AS i
      FROM (
        SELECT doc_id, STRING_SPLIT({_NORM.format(c='text')}, ' ') AS a
        FROM documents
      )
    ) GROUP BY 1, 2
"""


@query(
    "q_phrase_search",
    oracle=f"""
    WITH bi AS ({_BIGRAMS_SQL}),
    top1 AS (
      SELECT w1, w2 FROM bi ORDER BY c DESC, w1 ASC, w2 ASC LIMIT 1
    ), occ AS (
      SELECT doc_id,
             a[CAST(i AS INT)] AS t1, a[CAST(i AS INT) + 1] AS t2
      FROM (
        SELECT doc_id, a, UNNEST(GENERATE_SERIES(1, LEN(a) - 1)) AS i
        FROM (
          SELECT doc_id, STRING_SPLIT({_NORM.format(c='text')}, ' ') AS a
          FROM documents
        )
      )
    )
    SELECT o.doc_id, t.w1, t.w2, CAST(COUNT(*) AS BIGINT) AS n_occ
    FROM occ o JOIN top1 t ON o.t1 = t.w1 AND o.t2 = t.w2
    GROUP BY o.doc_id, t.w1, t.w2
    ORDER BY o.doc_id
    """,
)
def q_phrase_search(spark, sf_dir):
    """PHRASE SEARCH through the positional index: find every document
    containing the corpus's most frequent bigram as a CONSECUTIVE
    phrase, with per-doc occurrence counts — the query-side op the
    ``q_inverted_index`` build exists for.

    Plan: the probe phrase resolves from the bigram rollup via a
    bounded TakeOrdered (deterministic c/w1/w2 tie-break) and
    BROADCASTS; the positional postings (doc, pos, term) filter to the
    two phrase terms BEFORE any join — the classic phrase plan: only
    the phrase terms' posting lists are intersected, on (doc, pos+1),
    never the full index. At 100 TB the filter prunes the posting
    grain to the phrase terms' df share; the join keys are (doc, pos)
    ints."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split(normalize_text("text"), " ")).alias("pos", "term")
    )
    bi = (
        toks.withColumn(
            "w2", F.lead("term").over(Window.partitionBy("doc_id").orderBy("pos"))
        )
        .where(F.col("w2").isNotNull())
        .groupBy(F.col("term").alias("w1"), "w2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top1 = (
        bi.orderBy(F.col("c").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(1)
        .select("w1", "w2")
    )
    t = toks.crossJoin(F.broadcast(top1))
    left = t.where(F.col("term") == F.col("w1")).select(
        "doc_id", "pos", "w1", "w2"
    )
    right = t.where(F.col("term") == F.col("w2")).select(
        F.col("doc_id").alias("d2"), F.col("pos").alias("pos2")
    )
    occ = left.join(
        right,
        (left.doc_id == right.d2) & (right.pos2 == left.pos + 1),
    )
    return (
        occ.groupBy("doc_id", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occ"))
        .orderBy("doc_id")
    )


@query(
    "q_posting_gaps",
    oracle=f"""
    WITH grain AS (
      SELECT DISTINCT term, doc_id FROM (
        SELECT doc_id,
               UNNEST(STRING_SPLIT({_NORM.format(c='text')}, ' ')) AS term
        FROM documents
      ) WHERE LENGTH(term) > 0
    ), gaps AS (
      SELECT term, doc_id,
             doc_id - LAG(doc_id) OVER
               (PARTITION BY term ORDER BY doc_id) AS gap
      FROM grain
    )
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS df,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc,
           CAST(MAX(gap) AS BIGINT) AS max_gap,
           CAST(MAX(doc_id) - MIN(doc_id) AS DOUBLE)
             / CAST(COUNT(*) - 1 AS DOUBLE) AS avg_gap
    FROM gaps GROUP BY term HAVING COUNT(*) >= 2
    ORDER BY term
    """,
)
def q_posting_gaps(spark, sf_dir):
    """Posting-list GAP statistics per term (df >= 2): max and average
    doc_id delta between consecutive postings — the compression
    diagnostic behind delta/varint posting encodings (small gaps =
    dense term = high compression; the avg gap is exactly
    (max-min)/(df-1), so only max_gap needs the ordered scan).

    Plan: the distinct (term, doc_id) grain gets ONE LAG window
    partitioned by term (the posting list's natural key — head-term
    skew is AQE-split, never global), then collapses to per-term
    stats in the same exchange. One IEEE division per term."""
    docs = read_table(spark, sf_dir, "documents")
    grain = (
        docs.select(
            "doc_id", F.explode(F.split(normalize_text("text"), " ")).alias("term")
        )
        .where(F.length("term") > 0)
        .select("term", "doc_id")
        .distinct()
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    gaps = grain.withColumn("gap", F.col("doc_id") - F.lag("doc_id").over(w))
    return (
        gaps.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.max("doc_id").cast("bigint").alias("max_doc"),
            F.max("gap").cast("bigint").alias("max_gap"),
            (
                (F.max("doc_id") - F.min("doc_id")).cast("double")
                / (F.count(F.lit(1)) - 1).cast("double")
            ).alias("avg_gap"),
        )
        .where(F.col("df") >= 2)
        .orderBy("term")
    )


@query(
    "q_term_collocations",
    oracle=f"""
    WITH bi AS ({_BIGRAMS_SQL}),
    uni AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS n1 FROM (
        SELECT UNNEST(STRING_SPLIT({_NORM.format(c='text')}, ' ')) AS term
        FROM documents
      ) WHERE LENGTH(term) > 0 GROUP BY term
    ), tot AS (
      SELECT CAST(SUM(n1) AS BIGINT) AS n FROM uni
    )
    SELECT b.w1, b.w2, CAST(b.c AS BIGINT) AS n_pair,
           u1.n1 AS n_w1, u2.n1 AS n_w2,
           CAST(CAST(b.c AS DECIMAL(38,0)) * (SELECT n FROM tot) AS DOUBLE)
             / CAST(CAST(u1.n1 AS DECIMAL(38,0)) * u2.n1 AS DOUBLE) AS lift
    FROM bi b
    JOIN uni u1 ON b.w1 = u1.term
    JOIN uni u2 ON b.w2 = u2.term
    WHERE b.c >= 5
    ORDER BY lift DESC, b.w1 ASC, b.w2 ASC
    LIMIT 50
    """,
)
def q_term_collocations(spark, sf_dir):
    """COLLOCATION mining: the corpus's most associated adjacent word
    pairs by LIFT — P(w1 w2) / (P(w1)·P(w2)), the exact-ratio form of
    pointwise mutual information (the log is monotone in the ratio, and
    natural-log last-ulp behavior is engine-specific, so the ratio IS
    the cross-engine-safe statistic). Minimum pair count 5 suppresses
    the unstable tail, exactly as collocation extractors do.

    Plan: one tokenize pass feeds BOTH the bigram grain (LEAD window
    per doc) and the unigram rollup; the unigram table joins back on
    each side of the pair key, the corpus total rides as a broadcast
    1-row scalar, and top-50 with the lift/w1/w2 tie-break chain is a
    bounded TakeOrdered. All masses exact integers; lift is one IEEE
    division of integer cross-products — carried in DECIMAL(38), since
    n_pair*N and head-word count products overflow int64 at web-corpus
    token counts (the q_feature_scale dsum discipline)."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(normalize_text("text"), " ")).alias("pos", "term"),
    )
    bi = (
        toks.withColumn(
            "w2", F.lead("term").over(Window.partitionBy("doc_id").orderBy("pos"))
        )
        .where(F.col("w2").isNotNull())
        .groupBy(F.col("term").alias("w1"), "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pair"))
        .where(F.col("n_pair") >= 5)
    )
    uni = (
        toks.where(F.length("term") > 0)
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n1"))
    )
    tot = uni.agg(F.sum("n1").cast("bigint").alias("n"))
    return (
        bi.join(uni.select(F.col("term").alias("w1"), F.col("n1").alias("n_w1")), "w1")
        .join(uni.select(F.col("term").alias("w2"), F.col("n1").alias("n_w2")), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "n_pair",
            "n_w1",
            "n_w2",
            (
                (F.col("n_pair").cast("decimal(38,0)") * F.col("n")).cast("double")
                / (F.col("n_w1").cast("decimal(38,0)") * F.col("n_w2")).cast(
                    "double"
                )
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(50)
    )
