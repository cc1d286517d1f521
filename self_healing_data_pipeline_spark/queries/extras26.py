"""Round-6 batch 8 (SURVEY.md §2.11): RETRIEVAL-STACK scoring — BM25
full-text relevance over the tokenized corpus (the ranking function
behind every lexical search engine) and RECIPROCAL-RANK FUSION of two
exact vector rankers (the standard hybrid-search combiner).

Completes the search story beside the structural ops (inverted index,
phrase query, posting gaps): build the index → score with BM25 →
fuse lexical/vector rankings."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.operators.dedup import (
    NORMALIZE_TEXT_SQL as _NORM_SQL,
)
from self_healing_data_pipeline_spark.operators.text import tokens
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# Fixed two-term query (both mid-df corpus terms) and the standard
# Robertson parameters. The IDF is the EXACT-RATIO form
# (N - df + 0.5)/(df + 0.5) rather than its logarithm: log(1+x) is
# monotone, so the PER-TERM ranking is identical, and the ratio is a
# chain of mirrored IEEE ops both engines compute bit-identically,
# while ln's last ulp is engine-specific (the q_term_collocations
# lift-vs-PMI precedent; production note: swap in F.log1p and accept
# oracle-tolerance instead of bit-equality if true log-BM25 is wanted).
_BM25_TERMS = ("join", "filter")
_K1 = 1.2
_B = 0.75


@query(
    "q_text_bm25",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, UNNEST(STRING_SPLIT({_NORM_SQL.format(c='text')}, ' '))
               AS token
      FROM documents
    ), toks2 AS (
      SELECT * FROM toks WHERE LENGTH(token) > 0
    ), dl AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks2 GROUP BY 1
    ), stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS total_tokens
      FROM dl
    ), tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM toks2
      WHERE token IN ('{_BM25_TERMS[0]}', '{_BM25_TERMS[1]}') GROUP BY 1, 2
    ), df AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ), term_scores AS (
      SELECT t.doc_id, t.token, t.tf,
             ((CAST(s.n_docs - d.df AS DOUBLE) + 0.5)
              / (CAST(d.df AS DOUBLE) + 0.5))
             * ((CAST(t.tf AS DOUBLE) * {1.0 + _K1})
                / (CAST(t.tf AS DOUBLE)
                   + {_K1} * ({1.0 - _B} + {_B}
                      * (CAST(l.dl AS DOUBLE)
                         / (CAST(s.total_tokens AS DOUBLE)
                            / CAST(s.n_docs AS DOUBLE)))))) AS sc
      FROM tf t
      JOIN dl l ON t.doc_id = l.doc_id
      JOIN df d ON t.token = d.token, stats s
    ), agg AS (
      SELECT doc_id,
             COALESCE(MAX(CASE WHEN token = '{_BM25_TERMS[0]}' THEN sc END),
                      CAST(0 AS DOUBLE))
             + COALESCE(MAX(CASE WHEN token = '{_BM25_TERMS[1]}' THEN sc END),
                        CAST(0 AS DOUBLE)) AS score,
             CAST(COALESCE(MAX(CASE WHEN token = '{_BM25_TERMS[0]}'
                                    THEN tf END), 0) AS BIGINT) AS tf_a,
             CAST(COALESCE(MAX(CASE WHEN token = '{_BM25_TERMS[1]}'
                                    THEN tf END), 0) AS BIGINT) AS tf_b
      FROM term_scores GROUP BY doc_id
    )
    SELECT doc_id, tf_a, tf_b, score FROM agg
    ORDER BY score DESC, doc_id LIMIT 15
    """,
)
def q_text_bm25(spark, sf_dir):
    """BM25 relevance ranking for a two-term query (k1=1.2, b=0.75,
    exact-ratio IDF — see module constants): the lexical-search scoring
    function computed corpus-wide from one tokenize pass.

    Determinism: every factor is a mirrored chain of IEEE ops on exact
    integer inputs (tf, dl, df, N, Σdl) — identical operand order on
    both engines → bit-identical doubles; the two term scores combine
    with ONE addition. Top-15 carries the (score, doc_id) total order.

    Scale shape: the token stream aggregates keyed by doc (lengths)
    and (doc, term) (frequencies — term-filtered to the query, so this
    branch is query-bounded); df reduces from the tf grain; the corpus
    stats are a broadcast 1-row scalar. Only docs containing a query
    term reach the scoring join (inner on tf). TakeOrderedAndProject
    for the head — no global sort."""
    docs = read_table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
        .filter(F.length("token") > 0)
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_tokens"),
    )
    tf = (
        toks.filter(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("df"))

    avgdl = F.col("total_tokens").cast("double") / F.col("n_docs").cast("double")
    idf = (
        (F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)
    ) / (F.col("df").cast("double") + F.lit(0.5))
    tf_part = (F.col("tf").cast("double") * F.lit(1.0 + _K1)) / (
        F.col("tf").cast("double")
        + F.lit(_K1)
        * (F.lit(1.0 - _B) + F.lit(_B) * (F.col("dl").cast("double") / avgdl))
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(stats))
        .withColumn("sc", idf * tf_part)
    )
    zero = F.lit(0).cast("double")
    return (
        scored.groupBy("doc_id")
        .agg(
            (
                F.coalesce(
                    F.max(F.when(F.col("token") == _BM25_TERMS[0], F.col("sc"))),
                    zero,
                )
                + F.coalesce(
                    F.max(F.when(F.col("token") == _BM25_TERMS[1], F.col("sc"))),
                    zero,
                )
            ).alias("score"),
            F.coalesce(
                F.max(F.when(F.col("token") == _BM25_TERMS[0], F.col("tf"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tf_a"),
            F.coalesce(
                F.max(F.when(F.col("token") == _BM25_TERMS[1], F.col("tf"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tf_b"),
        )
        .select("doc_id", "tf_a", "tf_b", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(15)
    )


@query(
    "q_rrf_fusion",
    oracle="""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    ip AS (
      SELECT e.vec_id,
             (SELECT SUM(CAST(e.embedding[i] * q.qv[i] AS DOUBLE))
                FROM generate_series(1, 64) AS t(i)) AS s
      FROM embeddings e, q
    ), ipr AS (
      SELECT vec_id, r FROM (
        SELECT vec_id,
               ROW_NUMBER() OVER (ORDER BY s DESC, vec_id) AS r
        FROM ip
      ) WHERE r <= 20
    ), l2 AS (
      SELECT e.vec_id,
             (SELECT SUM(CAST((e.embedding[i] - q.qv[i])
                              * (e.embedding[i] - q.qv[i]) AS DOUBLE))
                FROM generate_series(1, 64) AS t(i)) AS d
      FROM embeddings e, q
    ), l2r AS (
      SELECT vec_id, r FROM (
        SELECT vec_id,
               ROW_NUMBER() OVER (ORDER BY d ASC, vec_id) AS r
        FROM l2
      ) WHERE r <= 20
    ), fused AS (
      SELECT COALESCE(a.vec_id, b.vec_id) AS vec_id,
             CAST(a.r AS BIGINT) AS rank_ip,
             CAST(b.r AS BIGINT) AS rank_l2,
             COALESCE(CAST(1.0 AS DOUBLE) / (60 + a.r), CAST(0 AS DOUBLE))
             + COALESCE(CAST(1.0 AS DOUBLE) / (60 + b.r), CAST(0 AS DOUBLE))
               AS rrf
      FROM ipr a FULL OUTER JOIN l2r b ON a.vec_id = b.vec_id
    )
    SELECT vec_id, rank_ip, rank_l2, rrf FROM fused
    ORDER BY rrf DESC, vec_id LIMIT 10
    """,
)
def q_rrf_fusion(spark, sf_dir):
    """RECIPROCAL-RANK FUSION (k=60) of two exact vector rankers —
    inner-product and L2 distance against the vec_id=0 query — the
    standard hybrid-search combiner (Cormack 2009): rrf(d) =
    Σ 1/(60 + rank_i(d)) over the rankers that returned d in their
    top-20.

    Determinism: both rankers are mirrored float32-product /
    float64-accumulate folds (the q_sim_topk convention); ranks are
    integers, each reciprocal is one IEEE division, and the fuse is
    ONE addition — bit-exact cross-engine.

    Scale shape: each ranker is a narrow broadcast-query scan ending
    in TakeOrderedAndProject (k rows; no global sort); ranking within
    a shortlist is a window over k=20 rows — a BOUNDED SinglePartition
    (constant size, independent of corpus scale), the same class as
    broadcast scalar frames. The full-outer fuse joins two 20-row
    frames. At 100 TB only the two ranker scans touch data."""
    from self_healing_data_pipeline_spark.functions.vector import dot_product

    emb = read_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    qcol = F.array(*[F.lit(float(x)).cast("float") for x in qvec])

    ip = emb.select(
        "vec_id", dot_product(F.col("embedding"), qcol).alias("s")
    )
    ip_top = ip.orderBy(F.desc("s"), F.asc("vec_id")).limit(20)
    ipr = ip_top.select(
        "vec_id",
        F.row_number()
        .over(Window.orderBy(F.desc("s"), F.asc("vec_id")))
        .cast("bigint")
        .alias("rank_ip"),
    )

    diff_sq = F.aggregate(
        F.zip_with(F.col("embedding"), qcol, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double"),
    )
    l2 = emb.select("vec_id", diff_sq.alias("d"))
    l2_top = l2.orderBy(F.asc("d"), F.asc("vec_id")).limit(20)
    l2r = l2_top.select(
        "vec_id",
        F.row_number()
        .over(Window.orderBy(F.asc("d"), F.asc("vec_id")))
        .cast("bigint")
        .alias("rank_l2"),
    )

    zero = F.lit(0).cast("double")
    fused = (
        ipr.join(l2r, "vec_id", "full_outer")
        .select(
            "vec_id",
            "rank_ip",
            "rank_l2",
            (
                F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("rank_ip")), zero)
                + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("rank_l2")), zero)
            ).alias("rrf"),
        )
    )
    return fused.orderBy(F.desc("rrf"), F.asc("vec_id")).limit(10)
