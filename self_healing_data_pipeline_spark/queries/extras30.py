"""Round-6 batch 12 (SURVEY.md §2.11): KEYPHRASE EXTRACTION (RAKE —
stopword-delimited candidate phrases scored by word degree/frequency,
in an exact-integer variant) and an EMBEDDING-NORM AUDIT (data quality
for the vector column: norm distribution + malformed-vector verdicts —
the q_dq_* discipline applied to `array<float>`).

Reference scope: corpus keywording extends the text-analysis family
(TF-IDF keywords, collocations); the norm audit is the pre-flight
check every similarity/ANN pipeline runs before trusting cosine
scores (an unnormalized or NaN vector silently corrupts top-k)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.operators.dedup import (
    NORMALIZE_TEXT_SQL as _NORM_SQL,
    normalize_text,
)
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# Phrase delimiters for the fixture corpus (the domain function words —
# same role as English stopwords in classic RAKE; corpus_ops uses the
# same set for its stopword-ratio heuristic).
_RAKE_STOPS = ("spark", "table", "query", "value", "line")
_MAX_PHRASE = 4


@query(
    "q_text_keyphrase",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id, a, UNNEST(GENERATE_SERIES(1, LEN(a))) AS i
      FROM (SELECT doc_id, STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ')
              AS a FROM documents)
    ), toks AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos, a[CAST(i AS INT)] AS tok
      FROM raw WHERE LENGTH(a[CAST(i AS INT)]) > 0
    ), marked AS (
      SELECT doc_id, pos, tok,
             CASE WHEN tok IN {_RAKE_STOPS!r} THEN 1 ELSE 0 END AS is_stop,
             SUM(CASE WHEN tok IN {_RAKE_STOPS!r} THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS grp
      FROM toks
    ), pt AS (
      SELECT doc_id, grp, pos, tok FROM marked WHERE is_stop = 0
    ), phrases AS (
      SELECT doc_id, grp,
             STRING_AGG(tok, ' ' ORDER BY pos) AS phrase,
             CAST(COUNT(*) AS BIGINT) AS plen
      FROM pt GROUP BY 1, 2
      HAVING COUNT(*) BETWEEN 2 AND {_MAX_PHRASE}
    ), wp AS (
      SELECT pt.tok, p.doc_id, p.grp, p.phrase, p.plen
      FROM pt JOIN phrases p ON pt.doc_id = p.doc_id AND pt.grp = p.grp
    ), wstat AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(plen) AS BIGINT) AS deg
      FROM wp GROUP BY 1
    ), occ AS (
      SELECT wp.doc_id, wp.grp, wp.phrase,
             SUM(w.deg) AS deg_sum, SUM(w.freq) AS freq_sum
      FROM wp JOIN wstat w ON wp.tok = w.tok
      GROUP BY 1, 2, 3
    )
    SELECT phrase,
           CAST(COUNT(*) AS BIGINT) AS n_occ,
           CAST(MAX(deg_sum) AS BIGINT) AS deg_sum,
           CAST(MAX(freq_sum) AS BIGINT) AS freq_sum,
           CAST(MAX(deg_sum) * 1000000 // MAX(freq_sum) AS BIGINT)
             AS score_scaled
    FROM occ GROUP BY 1
    ORDER BY score_scaled DESC, phrase LIMIT 20
    """,
)
def q_text_keyphrase(spark, sf_dir):
    """KEYPHRASE EXTRACTION (RAKE, Rose 2010): candidate phrases are
    maximal stopword-free token runs (2–4 tokens); each word scores
    deg(w)/freq(w) over the phrase-word grain and a phrase scores the
    sum — here in the EXACT-INTEGER form Σdeg(w)·10⁶ // Σfreq(w)
    (summing exact integer degree and frequency masses before ONE
    floor division, instead of summing per-word float ratios whose
    addition order is engine-specific — the q_term_collocations
    discipline). Top-20 phrases with occurrence counts.

    Scale shape: one tokenize pass; the phrase-run grouping is a
    per-doc running count of stopwords (gaps-and-islands, partitioned
    by doc); word stats and phrase scores are counted-grain
    aggregates; phrases collapse map-side by text before the bounded
    TakeOrdered head. No SinglePartition."""
    docs = read_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(normalize_text(F.col("text")), " ")).alias(
                "pos", "tok"
            ),
        )
        .filter(F.length("tok") > 0)
        .withColumn("pos", (F.col("pos") + 1).cast("bigint"))
    )
    is_stop = F.col("tok").isin(*_RAKE_STOPS).cast("int")
    grp = F.sum(is_stop).over(
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = toks.select("doc_id", "pos", "tok", is_stop.alias("is_stop"), grp.alias("grp"))
    pt = marked.filter(F.col("is_stop") == 0).select("doc_id", "grp", "pos", "tok")
    phrases = (
        pt.groupBy("doc_id", "grp")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("tok")))
                    ),
                    lambda x: x.tok,
                ),
            ).alias("phrase"),
            F.count(F.lit(1)).cast("bigint").alias("plen"),
        )
        .filter(F.col("plen").between(2, _MAX_PHRASE))
    )
    wp = pt.join(phrases, ["doc_id", "grp"]).select(
        "tok", "doc_id", "grp", "phrase", "plen"
    )
    wstat = wp.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum("plen").cast("bigint").alias("deg"),
    )
    occ = (
        wp.join(wstat, "tok")
        .groupBy("doc_id", "grp", "phrase")
        .agg(
            F.sum("deg").alias("deg_sum"), F.sum("freq").alias("freq_sum")
        )
    )
    final = occ.groupBy("phrase").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occ"),
        F.max("deg_sum").cast("bigint").alias("deg_sum"),
        F.max("freq_sum").cast("bigint").alias("freq_sum"),
        (
            (
                F.max("deg_sum") * F.lit(1000000)
                - F.pmod(F.max("deg_sum") * F.lit(1000000), F.max("freq_sum"))
            )
            / F.max("freq_sum")
        )
        .cast("bigint")
        .alias("score_scaled"),
    )
    return final.orderBy(F.desc("score_scaled"), F.asc("phrase")).limit(20)


@query(
    "q_embedding_norm_audit",
    oracle="""
    WITH a AS (
      SELECT vec_id, embedding,
             LEN(embedding) AS dim,
             LEN(list_filter(embedding, x -> ISNAN(x))) AS n_nan
      FROM embeddings
    ), n AS (
      SELECT vec_id, dim, n_nan,
             CASE WHEN dim = 64 AND n_nan = 0 THEN
               (SELECT SUM(CAST(a.embedding[i] * a.embedding[i] AS DOUBLE))
                  FROM generate_series(1, 64) AS t(i))
             END AS n2
      FROM a
    ), banded AS (
      SELECT CASE WHEN dim <> 64 THEN -1
                  WHEN n_nan > 0 THEN -2
                  WHEN n2 = 0 THEN -3
                  ELSE CAST(FLOOR(n2 * 1000) AS BIGINT) END AS band,
             n2
      FROM n
    )
    SELECT CAST(band AS BIGINT) AS band,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           MIN(n2) AS min_norm2,
           MAX(n2) AS max_norm2
    FROM banded GROUP BY 1 ORDER BY 1
    """,
)
def q_embedding_norm_audit(spark, sf_dir):
    """EMBEDDING-NORM AUDIT — DQ for the vector column: every vector
    classifies into a squared-norm MILLIBAND (⌊‖x‖²·1000⌋) or a defect
    band (−1 wrong dimension, −2 non-finite components, −3 zero
    vector), with per-band counts and norm bounds. The pre-flight
    check before any cosine/ANN pipeline: unit-normalized corpora land
    in bands 999–1000; anything else is the bug report (an
    unnormalized vector silently reweights similarity; a NaN poisons
    every distance it touches).

    Determinism: ‖x‖² is the mirrored float32-product / float64-
    accumulate fold (identical doubles cross-engine), so the floor
    band matches bit-exactly; defect tests are integer/boolean.

    Scale shape: one narrow scan (fold + classify per row) collapsing
    to a bounded band rollup — embarrassingly parallel."""
    from self_healing_data_pipeline_spark.functions.vector import dot_product

    emb = read_table(spark, sf_dir, "embeddings")
    dim = F.size("embedding")
    n_nan = F.size(F.filter(F.col("embedding"), lambda x: F.isnan(x)))
    n2 = F.when(
        (dim == 64) & (n_nan == 0),
        dot_product(F.col("embedding"), F.col("embedding")),
    )
    band = (
        F.when(dim != 64, F.lit(-1))
        .when(n_nan > 0, F.lit(-2))
        .when(n2 == 0, F.lit(-3))
        .otherwise(F.floor(n2 * 1000))
        .cast("bigint")
    )
    return (
        emb.select(band.alias("band"), n2.alias("n2"))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.min("n2").alias("min_norm2"),
            F.max("n2").alias("max_norm2"),
        )
        .orderBy("band")
    )
