"""Round-7 batch 57 (SURVEY.md §2.11 corpus policy): the FILTER
CASCADE report (per-stage survivor/attrition counts for the standard
quality-filter sequence — the pipeline-composition table every corpus
paper publishes, e.g. Gopher's and RefinedWeb's filter funnels) and
the TOKEN-BUDGET allocator (greedy source selection under a corpus
token budget, ranked by an exact integer quality proxy — the
"which feeds fit in this training run" decision).

Exactness: every filter verdict is an integer comparison or
cross-multiplication (no float thresholds anywhere: alpha and
word-length bands are cross-multiplied, the dedup stage is a
keep-first window on an md5 fingerprint), so the cascade counts are
engine-exact; the budget math is integer token sums with one ppm
integer division for the rank key."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.operators.dedup import (
    NORMALIZE_TEXT_SQL as _NORM,
    normalize_text,
)
from self_healing_data_pipeline_spark.operators.text import _STOPWORDS
from self_healing_data_pipeline_spark.queries.tier_c import (
    _langid_case_sql,
    _marker_counts_sql,
)
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

_STOP_PAT = r"\b(" + "|".join(_STOPWORDS) + r")\b"

#: Shared per-doc flag CTE (DuckDB side). Integer-only verdicts:
#: alpha >= 50% via 2*alpha >= len; mean word length in [3, 12] via
#: 3*n_toks <= n_chars <= 12*n_toks; dedup = keep-first per md5 of
#: normalized text. langid reuses q_text_langid's marker CASE.
_FLAGS_SQL = f"""
    base AS (
      SELECT doc_id, source, n_chars, text,
             {_NORM.format(c='text')} AS norm
      FROM documents
    ), scored AS (
      SELECT doc_id, source, n_chars, text, norm,
           {_marker_counts_sql()}
      FROM base
    ), flags AS (
      SELECT doc_id, source, MD5(norm) AS fp,
        (n_chars BETWEEN 100 AND 20000) AS pass_len,
        ({_langid_case_sql()} <> 'und') AS pass_lang,
        (2 * LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z]', '', 'g'))
           >= LENGTH(text)) AS pass_alpha,
        (3 * (LENGTH(norm) - LENGTH(REPLACE(norm, ' ', '')) + 1)
           <= n_chars
         AND n_chars
           <= 12 * (LENGTH(norm) - LENGTH(REPLACE(norm, ' ', '')) + 1))
          AS pass_wlen
      FROM scored
    )"""


@query(
    "q_filter_cascade",
    oracle=f"""
    WITH {_FLAGS_SQL},
    surv0 AS (
      SELECT doc_id, fp, pass_len, pass_lang, pass_alpha,
             pass_len AND pass_lang AND pass_alpha AND pass_wlen AS s4
      FROM flags
    ), surv AS (
      SELECT pass_len AS s1,
             pass_len AND pass_lang AS s2,
             pass_len AND pass_lang AND pass_alpha AS s3,
             s4,
             (s4 AND doc_id = MIN(CASE WHEN s4 THEN doc_id END)
                              OVER (PARTITION BY fp)) AS s5
      FROM surv0
    ), agg AS (
      SELECT COUNT(*) AS n0,
             SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS n1,
             SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS n2,
             SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS n3,
             SUM(CASE WHEN s4 THEN 1 ELSE 0 END) AS n4,
             SUM(CASE WHEN s5 THEN 1 ELSE 0 END) AS n5
      FROM surv
    )
    SELECT stage_idx, stage,
           CAST(n_in AS BIGINT) AS n_in,
           CAST(n_in - n_out AS BIGINT) AS n_dropped,
           CAST(n_out AS BIGINT) AS n_out,
           CASE WHEN n_in = 0 THEN 0.0
                ELSE CAST(n_in - n_out AS DOUBLE) / CAST(n_in AS DOUBLE)
           END AS drop_rate
    FROM (
      SELECT 1 AS stage_idx, 'length' AS stage, n0 AS n_in, n1 AS n_out
        FROM agg
      UNION ALL SELECT 2, 'langid', n1, n2 FROM agg
      UNION ALL SELECT 3, 'alpha', n2, n3 FROM agg
      UNION ALL SELECT 4, 'word_len', n3, n4 FROM agg
      UNION ALL SELECT 5, 'exact_dedup', n4, n5 FROM agg
    )
    ORDER BY stage_idx
    """,
)
def q_filter_cascade(spark, sf_dir):
    """FILTER CASCADE attrition report: the five standard corpus
    filters applied in sequence — length band, language-ID confidence,
    alphabetic ratio, mean-word-length band, exact dedup — with
    per-stage n_in / n_dropped / n_out / drop_rate. The table a data
    steward reads before changing any knob: it shows WHERE documents
    die, which q_text_quality's blended score (one number per doc)
    cannot.

    Every verdict is integer arithmetic (cross-multiplied bands; the
    dedup stage keeps the first SURVIVOR of the prior gates per md5
    fingerprint — true sequential semantics, a doc eliminated upstream
    cannot shadow a survivor), so counts are engine-exact; drop_rate
    is one final IEEE division of exact longs.

    Scale shape: one scan computes the four row-local gates (langid
    regex counts and ratios are JVM expressions); the only shuffle is
    the dedup fingerprint window carrying (fp, doc_id, s4) tuples —
    text never shuffles;
    the cascade collapses to ONE 1-row conditional aggregate, then a
    5-row literal unpivot. Stage k's input count is by construction
    the survivor count of stage k-1 — the sequence semantics, with no
    per-stage rescan."""
    from self_healing_data_pipeline_spark.operators.cascade import (
        cascade_flags,
    )

    docs = read_table(spark, sf_dir, "documents")
    # Shared gate logic (operators/cascade.py — also drives the
    # streaming funnel twin); the dedup stage below is the BATCH
    # resolution of first-survivor-per-fingerprint.
    flags = cascade_flags(docs)
    # Sequential dedup semantics: a doc passes the dedup stage iff it
    # is the FIRST SURVIVOR of the prior gates in its fingerprint group
    # — a doc eliminated upstream cannot shadow a survivor (keep-first
    # over all docs would misstate the funnel). One conditional-MIN
    # window on (fp, doc_id, s4) tuples; text never shuffles.
    wfp = Window.partitionBy("fp")
    s = flags.withColumn(
        "s5",
        F.col("s4")
        & (
            F.col("doc_id")
            == F.min(F.when(F.col("s4"), F.col("doc_id"))).over(wfp)
        ),
    ).select(
        "pass_len",
        (F.col("pass_len") & F.col("pass_lang")).alias("s2"),
        (F.col("pass_len") & F.col("pass_lang") & F.col("pass_alpha")).alias(
            "s3"
        ),
        "s4",
        "s5",
    )
    agg = s.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.col("pass_len").cast("int")).alias("n1"),
        F.sum(F.col("s2").cast("int")).alias("n2"),
        F.sum(F.col("s3").cast("int")).alias("n3"),
        F.sum(F.col("s4").cast("int")).alias("n4"),
        F.sum(F.col("s5").cast("int")).alias("n5"),
    )
    stages = agg.select(
        F.expr(
            "stack(5,"
            " 1, 'length', n0, n1,"
            " 2, 'langid', n1, n2,"
            " 3, 'alpha', n2, n3,"
            " 4, 'word_len', n3, n4,"
            " 5, 'exact_dedup', n4, n5"
            ") AS (stage_idx, stage, n_in, n_out)"
        )
    )
    return stages.select(
        "stage_idx",
        "stage",
        F.col("n_in").cast("bigint").alias("n_in"),
        (F.col("n_in") - F.col("n_out")).cast("bigint").alias("n_dropped"),
        F.col("n_out").cast("bigint").alias("n_out"),
        F.when(F.col("n_in") == 0, F.lit(0.0))
        .otherwise(
            (F.col("n_in") - F.col("n_out")).cast("double")
            / F.col("n_in").cast("double")
        )
        .alias("drop_rate"),
    ).orderBy("stage_idx")


@query(
    "q_token_budget",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source, {_NORM.format(c='text')} AS norm
      FROM documents
    ), per_doc AS (
      SELECT source,
             LENGTH(norm) - LENGTH(REPLACE(norm, ' ', '')) + 1 AS toks,
             LEN(REGEXP_EXTRACT_ALL(norm, '{_STOP_PAT}')) AS stop_hits
      FROM base
    ), per_source AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(toks) AS BIGINT) AS toks,
             CAST((1000000 * SUM(stop_hits)) // SUM(toks) AS BIGINT)
               AS quality_ppm
      FROM per_doc GROUP BY source
    ), ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (ORDER BY quality_ppm DESC, source)
               AS rank,
             SUM(toks) OVER (ORDER BY quality_ppm DESC, source
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cum_toks,
             SUM(toks) OVER () AS total_toks
      FROM per_source
    )
    SELECT source, CAST(rank AS BIGINT) AS rank, n_docs, toks,
           quality_ppm,
           CAST(cum_toks AS BIGINT) AS cum_toks,
           (cum_toks <= total_toks // 2) AS taken
    FROM ranked ORDER BY rank
    """,
)
def q_token_budget(spark, sf_dir):
    """TOKEN-BUDGET allocation: sources ranked by an exact integer
    quality proxy (stopword hits per million tokens — a fluency
    signal), greedily taken while the cumulative token count fits a
    50%-of-corpus budget. The "which feeds make the training run"
    decision as one deterministic table: rank, exact token counts,
    cumulative fill, and the taken verdict.

    Scale shape: one scan computes per-doc token/stopword integers
    (row-local regex counts), a source-grain partial aggregate
    collapses to ~|sources| rows, and the rank/cumulative windows run
    on that BOUNDED grain (10 rows here; a feed catalog is always
    metadata-sized — this is the legitimate SinglePartition case).
    Budget arithmetic is integer division throughout."""
    docs = read_table(spark, sf_dir, "documents")
    norm = normalize_text("text")
    n_toks = (
        F.length(norm) - F.length(F.regexp_replace(norm, " ", "")) + 1
    )
    stop_hits = F.regexp_count(norm, F.lit(_STOP_PAT))
    per_source = (
        docs.select(
            "source", n_toks.alias("toks"), stop_hits.alias("stop_hits")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("toks").cast("bigint").alias("toks"),
            F.expr("CAST(1000000 * SUM(stop_hits) DIV SUM(toks) AS BIGINT)")
            .alias("quality_ppm"),
        )
    )
    wrank = Window.orderBy(F.col("quality_ppm").desc(), F.col("source"))
    wcum = wrank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        per_source.withColumn("rank", F.row_number().over(wrank))
        .withColumn("cum_toks", F.sum("toks").over(wcum))
        .withColumn("total_toks", F.sum("toks").over(wall))
        .select(
            "source",
            F.col("rank").cast("bigint").alias("rank"),
            "n_docs",
            "toks",
            "quality_ppm",
            F.col("cum_toks").cast("bigint").alias("cum_toks"),
            (
                F.col("cum_toks")
                <= F.expr("total_toks DIV 2")
            ).alias("taken"),
        )
        .orderBy("rank")
    )
