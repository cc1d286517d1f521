"""Round-6 batch 52 (SURVEY.md §2.11 text / tokenizer ops): TOKENIZER
FERTILITY (chars-per-BPE-token by language, on the REAL learned merge
table — the number that decides whether a tokenizer is economical for
a language mix, and the standard multilingual-tokenizer comparison
stat) and STOPWORD DISCOVERY (data-driven stopword candidates from
document-frequency share + Church-Gale burstiness — the generated
list that replaces a hand-curated one for unseen domains).

Fertility is rows-only by design (greedy BPE is not ANSI-SQL) with
two in-row witnesses; stopword discovery is fully oracle-backed
exact-integer evidence."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# Stopword candidacy: appears in > 1/2 of docs AND per-doc counts are
# not bursty (VMR < 2) — evenly spread, high-coverage words. Exact
# integer cross-multiplications; VMR from integer raw moments.
_DF_NUM, _DF_DEN = 1, 2
_VMR_MAX = 2


# Greedy BPE IS expressible in SQL once the merge table is frozen —
# the recursive-CTE replay of encode_word lives in
# operators.bpe.bpe_wtok_ctes() (shared with the
# q_text_token_bpe_exact oracle since the round-9 promotion of both).
from self_healing_data_pipeline_spark.operators.bpe import bpe_wtok_ctes

_FERTILITY_ORACLE = f"""
WITH RECURSIVE {bpe_wtok_ctes()}, doc_tok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text),
                '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS t
  FROM documents
), doc_counts AS (
  -- digit runs / punctuation never collide with the letter-only word
  -- table, so COALESCE(n_tok, 1) is exactly the kernel's "1 token
  -- unless a letter run" rule
  SELECT dt.doc_id, CAST(SUM(COALESCE(wt.n_tok, 1)) AS BIGINT) AS n_tokens
  FROM doc_tok dt LEFT JOIN wtok wt ON dt.t = wt.w
  GROUP BY dt.doc_id
), base AS (
  SELECT d.lang,
         CAST(LENGTH(d.text) AS BIGINT) AS n_chars,
         COALESCE(dc.n_tokens, 0) AS n_tokens,
         CAST(len(regexp_split_to_array(TRIM(d.text), '\\s+'))
              AS BIGINT) AS n_words
  FROM documents d LEFT JOIN doc_counts dc ON d.doc_id = dc.doc_id
), agg AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         CAST(SUM(n_words) AS BIGINT) AS total_words
  FROM base GROUP BY lang
)
SELECT lang, n_docs, total_chars, total_tokens, total_words,
       CAST(total_chars AS DOUBLE) / CAST(total_tokens AS DOUBLE)
         AS chars_per_token,
       CAST(total_tokens AS DOUBLE) / CAST(total_words AS DOUBLE)
         AS tokens_per_word,
       (CAST(total_chars AS DOUBLE) / CAST(total_tokens AS DOUBLE) > 0
        AND CAST(total_chars AS DOUBLE) / CAST(total_tokens AS DOUBLE) <= 40
        AND total_tokens >= total_words) AS witness_ok
FROM agg ORDER BY lang
"""


@query(
    "q_tokenizer_fertility",
    # Oracle-backed since round 9 (was rows-only; round-8 verdict task
    # #4): with the merge table frozen, greedy BPE is deterministic
    # arithmetic — the oracle replays encode_word per distinct word in
    # a recursive CTE (verified token-identical to the Python kernel on
    # every fixture word) and the driver hash-verifies the fertility
    # numbers themselves.
    oracle=_FERTILITY_ORACLE,
)
def q_tokenizer_fertility(spark, sf_dir):
    """TOKENIZER FERTILITY by language: characters per BPE token under
    the frozen learned merge table (`operators/bpe.py`) — the
    efficiency stat (GPT-style tokenizers report ~4 chars/token for
    English; a language far below the corpus average is being
    fragmented and will pay more context budget per sentence). Also
    reports tokens-per-whitespace-word (subword fan-out).

    Oracle-backed since round 9: the DuckDB twin replays the greedy
    lowest-rank merge loop per DISTINCT word as a recursive CTE over
    the frozen merge table, so exact token counts — not just bounds —
    cross the hash gate. In-row witnesses kept: fertility in (0, 40]
    and BPE tokens ≥ whitespace words (greedy merging can't cross the
    pre-tokenizer split). Scale shape: the Arrow-batched BPE kernel
    (in-batch word memo — per-DISTINCT-word cost under Zipf) runs in
    one narrow projection; everything after is a lang-grain exact-
    integer aggregate. Nothing shuffles document text."""
    from pyspark.sql.functions import pandas_udf

    from self_healing_data_pipeline_spark.operators.bpe import (
        FROZEN_MERGES,
        bpe_token_counter,
    )

    counter = bpe_token_counter(FROZEN_MERGES)
    bpe_count = pandas_udf(counter, "bigint")
    d = read_table(spark, sf_dir, "documents")
    words = F.size(F.split(F.trim("text"), r"\s+")).cast("bigint")
    per_doc = d.select(
        "lang",
        F.length("text").cast("bigint").alias("n_chars"),
        bpe_count(F.col("text")).alias("n_tokens"),
        words.alias("n_words"),
    )
    agg = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("n_words").cast("bigint").alias("total_words"),
    )
    fertility = F.col("total_chars").cast("double") / F.col(
        "total_tokens"
    ).cast("double")
    fanout = F.col("total_tokens").cast("double") / F.col(
        "total_words"
    ).cast("double")
    return (
        agg.select(
            "lang",
            "n_docs",
            "total_chars",
            "total_tokens",
            "total_words",
            fertility.alias("chars_per_token"),
            fanout.alias("tokens_per_word"),
            (
                (fertility > 0)
                & (fertility <= 40)
                & (F.col("total_tokens") >= F.col("total_words"))
            ).alias("witness_ok"),
        )
        .orderBy("lang")
    )


@query(
    "q_stopword_discovery",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text),
                    '[^a-z0-9]+', ' ', 'g')), ' ')) AS w
      FROM documents
    ), n AS (
      SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM toks
    ), per_doc AS (
      SELECT w, doc_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY 1, 2
    ), moments AS (
      SELECT w,
             CAST(SUM(c) AS BIGINT) AS s1,
             CAST(SUM(c * c) AS BIGINT) AS s2,
             CAST(COUNT(*) AS BIGINT) AS df
      FROM per_doc GROUP BY 1
    )
    SELECT w AS word, df AS n_docs_with, s1 AS n_occurrences,
           CAST(df AS DOUBLE) / CAST(n.n_docs AS DOUBLE) AS df_share,
           (CAST(s2 AS DOUBLE) / CAST(n.n_docs AS DOUBLE)
            - (CAST(s1 AS DOUBLE) / CAST(n.n_docs AS DOUBLE))
              * (CAST(s1 AS DOUBLE) / CAST(n.n_docs AS DOUBLE)))
           / (CAST(s1 AS DOUBLE) / CAST(n.n_docs AS DOUBLE)) AS burstiness
    FROM moments CROSS JOIN n
    WHERE {_DF_DEN} * df > {_DF_NUM} * n.n_docs
      AND n.n_docs * s2 - s1 * s1 < {_VMR_MAX} * n.n_docs * s1
    ORDER BY word
    """,
)
def q_stopword_discovery(spark, sf_dir):
    """STOPWORD DISCOVERY: words present in more than half of all
    documents whose per-document counts scatter like noise (VMR < 2 —
    evenly spread, not topical) — the data-driven stopword list for a
    domain with no curated one, feeding q_text_stopword_ratio /
    TF-IDF pruning. BOTH filters are exact integer
    cross-multiplications: 2·df > n and n·Σc² − (Σc)² < 2·n·Σc (the
    VMR < 2 inequality multiplied out — no float ever enters a
    predicate, so membership is engine-exact); the reported df_share
    and burstiness are display-only float chains.

    Scale shape: the q_word_burstiness moment pipeline (token explode
    → (word, doc) grain → word-grain integer raw moments) with the
    scalar N broadcast; output bounded by the vocabulary head that
    passes the df filter."""
    from self_healing_data_pipeline_spark.operators.dedup import normalize_text

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(normalize_text("text"), " ")).alias("w"),
    )
    n = toks.agg(F.countDistinct("doc_id").cast("bigint").alias("n_docs"))
    per_doc = toks.groupBy("w", "doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    moments = per_doc.groupBy("w").agg(
        F.sum("c").cast("bigint").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
        F.count(F.lit(1)).cast("bigint").alias("df"),
    )
    mean = F.col("s1").cast("double") / F.col("n_docs").cast("double")
    ex2 = F.col("s2").cast("double") / F.col("n_docs").cast("double")
    return (
        moments.crossJoin(F.broadcast(n))
        .where(
            (F.lit(_DF_DEN) * F.col("df") > F.lit(_DF_NUM) * F.col("n_docs"))
            & (
                F.col("n_docs") * F.col("s2") - F.col("s1") * F.col("s1")
                < F.lit(_VMR_MAX) * F.col("n_docs") * F.col("s1")
            )
        )
        .select(
            F.col("w").alias("word"),
            F.col("df").alias("n_docs_with"),
            F.col("s1").alias("n_occurrences"),
            (F.col("df").cast("double") / F.col("n_docs").cast("double")).alias(
                "df_share"
            ),
            ((ex2 - mean * mean) / mean).alias("burstiness"),
        )
        .orderBy("word")
    )
