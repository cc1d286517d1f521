"""Corpus-construction operators, round 3 (SURVEY.md §2.11): shard
packing, quality-filter routing, stopword profiling, vocabulary rank
tables, and sub-word token estimation — the remaining everyday ops of a
training-corpus build, each oracle-checked.

Scale notes (100 TB):
- shard packing runs its running sum PER LANGUAGE PARTITION (one shuffle
  on lang, linear scan per partition) — a single global running sum would
  serialize the corpus through one task, so the partitioned form is the
  only shape that survives scale;
- the quality funnel is a pure narrow map + 4-group aggregate (one scan,
  no shuffle before the final tiny agg);
- stopword/token queries explode to tokens but aggregate back to doc or
  vocab grain before anything shuffles — shuffle volume is O(docs) or
  O(vocab), never O(tokens).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

#: Chars per output shard (the packing budget).
_SHARD_CAP = 100_000

#: High-frequency pool tokens standing in for a stopword list.
_STOPWORDS = ("spark", "table", "query", "value", "line")


@query(
    "q_shard_assign",
    oracle=f"""
    WITH c AS (
      SELECT lang, doc_id, n_chars,
             SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum
      FROM documents
    )
    SELECT lang,
           CAST(FLOOR((cum - n_chars) / {_SHARD_CAP}.0) AS BIGINT)
             AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM c
    GROUP BY lang, shard_id
    ORDER BY lang, shard_id
    """,
)
def q_shard_assign(spark, sf_dir):
    """Shard packing: assign each document to a fixed-budget output shard
    (~100k chars) within its language, by running size over doc_id order
    — the deterministic "write the corpus as N similar-sized files per
    language" step of a corpus build. A document's shard is
    floor(start_offset / cap), so shards are contiguous id ranges and
    every shard except the last holds ≥ cap-minus-one-doc chars.

    One window (partition lang, order doc_id) = one shuffle on lang; the
    running sum is a linear per-partition scan. Packing WITHIN a
    partition key is the scale-safe form — a corpus-global running sum
    cannot parallelize."""
    d = read_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_chars").over(w) - F.col("n_chars")
    return (
        d.select(
            "lang",
            "n_chars",
            F.floor(start / float(_SHARD_CAP)).cast("bigint").alias("shard_id"),
        )
        .groupBy("lang", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("lang", "shard_id")
    )


@query(
    "q_quality_funnel",
    oracle="""
    WITH scored AS (
      SELECT n_chars,
             LEN(string_split(text, ' ')) AS n_tokens,
             CASE WHEN n_chars < 80 THEN 'too_short'
                  WHEN LEN(string_split(text, ' ')) < 15
                    THEN 'too_few_tokens'
                  WHEN CAST(n_chars AS DOUBLE)
                       / LEN(string_split(text, ' ')) > 5.8
                    THEN 'long_tokens'
                  ELSE 'pass' END AS route
      FROM documents
    )
    SELECT route, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM scored GROUP BY route ORDER BY route
    """,
)
def q_quality_funnel(spark, sf_dir):
    """Quality-filter funnel: every document routed by its FIRST failing
    rule (too short → too few tokens → over-long average token → pass),
    with per-route document and char counts — the cleaning report a
    corpus build emits so filter rules can be audited individually
    instead of as one opaque drop rate. First-match CASE semantics make
    the routes disjoint and exhaustive. Narrow map + 4-group aggregate:
    one scan, the only shuffle carries ≤4 rows per partition."""
    d = read_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    route = (
        F.when(F.col("n_chars") < 80, "too_short")
        .when(n_tokens < 15, "too_few_tokens")
        .when(F.col("n_chars").cast("double") / n_tokens > 5.8, "long_tokens")
        .otherwise("pass")
    )
    return (
        d.select(route.alias("route"), "n_chars")
        .groupBy("route")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("route")
    )


@query(
    "q_text_stopword_ratio",
    oracle=f"""
    SELECT doc_id,
           CAST(SUM(CASE WHEN tok IN {_STOPWORDS!r} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_stop,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN tok IN {_STOPWORDS!r} THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS stop_ratio
    FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
          FROM documents)
    WHERE tok <> ''
    GROUP BY doc_id
    """,
)
def q_text_stopword_ratio(spark, sf_dir):
    """Per-document stopword ratio against a fixed function-word list —
    a standard text-quality signal (too low = keyword spam / non-prose,
    too high = boilerplate). Explode + one hash aggregate keyed on
    doc_id with map-side partials; the ratio is a single IEEE division.
    The list is a literal IN predicate on both engines — no broadcast
    needed at any scale."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    is_stop = F.col("tok").isin(*_STOPWORDS).cast("int")
    return toks.groupBy("doc_id").agg(
        F.sum(is_stop).cast("bigint").alias("n_stop"),
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        (
            F.sum(is_stop).cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("stop_ratio"),
    )


@query(
    "q_text_zipf",
    oracle="""
    WITH tf AS (
      SELECT tok, COUNT(*) AS freq
      FROM (SELECT UNNEST(string_split(lower(text), ' ')) AS tok
            FROM documents)
      WHERE tok <> ''
      GROUP BY tok
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS BIGINT)
             AS rank,
           tok,
           CAST(freq AS BIGINT) AS freq
    FROM tf
    ORDER BY rank
    LIMIT 40
    """,
)
def q_text_zipf(spark, sf_dir):
    """Vocabulary rank table (the Zipf-curve head): the 40 most frequent
    tokens with their rank — the artifact vocabulary construction and
    stopword discovery read first. Token aggregation shuffles O(vocab)
    rows (map-side partials absorb the token stream); the top-40 is a
    TakeOrderedAndProject over vocab, and rank is a window over just
    those 40 rows — the global sort never touches more than the head.
    (freq DESC, tok) is a total order, so ranks are deterministic."""
    d = read_table(spark, sf_dir, "documents")
    tf = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    head = tf.orderBy(F.desc("freq"), F.asc("tok")).limit(40)
    w = Window.orderBy(F.desc("freq"), F.asc("tok"))
    return head.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        "tok",
        F.col("freq").cast("bigint").alias("freq"),
    ).orderBy("rank")


@query(
    "q_text_token_bpe",
    oracle="""
    SELECT doc_id,
           CAST(LEN(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))
                AS BIGINT) AS est_tokens,
           CAST(n_chars AS DOUBLE)
             / CAST(LEN(regexp_extract_all(lower(text),
                                           '[a-z]+|[0-9]+|[^a-z0-9 ]'))
                    AS DOUBLE) AS chars_per_token
    FROM documents
    """,
)
def q_text_token_bpe(spark, sf_dir):
    """Sub-word token estimation with a BPE-ish lexer regex (letter runs,
    digit runs, single other glyphs — the pre-tokenization split every
    BPE vocabulary starts from), plus the chars-per-token density used
    for context-budget planning. Pure JVM regexp_count in codegen — no
    UDF, no shuffle; the regex subset used has identical semantics in
    Java and RE2."""
    d = read_table(spark, sf_dir, "documents")
    est = F.regexp_count(
        F.lower("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]")
    ).cast("bigint")
    return d.select(
        "doc_id",
        est.alias("est_tokens"),
        (F.col("n_chars").cast("double") / est.cast("double")).alias(
            "chars_per_token"
        ),
    )


def _bpe_exact_oracle() -> str:
    from self_healing_data_pipeline_spark.operators.bpe import (
        bpe_wtok_ctes,
    )

    lexer = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    return f"""
    WITH RECURSIVE {bpe_wtok_ctes()}, doc_tok AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '{lexer}')) AS t
      FROM documents
    ), doc_counts AS (
      SELECT dt.doc_id,
             CAST(SUM(COALESCE(wt.n_tok, 1)) AS BIGINT) AS bpe_tokens
      FROM doc_tok dt LEFT JOIN wtok wt ON dt.t = wt.w
      GROUP BY dt.doc_id
    )
    SELECT d.doc_id,
           COALESCE(dc.bpe_tokens, 0) AS bpe_tokens,
           CAST(len(regexp_extract_all(lower(d.text), '{lexer}'))
                AS BIGINT) AS est_tokens,
           COALESCE(dc.bpe_tokens, 0)
             - CAST(len(regexp_extract_all(lower(d.text), '{lexer}'))
                    AS BIGINT) AS bpe_minus_est,
           COALESCE(dc.bpe_tokens, 0)
             >= CAST(len(regexp_extract_all(lower(d.text), '{lexer}'))
                     AS BIGINT) AS witness_ok
    FROM documents d LEFT JOIN doc_counts dc ON d.doc_id = dc.doc_id
    ORDER BY d.doc_id
    """


@query("q_text_token_bpe_exact", oracle=_bpe_exact_oracle())
def q_text_token_bpe_exact(spark, sf_dir):
    """EXACT subword token counts from a real learned BPE merge table
    (``operators/bpe.py`` — public Sennrich-2015 algorithm trained on
    the fixture corpus and frozen), with the lexer-regex estimate kept
    as an in-row witness: ``est_tokens`` uses the same pre-tokenizer
    split, so ``bpe_minus_est`` isolates pure subword splitting (rare
    words fragment; ``witness_ok`` asserts exact ≥ estimate per row,
    which greedy merging guarantees since a letter run is ≥ 1 token).

    Oracle-backed since round 9 (was rows-only): the DuckDB twin
    replays the greedy lowest-rank merge loop per DISTINCT word as a
    recursive CTE over the frozen merges
    (``operators.bpe.bpe_wtok_ctes``, shared with
    q_tokenizer_fertility's oracle and verified token-identical to the
    Python kernel on every fixture word), so the driver hash-verifies
    the per-document counts themselves. Arrow-batched pandas UDF with
    an in-batch word memo — per-row cost is per-DISTINCT-word in
    practice (Zipf), and nothing shuffles: one narrow projection over
    documents."""
    from pyspark.sql.functions import pandas_udf

    from self_healing_data_pipeline_spark.operators.bpe import (
        FROZEN_MERGES,
        bpe_token_counter,
    )

    counter = bpe_token_counter(FROZEN_MERGES)
    bpe_count = pandas_udf(counter, "bigint")
    d = read_table(spark, sf_dir, "documents")
    est = F.regexp_count(
        F.lower("text"), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]")
    ).cast("bigint")
    return (
        d.select(
            "doc_id",
            bpe_count(F.col("text")).alias("bpe_tokens"),
            est.alias("est_tokens"),
        )
        .withColumn("bpe_minus_est", F.col("bpe_tokens") - F.col("est_tokens"))
        .withColumn("witness_ok", F.col("bpe_minus_est") >= 0)
        .orderBy("doc_id")
    )
