"""Round-10 batch 73 (SURVEY.md §2.8 string surface — Postgres-parity
stragglers): two string-matching features of the reference's delegated
SQL engine (`APP/services/pgliteService.ts:36-49`) that predate any
registered key:

- **q_split_part** — Postgres/DuckDB/Spark all ship ``split_part``
  with the same 1-based contract, including the two edge semantics a
  port actually trips on: an index past the last field returns the
  EMPTY STRING (not NULL), and a NEGATIVE index counts from the end.
  Both edges are exercised in the hash-gated columns.
- **q_ilike_similar** — case-insensitive LIKE (``ILIKE``) and SQL
  ``SIMILAR TO``. Spark parses ILIKE natively; it has no SIMILAR TO,
  so the engine side is the canonical rewrite ``rlike '^(...)$'``
  (SIMILAR TO implicitly anchors BOTH ends — the bug magnet of every
  SIMILAR TO port; the oracle runs DuckDB's native SIMILAR TO, so the
  anchoring rewrite is proven against real semantics, the
  q_window_agg_filter discipline). Patterns stick to the regex
  subset shared by SQL SIMILAR TO and Java regex (alternation,
  ``%`` → ``.*``), documented inline.

Both are narrow per-row maps — no shuffle but the driver-compare sort.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_split_part",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             source || '/' || lang || '/doc_' || CAST(doc_id AS VARCHAR)
               AS path
      FROM documents
    )
    SELECT doc_id, path,
           SPLIT_PART(path, '/', 1) AS part_source,
           SPLIT_PART(path, '/', 2) AS part_lang,
           SPLIT_PART(path, '/', 3) AS part_leaf,
           SPLIT_PART(path, '/', 9) AS part_past_end,
           SPLIT_PART(path, '/', -1) AS part_last
    FROM p ORDER BY doc_id
    """,
)
def q_split_part(spark, sf_dir):
    """``split_part`` over a per-doc storage path — field extraction
    with the full cross-engine contract: 1-based fields, empty string
    (never NULL) past the last field, negative index from the end.
    Same function name and semantics in Spark, DuckDB, and Postgres,
    so the SQL text is effectively shared. One narrow projection."""
    d = read_table(spark, sf_dir, "documents")
    path = F.concat(
        F.col("source"),
        F.lit("/"),
        F.col("lang"),
        F.lit("/doc_"),
        F.col("doc_id").cast("string"),
    )
    return (
        d.select(
            "doc_id",
            path.alias("path"),
            F.split_part(path, F.lit("/"), F.lit(1)).alias("part_source"),
            F.split_part(path, F.lit("/"), F.lit(2)).alias("part_lang"),
            F.split_part(path, F.lit("/"), F.lit(3)).alias("part_leaf"),
            F.split_part(path, F.lit("/"), F.lit(9)).alias("part_past_end"),
            F.split_part(path, F.lit("/"), F.lit(-1)).alias("part_last"),
        )
        .orderBy("doc_id")
    )


@query(
    "q_ilike_similar",
    oracle="""
    SELECT doc_id,
           text ILIKE '%SPARK%' AS has_spark_ci,
           source ILIKE 'SRC1%' AS src_prefix_ci,
           lang SIMILAR TO '(en|es)' AS lang_sim,
           source SIMILAR TO 'src(1|2).*' AS src_sim
    FROM documents ORDER BY doc_id
    """,
)
def q_ilike_similar(spark, sf_dir):
    """Case-insensitive LIKE and SQL SIMILAR TO.

    ILIKE: Spark parses it natively (same fold-then-LIKE semantics as
    Postgres/DuckDB) — ``'%SPARK%'`` against lowercase corpus text and
    ``'SRC1%'`` against the source labels both hit only via the fold.

    SIMILAR TO: Spark has no such predicate; the rewrite is
    ``rlike '^(pattern)$'``. The ^( )$ wrapper is the load-bearing
    part — SIMILAR TO matches the WHOLE string while rlike
    substring-matches, so the unanchored port silently turns
    ``'(en|es)'`` into "contains en or es". Dialect note discovered by
    this key's first red run: DuckDB deviates from SQL here — its
    SIMILAR TO is plain full-match POSIX regex (``%`` is a LITERAL
    percent, unlike Postgres where ``%``/``_`` are wildcards and ``.``
    is literal) — so the patterns stick to the regex subset DuckDB and
    Java share (alternation, grouping, ``.*``); a Postgres port would
    spell them with ``%``. DuckDB evaluates the native predicate, so
    the hash gate proves the anchoring rewrite against real full-match
    semantics on every row."""
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.expr("text ILIKE '%SPARK%'").alias("has_spark_ci"),
            F.expr("source ILIKE 'SRC1%'").alias("src_prefix_ci"),
            F.col("lang").rlike("^(en|es)$").alias("lang_sim"),
            F.col("source").rlike("^(src(1|2).*)$").alias("src_sim"),
        )
        .orderBy("doc_id")
    )
