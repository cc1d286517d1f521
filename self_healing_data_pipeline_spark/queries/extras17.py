"""Round-5 batch 12 (SURVEY.md §2.11): corpus-hygiene closers — PII
REDACTION (the transform the ``q_pii_scan`` profile exists to gate) and
the language-ID CONFUSION MATRIX (the audit behind ``q_text_langid``'s
predictions).

Both are single-pass JVM projections/aggregates sharing their regex and
marker definitions with the existing operators, so scan, redact, and
audit can never disagree about what counts as PII or as a language hit."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.operators.text import lang_id
from self_healing_data_pipeline_spark.queries.tier_c import (
    _langid_case_sql,
    _marker_counts_sql,
)
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# Same shapes q_pii_scan counts (llm_ops.py): redact what the scan finds.
_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z][a-zA-Z]+"
_PHONE = r"[0-9][0-9][0-9][-.][0-9][0-9][0-9][-.][0-9][0-9][0-9][0-9]"

_NORM = "TRIM(REGEXP_REPLACE(LOWER({c}), '[^a-z0-9]+', ' ', 'g'))"


@query(
    "q_pii_redact",
    oracle=f"""
    WITH r AS (
      SELECT doc_id,
             REGEXP_REPLACE(
               REGEXP_REPLACE(text, '{_EMAIL}', '<EMAIL>', 'g'),
               '{_PHONE}', '<PHONE>', 'g') AS redacted,
             text
      FROM documents
    )
    SELECT doc_id,
           SUBSTRING(MD5(redacted), 1, 16) AS redacted_fp,
           CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '{_EMAIL}', '',
                'g')) AS BIGINT)
             + CAST(LENGTH(REGEXP_REPLACE(text, '{_EMAIL}', '', 'g'))
                    - LENGTH(REGEXP_REPLACE(REGEXP_REPLACE(text, '{_EMAIL}',
                        '', 'g'), '{_PHONE}', '', 'g')) AS BIGINT)
             AS chars_redacted,
           (LEN(REGEXP_EXTRACT_ALL(redacted, '{_EMAIL}')) = 0
            AND LEN(REGEXP_EXTRACT_ALL(redacted, '{_PHONE}')) = 0)
             AS clean_after
    FROM r
    """,
)
def q_pii_redact(spark, sf_dir):
    """PII REDACTION — the transform the scan profile gates: emails and
    phone-shaped spans replace with typed placeholders, emitting a
    redacted-content fingerprint, the exact count of characters
    removed, and a ``clean_after`` witness that re-scanning the
    redacted text with the SAME patterns finds nothing (the property a
    privacy review actually signs off on; the oracle expects it TRUE
    per row). Patterns are shared constants with ``q_pii_scan``, so
    scan and redact cannot drift.

    Plan: one narrow map per row — three JVM regexp passes (replace,
    replace, verify), no shuffle at all before the declared output.
    The fingerprint stands in for shipping the redacted text through
    the comparison (md5 over UTF-8 twins exactly across engines)."""
    d = read_table(spark, sf_dir, "documents")
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL, "<EMAIL>"), _PHONE, "<PHONE>"
    )
    no_email = F.regexp_replace(F.col("text"), _EMAIL, "")
    no_both = F.regexp_replace(no_email, _PHONE, "")
    return d.select(
        "doc_id",
        F.substring(F.md5(redacted), 1, 16).alias("redacted_fp"),
        (
            (F.length("text") - F.length(no_email)).cast("bigint")
            + (F.length(no_email) - F.length(no_both)).cast("bigint")
        ).alias("chars_redacted"),
        (
            (F.regexp_count(redacted, F.lit(_EMAIL)) == 0)
            & (F.regexp_count(redacted, F.lit(_PHONE)) == 0)
        ).alias("clean_after"),
    )


@query(
    "q_langid_confusion",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, lang, {_NORM.format(c='text')} AS norm FROM documents
    ), scored AS (
      SELECT doc_id, lang,
           {{marker_cols}}
      FROM base
    ), pred AS (
      SELECT lang, {{case_expr}} AS lang_pred FROM scored
    )
    SELECT lang, lang_pred,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY lang, lang_pred ORDER BY lang, lang_pred
    """.format(
        marker_cols=_marker_counts_sql(), case_expr=_langid_case_sql()
    ),
)
def q_langid_confusion(spark, sf_dir):
    """Language-ID CONFUSION MATRIX: labeled language × predicted
    language counts — the audit behind ``q_text_langid``'s per-doc
    predictions (which marker families collide, where 'und' falls).
    The prediction logic is the SAME shared ``LANG_MARKERS`` argmax on
    both engines, so the matrix is exact, and the matrix grain is
    bounded at (|langs|+1)² rows.

    Plan: one narrow regex-count map + one counted-grain aggregate
    with map-side partials — the corpus scans once."""
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select("lang", lang_id("text").alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("lang", "lang_pred")
    )
