"""Round-9 batch 69 (SURVEY.md §2 Tier-B window parity + §2.11 corpus
ops): SQL-standard window frame EXCLUDE clauses, and PII REDACTION (the
transform q_pii_scan only profiles).

- **q_window_exclude** — the SQL:2011 frame exclusion clause
  (`EXCLUDE CURRENT ROW / TIES / GROUP`), which Spark does not parse:
  over a numeric RANGE frame every peer of the current row is inside
  the frame by construction, so all three exclusions are EXACT integer
  arithmetic on two window sums — total-frame sum/count and
  peer-group sum/count — and the rewrite needs no extra shuffle (both
  windows share the partition key). The oracle is DuckDB's NATIVE
  EXCLUDE under the identical frame, including its empty-frame NULL
  semantics (mirrored with count guards in the rewrite).
- **q_pii_redact_injected** — the POSITIVE-SIGNAL twin of q_pii_redact (extras17.py redacts the PII-free fixture corpus, so its match counts are all zero): the redaction stage after q_pii_scan's profile:
  deterministic PII is INJECTED in-query (the fixture corpus is
  PII-free word-pool text; both engines append the identical
  ``user<doc_id>@example.com`` / ``555-123-4567`` payloads to the same
  doc_id strata — the multimodal-keys synthesis pattern), then
  stripped with regexp_replace into typed placeholders. The driver
  hash-verifies counts, the redacted-text digest, AND a
  ``no_pii_left`` re-scan witness (expected TRUE).

Regex subset restricted to patterns with identical Java/RE2 semantics
(the q_pii_scan rule); money/none here — all counts integer-exact.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

_RANGE_CENTS = 1000  # ±10.00 of value around the current row


@query(
    "q_window_exclude",
    oracle=f"""
    WITH v AS (
      SELECT event_id, event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS value_cents
      FROM events
      WHERE value IS NOT NULL
    )
    SELECT event_id, event_type, value_cents,
           CAST(SUM(value_cents) OVER (
                PARTITION BY event_type ORDER BY value_cents
                RANGE BETWEEN {_RANGE_CENTS} PRECEDING
                          AND {_RANGE_CENTS} FOLLOWING
                EXCLUDE CURRENT ROW) AS BIGINT) AS excl_current_sum,
           CAST(SUM(value_cents) OVER (
                PARTITION BY event_type ORDER BY value_cents
                RANGE BETWEEN {_RANGE_CENTS} PRECEDING
                          AND {_RANGE_CENTS} FOLLOWING
                EXCLUDE TIES) AS BIGINT) AS excl_ties_sum,
           CAST(SUM(value_cents) OVER (
                PARTITION BY event_type ORDER BY value_cents
                RANGE BETWEEN {_RANGE_CENTS} PRECEDING
                          AND {_RANGE_CENTS} FOLLOWING
                EXCLUDE GROUP) AS BIGINT) AS excl_group_sum
    FROM v ORDER BY event_id
    """,
)
def q_window_exclude(spark, sf_dir):
    """SQL:2011 window frame EXCLUDE (CURRENT ROW / TIES / GROUP) —
    neighborhood statistics that must not count the row itself (leakage
    control in feature engineering: "average of OTHER similar events").
    Spark has no EXCLUDE clause; over a RANGE frame every peer (equal
    ORDER BY value) is in-frame by definition, so the three exclusions
    reduce to exact integer arithmetic on two shared-shuffle windows:

        excl_current = total − v            (NULL when frame == {{row}})
        excl_ties    = total − peers + v    (current row always kept)
        excl_group   = total − peers        (NULL when frame == peers)

    The NULL guards mirror the standard's empty-exclusion semantics,
    which DuckDB's native EXCLUDE (the oracle) implements.

    Plan — the TWO-PHASE value-grain form: Spark evaluates sliding
    RANGE aggregates WITHOUT retraction (SlidingWindowFunctionFrame
    re-sums the in-frame buffer per row), so a row-grain RANGE window
    is O(rows × frame_density) — measured 7.4× wall at 10× data on the
    first cut. Every row with the same ORDER BY value shares its frame,
    so the frame sums are computed ONCE per distinct (type, value) at
    GROUP grain — the window input is bounded by the value DOMAIN, not
    the row count — and rows join back on the group key. peer_sum /
    peer_cnt are the group's own aggregates, so the peers window
    disappears entirely. Integer cents keep every sum exact.

    NULL values are filtered EXPLICITLY on both sides (review finding:
    the join-back is null-unsafe — null != null — so a NULL value row
    would silently vanish from the rewrite while the oracle emitted it
    with NULL sums; the fixture has no NULL values, but the mirrored
    WHERE makes the semantics identical by construction, not by
    fixture luck)."""
    e = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").alias(
                "value_cents"
            ),
        )
    )
    g = e.groupBy("event_type", "value_cents").agg(
        F.sum("value_cents").alias("peer_sum"),
        F.count(F.lit(1)).alias("peer_cnt"),
    )
    frame = (
        Window.partitionBy("event_type")
        .orderBy("value_cents")
        .rangeBetween(-_RANGE_CENTS, _RANGE_CENTS)
    )
    g = g.select(
        "event_type",
        "value_cents",
        "peer_sum",
        "peer_cnt",
        F.sum("peer_sum").over(frame).alias("total"),
        F.sum("peer_cnt").over(frame).alias("cnt"),
    )
    v = F.col("value_cents")
    return (
        e.join(g, ["event_type", "value_cents"])
        .select(
            "event_id",
            "event_type",
            "value_cents",
            F.when(F.col("cnt") > 1, F.col("total") - v)
            .cast("bigint")
            .alias("excl_current_sum"),
            (F.col("total") - F.col("peer_sum") + v)
            .cast("bigint")
            .alias("excl_ties_sum"),
            F.when(
                F.col("cnt") > F.col("peer_cnt"),
                F.col("total") - F.col("peer_sum"),
            )
            .cast("bigint")
            .alias("excl_group_sum"),
        )
        .orderBy("event_id")
    )


_EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z][a-zA-Z]+"
_PHONE_RE = r"[0-9][0-9][0-9][-.][0-9][0-9][0-9][-.][0-9][0-9][0-9][0-9]"


@query(
    "q_pii_redact_injected",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             text ||
             CASE WHEN doc_id % 7 = 0
                  THEN ' reach me at user' || CAST(doc_id AS VARCHAR)
                       || '@example.com'
                  ELSE '' END ||
             CASE WHEN doc_id % 11 = 0
                  THEN ' or call 555-123-4567' ELSE '' END AS text
      FROM documents
    ), red AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '{_EMAIL_RE}'))
                  AS BIGINT) AS n_emails,
             CAST(len(regexp_extract_all(text, '{_PHONE_RE}'))
                  AS BIGINT) AS n_phones,
             regexp_replace(
               regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
      FROM aug
    )
    SELECT doc_id, n_emails, n_phones,
           SUBSTRING(MD5(redacted), 1, 16) AS redacted_digest,
           (len(regexp_extract_all(redacted, '{_EMAIL_RE}')) = 0 AND
            len(regexp_extract_all(redacted, '{_PHONE_RE}')) = 0)
             AS no_pii_left
    FROM red ORDER BY doc_id
    """,
)
def q_pii_redact_injected(spark, sf_dir):
    """PII REDACTION with POSITIVE SIGNAL — q_pii_redact (extras17.py)
    proves the redaction pipeline leaves clean text untouched (the
    fixture corpus is PII-free, so its counts are all zero); this twin
    proves it actually REDACTS. The fixture corpus is PII-free
    word-pool text, so deterministic PII is injected in-query (both
    engines append identical ``user<doc_id>@example.com`` /
    ``555-123-4567`` payloads to the doc_id%7 / %11 strata — the same
    synthesis pattern the multimodal keys use), then redacted. Output
    hash-verifies the per-doc match counts, a digest of the redacted
    text (proves the replacement bytes, not just counts), and a
    ``no_pii_left`` re-scan witness (expected TRUE).

    Plan: one narrow projection — regexp_count + two regexp_replace,
    all JVM codegen, no UDF, no shuffle except the output sort;
    embarrassingly parallel at 100 TB."""
    aug = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" reach me at user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0, F.lit(" or call 555-123-4567")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return (
        aug.select(
            "doc_id",
            F.regexp_count(F.col("text"), F.lit(_EMAIL_RE))
            .cast("bigint")
            .alias("n_emails"),
            F.regexp_count(F.col("text"), F.lit(_PHONE_RE))
            .cast("bigint")
            .alias("n_phones"),
            F.substring(F.md5(redacted), 1, 16).alias("redacted_digest"),
            (
                (F.regexp_count(redacted, F.lit(_EMAIL_RE)) == 0)
                & (F.regexp_count(redacted, F.lit(_PHONE_RE)) == 0)
            ).alias("no_pii_left"),
        )
        .orderBy("doc_id")
    )
