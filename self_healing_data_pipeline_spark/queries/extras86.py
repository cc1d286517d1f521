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

    Plan — PREFIX-SUM + BOUNDARY PROBES (round-11 refit; linear): Spark
    evaluates sliding RANGE aggregates WITHOUT retraction
    (SlidingWindowFunctionFrame re-sums the in-frame buffer per row), so
    even the round-9 GROUP-grain form was O(groups × frame_density) —
    5.4 s accepted, the suite's slowest key. A sliding integer-RANGE sum
    is a difference of two prefix sums: with cum(x) = Σ contributions at
    values ≤ x,

        frame_total(v) = cum(v + R) − cum(v − R − 1)       (integer cents)

    and a GROWING frame (UNBOUNDED PRECEDING .. CURRENT ROW by RANGE)
    *is* incrementally maintained by Spark
    (UnboundedPrecedingWindowFunctionFrame) — one O(n) pass. The two
    boundary lookups land at values that need not exist in the domain,
    so each distinct (type, value) group emits two ZERO-WEIGHT probe
    rows at v+R and v−R−1; the probes ride the same cumulative window
    (RANGE peers at an equal position share one cum, so probe/base ties
    are exact), then fold back to one row per group as
    cum_hi − cum_lo. Everything stays at VALUE-DOMAIN grain — the
    window input is 3×|domain| rows regardless of row count — and rows
    join back on the group key. peer_sum / peer_cnt are the group's own
    aggregates. Integer cents keep every sum exact.

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
    zero = F.lit(0).cast("bigint")
    base = g.select(
        "event_type",
        F.col("value_cents").alias("pos"),
        F.lit(None).cast("bigint").alias("src"),
        F.lit(0).alias("kind"),
        F.col("peer_sum").alias("s"),
        F.col("peer_cnt").alias("c"),
    )
    hi = g.select(
        "event_type",
        (F.col("value_cents") + _RANGE_CENTS).alias("pos"),
        F.col("value_cents").alias("src"),
        F.lit(1).alias("kind"),
        zero.alias("s"),
        zero.alias("c"),
    )
    lo = g.select(
        "event_type",
        (F.col("value_cents") - _RANGE_CENTS - 1).alias("pos"),
        F.col("value_cents").alias("src"),
        F.lit(-1).alias("kind"),
        zero.alias("s"),
        zero.alias("c"),
    )
    cum_w = (
        Window.partitionBy("event_type")
        .orderBy("pos")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    u = base.unionByName(hi).unionByName(lo).select(
        "src",
        "kind",
        "event_type",
        F.sum("s").over(cum_w).alias("cum_s"),
        F.sum("c").over(cum_w).alias("cum_c"),
    )
    # frame total/cnt per group: cum(hi) − cum(lo), folded via kind ±1
    bounds = (
        u.filter(F.col("kind") != 0)
        .groupBy("event_type", "src")
        .agg(
            F.sum(F.col("kind") * F.col("cum_s")).alias("total"),
            F.sum(F.col("kind") * F.col("cum_c")).alias("cnt"),
        )
        .withColumnRenamed("src", "value_cents")
    )
    g = g.join(bounds, ["event_type", "value_cents"])
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
