"""Round-6 batch 20 (SURVEY.md §2.1 ingest hardening / §2.2 SQL
semantics): CSV DIALECT round-trip fidelity (RFC 4180 — embedded
commas, doubled quotes, and NEWLINES inside quoted fields survive a
write→read cycle bit-exactly) and a NULL-SEMANTICS parity suite (the
three-valued-logic edge cases — NOT over NULL predicates, NOT IN with
a NULL, null-safe equality — counted identically on both engines).

These pin the sharp edges users actually cut themselves on when
migrating engines; the reference's EP1 ingests real-world CSV
(`APP/services/geminiService.ts` schema analysis), where dialect bugs
silently corrupt rows."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".scratch")


@query(
    "q_csv_dialect",
    oracle="""
    SELECT n_nationkey AS id,
           n_name || ', "' || n_name || '"' || CHR(10) || 'line2' AS note,
           CAST(LENGTH(n_name || ', "' || n_name || '"' || CHR(10)
                       || 'line2') AS BIGINT) AS note_len
    FROM nation ORDER BY id
    """,
)
def q_csv_dialect(spark, sf_dir):
    """CSV DIALECT round trip (RFC 4180): a derived text field with an
    embedded comma, a quoted substring, AND a literal newline writes to
    CSV (quote-doubling escape style, not backslash) and reads back via
    the multiLine parser — the oracle recomputes the same strings from
    the parquet directly, so equality proves the writer/parser pair
    loses NOTHING on the dialect's hardest cases (a backslash-escape
    default or single-line reader silently splits these rows; that is
    the classic cross-tool CSV corruption).

    Scale shape: narrow map → file write → parallel multiLine scan
    (multiLine CSV is NOT splittable within a file — the documented
    trade; at 100 TB keep such fields in parquet/JSONL or shard the
    CSV into many files, which this write does by partition)."""
    os.makedirs(_SCRATCH, exist_ok=True)
    out = os.path.join(_SCRATCH, "dialect_csv")
    n = read_table(spark, sf_dir, "nation")
    note = F.concat(
        F.col("n_name"),
        F.lit(', "'),
        F.col("n_name"),
        F.lit('"\nline2'),
    )
    n.select(
        F.col("n_nationkey").alias("id"), note.alias("note")
    ).coalesce(1).write.mode("overwrite").option("header", True).option(
        "quote", '"'
    ).option(
        "escape", '"'
    ).csv(out)
    back = (
        spark.read.option("header", True)
        .option("multiLine", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("inferSchema", True)
        .csv(out)
    )
    return back.select(
        F.col("id").cast("bigint").alias("id"),
        "note",
        F.length("note").cast("bigint").alias("note_len"),
    ).orderBy("id")


@query(
    "q_null_semantics",
    oracle="""
    WITH v AS (
      SELECT c_custkey AS ck,
             CASE WHEN SUBSTR(MD5(CAST(c_custkey AS VARCHAR)), 1, 2) < '10'
                  THEN NULL
                  ELSE CAST(ROUND(c_acctbal * 100) AS BIGINT) END AS bal
      FROM customer
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN bal > 10000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_gt,
           CAST(SUM(CASE WHEN NOT (bal > 10000) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_not_gt,
           CAST(SUM(CASE WHEN bal IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           CAST(SUM(CASE WHEN ck NOT IN (1, 2, NULL) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_not_in_with_null,
           CAST(SUM(CASE WHEN bal = bal THEN 1 ELSE 0 END) AS BIGINT)
             AS n_self_eq,
           CAST(SUM(CASE WHEN bal IS NOT DISTINCT FROM bal THEN 1 ELSE 0 END)
                AS BIGINT) AS n_self_eq_nullsafe,
           CAST(SUM(CASE WHEN bal > 10000 THEN 1 ELSE 0 END)
                + SUM(CASE WHEN NOT (bal > 10000) THEN 1 ELSE 0 END)
                + SUM(CASE WHEN bal IS NULL THEN 1 ELSE 0 END)
                = COUNT(*) AS BOOLEAN) AS trichotomy_holds
    FROM v
    """,
)
def q_null_semantics(spark, sf_dir):
    """NULL-SEMANTICS parity suite — the three-valued-logic edges
    counted identically on both engines over a deterministically
    NULLed column: a predicate and its negation DON'T partition the
    table (NULL satisfies neither — `trichotomy_holds` witnesses
    pred + NOT pred + IS NULL = total, oracle-expected TRUE);
    `NOT IN (…, NULL)` matches NOTHING (the classic trap — the
    reason q_tpch_q16's NOT IN decorrelates to LEFT ANTI with
    null-awareness); `=` is not reflexive under NULL while null-safe
    equality (`<=>` / IS NOT DISTINCT FROM) is.

    Scale shape: one narrow scan, one conditional-counter aggregate
    pass (q_dq_expectations' one-scan discipline), 1-row output."""
    cust = read_table(spark, sf_dir, "customer")
    h = F.md5(F.col("c_custkey").cast("string"))
    v = cust.select(
        F.col("c_custkey").alias("ck"),
        F.when(F.substring(h, 1, 2) < "10", F.lit(None).cast("bigint"))
        .otherwise(F.round(F.col("c_acctbal") * 100).cast("bigint"))
        .alias("bal"),
    )
    gt = F.col("bal") > 10000
    not_in = F.expr("ck NOT IN (1, 2, NULL)")
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    agg = v.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        cnt(gt).alias("n_gt"),
        cnt(~gt).alias("n_not_gt"),
        cnt(F.col("bal").isNull()).alias("n_null"),
        cnt(not_in).alias("n_not_in_with_null"),
        cnt(F.col("bal") == F.col("bal")).alias("n_self_eq"),
        cnt(F.col("bal").eqNullSafe(F.col("bal"))).alias(
            "n_self_eq_nullsafe"
        ),
    )
    return agg.select(
        "n_total",
        "n_gt",
        "n_not_gt",
        "n_null",
        "n_not_in_with_null",
        "n_self_eq",
        "n_self_eq_nullsafe",
        (
            F.col("n_gt") + F.col("n_not_gt") + F.col("n_null")
            == F.col("n_total")
        ).alias("trichotomy_holds"),
    )
