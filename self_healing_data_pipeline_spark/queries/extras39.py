"""Round-6 batch 21 (SURVEY.md §2.11 dedup): DEDUP EXPLAINABILITY —
for the strongest near-duplicate pair found by the shared-span signal,
SHOW THE EVIDENCE: how many 64-char spans the two documents share, the
overlap fraction, and the longest CONSECUTIVE run of shared spans
(the contiguous copied region's extent) — the report a human reviews
before approving a dedup pass that deletes data.

Builds on q_dedup_substring's span grain (same SPAN/STRIDE constants,
same hash-only shuffles)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.queries.extras5 import _SPAN, _STRIDE
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

_SPANS_SQL = f"""spans AS (
      SELECT doc_id, CAST(p AS BIGINT) AS pos,
             MD5(SUBSTRING(text, CAST(p AS INTEGER), {_SPAN})) AS h
      FROM (
        SELECT doc_id, text,
               UNNEST(generate_series(
                 1, CAST(n_chars AS BIGINT) - {_SPAN - 1}, {_STRIDE}
               )) AS p
        FROM documents WHERE n_chars >= {_SPAN}
      )
    )"""


@query(
    "q_dedup_explain",
    oracle=f"""
    WITH {_SPANS_SQL}, shared AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a
      FROM spans a JOIN spans b ON a.h = b.h AND a.doc_id < b.doc_id
    ), pair_counts AS (
      SELECT doc_a, doc_b, CAST(COUNT(*) AS BIGINT) AS shared_spans
      FROM shared GROUP BY 1, 2
    ), top1 AS (
      SELECT doc_a, doc_b, shared_spans FROM pair_counts
      ORDER BY shared_spans DESC, doc_a, doc_b LIMIT 1
    ), doc_spans AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans
      FROM spans GROUP BY 1
    ), runs AS (
      SELECT s.pos_a,
             (s.pos_a - 1) // {_STRIDE}
               - ROW_NUMBER() OVER (ORDER BY s.pos_a) AS grp
      FROM shared s JOIN top1 t
        ON s.doc_a = t.doc_a AND s.doc_b = t.doc_b
    ), max_run AS (
      SELECT CAST(MAX(rl) AS BIGINT) AS run_spans FROM (
        SELECT COUNT(*) AS rl FROM runs GROUP BY grp
      )
    )
    SELECT t.doc_a, t.doc_b, t.shared_spans,
           da.n_spans AS spans_a, db.n_spans AS spans_b,
           CAST(t.shared_spans * 1000000
                // LEAST(da.n_spans, db.n_spans) AS BIGINT) AS overlap_ppm,
           m.run_spans,
           CAST((m.run_spans - 1) * {_STRIDE} + {_SPAN} AS BIGINT)
             AS run_chars
    FROM top1 t
    JOIN doc_spans da ON t.doc_a = da.doc_id
    JOIN doc_spans db ON t.doc_b = db.doc_id, max_run m
    """,
)
def q_dedup_explain(spark, sf_dir):
    """DEDUP EXPLAINABILITY: the evidence report for the strongest
    shared-span near-dup pair — shared 64-char spans, each side's span
    total, exact-ppm overlap of the smaller document, and the longest
    CONSECUTIVE shared-span run with its character extent (a
    gaps-and-islands pass over the aligned span positions: consecutive
    stride-32 positions collapse via the pos//stride − row_number
    trick). This is what a reviewer reads before a dedup pass deletes
    one of the two documents — "how much is copied, and is it one
    contiguous block or scattered boilerplate?".

    Scale shape: span extraction via the shared linear cell/lead-window
    form (``operators.text.strided_spans`` — round-10 long-doc fix;
    the explode-then-substring original was quadratic per doc on
    100 KB+ documents); the span self-join shuffles 32-hex hashes only
    (the q_dedup_substring contract); pair counts partial-aggregate;
    only the single top pair's positions reach the islands pass (a
    ≤spans-per-doc frame). Exact integers throughout."""
    from self_healing_data_pipeline_spark.operators.text import (
        strided_spans,
    )

    d = read_table(spark, sf_dir, "documents")
    spans = strided_spans(
        d.filter(F.col("n_chars") >= _SPAN),
        "doc_id",
        F.col("text"),
        _SPAN,
        _STRIDE,
    ).select("doc_id", "pos", F.md5("span_text").alias("h"))
    a = spans.select(
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("pos_a"), "h"
    )
    b = spans.select(F.col("doc_id").alias("doc_b"), "h")
    shared = (
        a.join(b, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "pos_a")
        .distinct()
    )
    pair_counts = shared.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("shared_spans")
    )
    top1 = pair_counts.orderBy(
        F.desc("shared_spans"), F.asc("doc_a"), F.asc("doc_b")
    ).limit(1)
    doc_spans = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans")
    )
    top_shared = shared.join(
        F.broadcast(top1.select("doc_a", "doc_b")), ["doc_a", "doc_b"]
    )
    grp = (
        ((F.col("pos_a") - 1) - F.pmod(F.col("pos_a") - 1, _STRIDE)) / _STRIDE
    ).cast("bigint") - F.row_number().over(Window.orderBy("pos_a"))
    runs = top_shared.select(grp.alias("grp"))
    max_run = (
        runs.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("rl"))
        .agg(F.max("rl").cast("bigint").alias("run_spans"))
    )
    return (
        top1.join(
            F.broadcast(
                doc_spans.select(
                    F.col("doc_id").alias("doc_a"),
                    F.col("n_spans").alias("spans_a"),
                )
            ),
            "doc_a",
        )
        .join(
            F.broadcast(
                doc_spans.select(
                    F.col("doc_id").alias("doc_b"),
                    F.col("n_spans").alias("spans_b"),
                )
            ),
            "doc_b",
        )
        .crossJoin(F.broadcast(max_run))
        .select(
            "doc_a",
            "doc_b",
            "shared_spans",
            "spans_a",
            "spans_b",
            (
                (
                    F.col("shared_spans") * 1000000
                    - F.pmod(
                        F.col("shared_spans") * 1000000,
                        F.least(F.col("spans_a"), F.col("spans_b")),
                    )
                )
                / F.least(F.col("spans_a"), F.col("spans_b"))
            )
            .cast("bigint")
            .alias("overlap_ppm"),
            "run_spans",
            ((F.col("run_spans") - 1) * _STRIDE + _SPAN)
            .cast("bigint")
            .alias("run_chars"),
        )
    )
