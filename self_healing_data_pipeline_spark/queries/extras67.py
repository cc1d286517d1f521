"""Round-6 batch 50 (SURVEY.md §2.4 optimizer stats / §2.11 corpus):
SELECTIVITY AUDIT (the planner's uniform-within-bucket range estimate
from the equi-depth histogram, scored against the exact count for a
fixed probe panel — the estimator-error report that decides whether 8
buckets are enough) and the DATASET CARD (the one-row corpus summary
— docs, sources, languages, tokens, exact-dup rate — every corpus
release ships as its datasheet front matter).

Exactness: estimates are exact integers by construction (the
interpolation is integer-scaled floor division, summed as BIGINTs);
actual counts are exact; the card is pure integer counting."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.operators.dedup import (
    NORMALIZE_TEXT_SQL as _NORM,
)
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

_N_BUCKETS = 8
# Probe ranges in exact cents (closed intervals), spanning low /
# middle / high / open-bottom shapes of the o_totalprice domain.
_PROBES = (
    (1, 0, 5_000_000),
    (2, 5_000_000, 10_000_000),
    (3, 10_000_000, 20_000_000),
    (4, 20_000_000, 40_000_000),
)
_SCALE = 1_000_000


def _probe_values_sql() -> str:
    rows = ", ".join(f"({pid}, {a}, {b})" for pid, a, b in _PROBES)
    return f"(VALUES {rows}) AS probes(probe_id, a, b)"


@query(
    "q_selectivity_audit",
    oracle=f"""
    WITH grain AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1
    ), c AS (
      SELECT v, cnt,
             SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cumw,
             SUM(cnt) OVER () AS total
      FROM grain
    ), hist AS (
      SELECT (cumw - 1) * {_N_BUCKETS} // total + 1 AS bucket,
             CAST(MIN(v) AS BIGINT) AS lo,
             CAST(MAX(v) AS BIGINT) AS hi,
             CAST(SUM(cnt) AS BIGINT) AS n_rows
      FROM c GROUP BY 1
    ), est AS (
      SELECT probe_id, a, b,
             CAST(SUM(n_rows *
                  ((GREATEST(LEAST(hi, b) - GREATEST(lo, a) + 1, 0)
                    * {_SCALE}) // (hi - lo + 1))) AS BIGINT) AS est_scaled
      FROM hist CROSS JOIN {_probe_values_sql()}
      GROUP BY 1, 2, 3
    ), act AS (
      SELECT probe_id,
             CAST(COUNT(*) AS BIGINT) AS actual
      FROM (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
            FROM orders) o
      CROSS JOIN {_probe_values_sql()}
      WHERE o.v BETWEEN probes.a AND probes.b
      GROUP BY 1
    )
    SELECT est.probe_id AS probe_id,
           CAST(est.a AS BIGINT) AS lo_cents,
           CAST(est.b AS BIGINT) AS hi_cents,
           CAST(COALESCE(act.actual, 0) AS BIGINT) AS actual_rows,
           CAST(est.est_scaled AS DOUBLE) / {_SCALE} AS estimated_rows,
           (CAST(est.est_scaled AS DOUBLE) / {_SCALE}
            - CAST(COALESCE(act.actual, 0) AS DOUBLE))
             / CAST(COALESCE(act.actual, 0) AS DOUBLE) AS rel_error
    FROM est LEFT JOIN act ON est.probe_id = act.probe_id
    ORDER BY probe_id
    """,
)
def q_selectivity_audit(spark, sf_dir):
    """SELECTIVITY AUDIT: for each probe range, the exact row count
    next to the planner's estimate — uniform interpolation inside the
    8-bucket equi-depth histogram (overlap/width of each bucket,
    integer-scaled ×10⁶ floor division so the estimate itself is an
    exact BIGINT and sums order-independently) — and the relative
    error. This is the feedback loop for q_histogram_equidepth /
    q_join_size_estimate: a planner trusts its stats only as far as
    this report says it should.

    Scale shape: the histogram reuses the two-phase banded cumulative
    (coarse v>>20 megabuckets → bounded offsets → in-bucket running
    sum, q_histogram_equidepth's exact pattern — no SinglePartition
    over the value grain); the estimator is an 8×4 broadcast cross of
    BOUNDED tables; actuals are ONE conditional-aggregate pass over
    the fact (probes as filter expressions, no per-probe rescans)."""
    o = read_table(spark, sf_dir, "orders")
    grain = o.groupBy(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    coarse = F.shiftright(F.col("v"), 20).alias("cb")
    g2 = grain.select("v", "cnt", coarse)
    sub = g2.groupBy("cb").agg(F.sum("cnt").alias("bsum"))
    wcb = Window.orderBy("cb").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sub.select(
        "cb", F.coalesce(F.sum("bsum").over(wcb), F.lit(0)).alias("offset")
    )
    win = Window.partitionBy("cb").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = grain.agg(F.sum("cnt").alias("total"))
    c = (
        g2.join(F.broadcast(offsets), "cb")
        .withColumn("cumw", F.col("offset") + F.sum("cnt").over(win))
        .crossJoin(F.broadcast(total))
    )
    bucket = F.expr(f"(cumw - 1) * {_N_BUCKETS} div total") + 1
    hist = (
        c.select("v", "cnt", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.min("v").cast("bigint").alias("lo"),
            F.max("v").cast("bigint").alias("hi"),
            F.sum("cnt").cast("bigint").alias("n_rows"),
        )
    )
    probes = o.sparkSession.createDataFrame(
        list(_PROBES), "probe_id INT, a BIGINT, b BIGINT"
    )
    ov = F.greatest(
        F.least(F.col("hi"), F.col("b"))
        - F.greatest(F.col("lo"), F.col("a"))
        + 1,
        F.lit(0),
    )
    est = (
        hist.crossJoin(F.broadcast(probes))
        .withColumn("ov", ov)
        .withColumn(
            "contrib",
            F.col("n_rows")
            * F.expr(f"(ov * {_SCALE}) div (hi - lo + 1)"),
        )
        .groupBy("probe_id", "a", "b")
        .agg(F.sum("contrib").cast("bigint").alias("est_scaled"))
    )
    acts = [
        F.sum(
            F.when(
                (F.col("v") >= F.lit(a)) & (F.col("v") <= F.lit(b)), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias(f"act_{pid}")
        for pid, a, b in _PROBES
    ]
    act_wide = o.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v")
    ).agg(*acts)
    act = act_wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(pid).cast("int").alias("probe_id"),
                        F.col(f"act_{pid}").alias("actual"),
                    )
                    for pid, _, _ in _PROBES
                ]
            )
        ).alias("s")
    ).select("s.probe_id", "s.actual")
    est_rows = F.col("est_scaled").cast("double") / F.lit(_SCALE)
    return (
        est.join(F.broadcast(act), "probe_id", "left")
        .select(
            "probe_id",
            F.col("a").cast("bigint").alias("lo_cents"),
            F.col("b").cast("bigint").alias("hi_cents"),
            F.coalesce(F.col("actual"), F.lit(0))
            .cast("bigint")
            .alias("actual_rows"),
            est_rows.alias("estimated_rows"),
            (
                (
                    est_rows
                    - F.coalesce(F.col("actual"), F.lit(0)).cast("double")
                )
                / F.coalesce(F.col("actual"), F.lit(0)).cast("double")
            ).alias("rel_error"),
        )
        .orderBy("probe_id")
    )


@query(
    "q_dataset_card",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source, lang, n_chars,
             {_NORM.format(c='text')} AS nt
      FROM documents
    ), toks AS (
      SELECT SUM(LEN(nt) - LEN(REPLACE(nt, ' ', '')) + 1) AS n_tokens
      FROM base WHERE LEN(nt) > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           (SELECT CAST(n_tokens AS BIGINT) FROM toks) AS total_tokens,
           CAST(COUNT(*) - COUNT(DISTINCT nt) AS BIGINT) AS n_exact_dups,
           CAST(COUNT(*) - COUNT(DISTINCT nt) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS dup_rate,
           CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS mean_chars
    FROM base
    """,
)
def q_dataset_card(spark, sf_dir):
    """DATASET CARD: the one-row corpus datasheet — document, source
    and language counts, total characters, whitespace-token total,
    normalized-text exact-duplicate count and rate, mean length —
    the summary block a corpus release prints first (Gebru et al.
    "Datasheets for Datasets"), assembled from the same normalization
    contract every dedup op uses so the dup rate here equals what
    q_dedup_normalized would remove.

    Scale shape: ONE aggregate pass over documents (token counting is
    a length expression, not an explode; the dup count is COUNT −
    COUNT(DISTINCT) over the normalized text — at corpus scale the
    16-hex fingerprint substitutes, same discipline as
    q_dedup_normalized). No joins, no windows."""
    from self_healing_data_pipeline_spark.operators.dedup import normalize_text

    docs = read_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        normalize_text("text").alias("nt"),
    )
    tok_count = F.when(
        F.length("nt") > 0,
        F.length("nt")
        - F.length(F.regexp_replace(F.col("nt"), " ", ""))
        + 1,
    ).otherwise(0)
    return base.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum(tok_count).cast("bigint").alias("total_tokens"),
        (F.count(F.lit(1)) - F.countDistinct("nt"))
        .cast("bigint")
        .alias("n_exact_dups"),
        (
            (F.count(F.lit(1)) - F.countDistinct("nt")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("dup_rate"),
        (
            F.sum("n_chars").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_chars"),
    )
