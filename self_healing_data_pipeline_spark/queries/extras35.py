"""Round-6 batch 17 (SURVEY.md §2.3/§2.11): NEAREST as-of join (the
bidirectional completion of the as-of family — backward q_join_asof,
forward q_join_asof_fwd, now nearest-in-time with deterministic
tie-break) and crawl-drift TRENDING TERMS (which vocabulary is
overrepresented in the newest corpus slice vs history — the
distribution-shift monitor for an always-growing training corpus)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.operators.dedup import (
    NORMALIZE_TEXT_SQL as _NORM_SQL,
)
from self_healing_data_pipeline_spark.operators.text import tokens
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

_TOL_US = 60 * 60000000  # 60-minute tolerance, exact integer µs


@query(
    "q_join_asof_nearest",
    oracle=f"""
    WITH c AS (
      SELECT user_id, event_id, EPOCH_US(ts) AS us FROM events
      WHERE event_type = 'click'
    ), p AS (
      SELECT user_id, EPOCH_US(ts) AS us FROM events
      WHERE event_type = 'purchase'
    ), b AS (
      SELECT c.user_id, c.event_id, c.us,
             (SELECT MAX(p.us) FROM p
              WHERE p.user_id = c.user_id AND p.us <= c.us
                AND c.us - p.us <= {_TOL_US}) AS back_us,
             (SELECT MIN(p.us) FROM p
              WHERE p.user_id = c.user_id AND p.us >= c.us
                AND p.us - c.us <= {_TOL_US}) AS fwd_us
      FROM c
    )
    SELECT user_id, event_id,
           CASE WHEN back_us IS NULL AND fwd_us IS NULL THEN NULL
                WHEN fwd_us IS NULL THEN 'backward'
                WHEN back_us IS NULL THEN 'forward'
                WHEN us - back_us <= fwd_us - us THEN 'backward'
                ELSE 'forward' END AS direction,
           CASE WHEN back_us IS NULL AND fwd_us IS NULL THEN NULL
                WHEN fwd_us IS NULL THEN us - back_us
                WHEN back_us IS NULL THEN fwd_us - us
                WHEN us - back_us <= fwd_us - us THEN us - back_us
                ELSE fwd_us - us END AS gap_us
    FROM b ORDER BY user_id, event_id
    """,
)
def q_join_asof_nearest(spark, sf_dir):
    """NEAREST as-of join: each click matches its closest purchase in
    EITHER direction within a 60-minute tolerance (tie → the earlier,
    backward match) — completing the as-of family. The
    sensor-alignment/nearest-event primitive (pandas merge_asof
    direction='nearest') at warehouse scale.

    Spark-first as the composition of the two existing passes over ONE
    unioned, ONE-shuffle stream: a backward LOCF window (last purchase
    at-or-before) and a forward LOCF window (first purchase at-or-
    after, descending frame), then an exact integer-µs comparison
    picks the nearer side. No self-join on time, no per-click lookback
    scan; windows partition by user. The oracle states the same result
    as correlated MAX/MIN subqueries.

    Determinism: exact integer µs everywhere; ties break backward by
    the <= comparison; output ordered by (user, event)."""
    e = read_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ev = e.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id",
        "event_id",
        "event_type",
        us.alias("us"),
        F.when(F.col("event_type") == "purchase", us).alias("p_us"),
    )
    # Backward pass: purchases sort BEFORE clicks at equal ts so a
    # simultaneous purchase is visible (<=); forward pass mirrors.
    back_w = (
        Window.partitionBy("user_id")
        .orderBy("us", F.col("event_type").desc(), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd_w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("us").desc(), F.col("event_type").desc(), F.col("event_id").desc()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # event_type desc puts 'purchase' before 'click' at equal us in
    # BOTH frame orders ('p' > 'c'), so a simultaneous purchase is
    # already carried when the click row is evaluated — the inclusive
    # <= / >= semantics of the oracle's correlated MAX/MIN.
    withm = ev.withColumn(
        "back_us", F.last("p_us", ignorenulls=True).over(back_w)
    ).withColumn("fwd_us", F.last("p_us", ignorenulls=True).over(fwd_w))
    c = withm.filter(F.col("event_type") == "click").select(
        "user_id",
        "event_id",
        "us",
        F.when(
            F.col("us") - F.col("back_us") <= F.lit(_TOL_US), F.col("back_us")
        ).alias("back_us"),
        F.when(
            F.col("fwd_us") - F.col("us") <= F.lit(_TOL_US), F.col("fwd_us")
        ).alias("fwd_us"),
    )
    back_gap = F.col("us") - F.col("back_us")
    fwd_gap = F.col("fwd_us") - F.col("us")
    direction = (
        F.when(F.col("back_us").isNull() & F.col("fwd_us").isNull(), F.lit(None).cast("string"))
        .when(F.col("fwd_us").isNull(), F.lit("backward"))
        .when(F.col("back_us").isNull(), F.lit("forward"))
        .when(back_gap <= fwd_gap, F.lit("backward"))
        .otherwise(F.lit("forward"))
    )
    gap = (
        F.when(F.col("back_us").isNull() & F.col("fwd_us").isNull(), F.lit(None).cast("bigint"))
        .when(F.col("fwd_us").isNull(), back_gap)
        .when(F.col("back_us").isNull(), fwd_gap)
        .when(back_gap <= fwd_gap, back_gap)
        .otherwise(fwd_gap)
    )
    return c.select(
        "user_id",
        "event_id",
        direction.alias("direction"),
        gap.cast("bigint").alias("gap_us"),
    ).orderBy("user_id", "event_id")


@query(
    "q_trending_terms",
    oracle=f"""
    WITH cut AS (
      -- FLOOR before the cast: DuckDB's double->int CAST rounds while
      -- Spark's truncates; floor makes both engines agree
      SELECT MAX(doc_id)
               - CAST(FLOOR((MAX(doc_id) - MIN(doc_id)) / 5) AS BIGINT)
               AS cut_id
      FROM documents
    ), toks AS (
      SELECT d.doc_id, UNNEST(STRING_SPLIT({_NORM_SQL.format(c='text')}, ' '))
               AS term
      FROM documents d
    ), t2 AS (
      SELECT CASE WHEN t.doc_id > c.cut_id THEN 1 ELSE 0 END AS recent,
             t.term
      FROM toks t, cut c WHERE LENGTH(t.term) > 0
    ), counts AS (
      SELECT term,
             CAST(SUM(recent) AS BIGINT) AS n_new,
             CAST(SUM(1 - recent) AS BIGINT) AS n_old
      FROM t2 GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(n_new) AS BIGINT) AS tot_new,
             CAST(SUM(n_old) AS BIGINT) AS tot_old
      FROM counts
    )
    SELECT c.term, c.n_new, c.n_old,
           CAST(c.n_new * t.tot_old AS DOUBLE)
             / CAST((c.n_old + 1) * t.tot_new AS DOUBLE) AS burst
    FROM counts c, tot t
    WHERE c.n_new >= 5
    ORDER BY burst DESC, c.term LIMIT 10
    """,
)
def q_trending_terms(spark, sf_dir):
    """Crawl-drift TRENDING TERMS: the vocabulary overrepresented in
    the NEWEST fifth of the corpus (by ingest id) relative to history —
    burst(t) = (share_new / share_old) with +1 smoothing for unseen
    history, min-support 5. The corpus-drift monitor that catches a
    crawl source going spammy (q_dq_category_drift's idea applied to
    open vocabulary), and the trend half of the q_source_coverage /
    q_text_zipf vocabulary suite.

    Determinism: the burst ratio is ONE IEEE division of exact integer
    cross-products (share ratio multiplied out — the q_term_collocations
    lift discipline); the corpus cut is integer arithmetic on the
    broadcast id bounds.

    Scale shape: one tokenize pass; (recent, term) partial-aggregated
    counts; broadcast 1-row totals; TakeOrdered head. At 100 TB the
    slice flag comes straight from the ingest-time partition column,
    making the cut a partition-pruned scan."""
    docs = read_table(spark, sf_dir, "documents")
    bounds = docs.agg(
        (
            F.max("doc_id")
            - ((F.max("doc_id") - F.min("doc_id")) / 5).cast("bigint")
        ).alias("cut_id")
    )
    toks = (
        docs.crossJoin(F.broadcast(bounds))
        .select(
            F.when(F.col("doc_id") > F.col("cut_id"), 1)
            .otherwise(0)
            .alias("recent"),
            F.explode(tokens(F.col("text"))).alias("term"),
        )
        .filter(F.length("term") > 0)
    )
    counts = toks.groupBy("term").agg(
        F.sum("recent").cast("bigint").alias("n_new"),
        F.sum(1 - F.col("recent")).cast("bigint").alias("n_old"),
    )
    tot = counts.agg(
        F.sum("n_new").cast("bigint").alias("tot_new"),
        F.sum("n_old").cast("bigint").alias("tot_old"),
    )
    return (
        counts.filter(F.col("n_new") >= 5)
        .crossJoin(F.broadcast(tot))
        .select(
            "term",
            "n_new",
            "n_old",
            (
                (F.col("n_new") * F.col("tot_old")).cast("double")
                / ((F.col("n_old") + 1) * F.col("tot_new")).cast("double")
            ).alias("burst"),
        )
        .orderBy(F.desc("burst"), F.asc("term"))
        .limit(10)
    )
