"""Round-6 batch 47 (SURVEY.md §2.9 analytics / §2.11 corpus): PRICE
RELATIVES (per-brand monthly unit-price index against a fixed base
month — the price-tracking table behind inflation/repricing dashboards,
kept per-brand so every number is a ratio of exact sums, never a
cross-brand float accumulation) and WORD BURSTINESS (variance-to-mean
ratio of per-document counts for the corpus's top terms — the
dispersion statistic that separates topical words, which cluster in
few docs, from function words spread evenly; a standard corpus-QC
signal next to Zipf and TF-IDF).

Exactness: unit prices divide exact cent/quantity sums; burstiness
uses exact integer raw moments (Σc, Σc², n) per word, so the VMR is a
fixed-order float chain over three exact integers."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

_TOP_WORDS = 30


@query(
    "q_price_relatives",
    oracle="""
    WITH cell AS (
      SELECT p.p_brand AS brand,
             STRFTIME(l.l_shipdate, '%Y-%m') AS month,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents,
             CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ), base AS (
      SELECT brand, MIN(month) AS base_month FROM cell GROUP BY 1
    )
    SELECT c.brand, c.month,
           CAST(c.cents AS DOUBLE) / CAST(c.qty AS DOUBLE) AS unit_cents,
           CAST(b0.cents AS DOUBLE) / CAST(b0.qty AS DOUBLE)
             AS base_unit_cents,
           (CAST(c.cents AS DOUBLE) / CAST(c.qty AS DOUBLE))
             / (CAST(b0.cents AS DOUBLE) / CAST(b0.qty AS DOUBLE))
             AS price_relative
    FROM cell c
    JOIN base b ON c.brand = b.brand
    JOIN cell b0 ON b0.brand = b.brand AND b0.month = b.base_month
    ORDER BY c.brand, c.month
    """,
)
def q_price_relatives(spark, sf_dir):
    """PRICE RELATIVES: per brand and month, the quantity-weighted
    unit price (exact cent and quantity sums divided once) and its
    ratio to the brand's FIRST observed month — the per-brand price
    index a repricing dashboard plots. Deliberately per-brand: a
    cross-brand Laspeyres sum would accumulate floats across rows in
    engine-dependent order, while every number here is a ratio of two
    exact integer sums (the aggregate-then-divide discipline used
    throughout the repo for money).

    Scale shape: one fact ⋈ broadcast-dim join into a (brand, month)
    cell aggregate — the cell grain (~25 brands × ~84 months) bounds
    everything after it: the base-month lookup is a MIN per brand and
    a same-grain join-back, both on the tiny cell table."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cell = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.date_format("l_shipdate", "yyyy-MM").alias("month"),
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents"),
            F.sum(F.round(F.col("l_quantity")).cast("bigint"))
            .cast("bigint")
            .alias("qty"),
        )
    )
    base = cell.groupBy("brand").agg(F.min("month").alias("base_month"))
    b0 = cell.select(
        F.col("brand").alias("b2"),
        F.col("month").alias("m2"),
        F.col("cents").alias("base_cents"),
        F.col("qty").alias("base_qty"),
    )
    unit = F.col("cents").cast("double") / F.col("qty").cast("double")
    base_unit = F.col("base_cents").cast("double") / F.col("base_qty").cast(
        "double"
    )
    return (
        cell.join(F.broadcast(base), "brand")
        .join(
            F.broadcast(b0),
            (F.col("brand") == F.col("b2"))
            & (F.col("base_month") == F.col("m2")),
        )
        .select(
            "brand",
            "month",
            unit.alias("unit_cents"),
            base_unit.alias("base_unit_cents"),
            (unit / base_unit).alias("price_relative"),
        )
        .orderBy("brand", "month")
    )


@query(
    "q_word_burstiness",
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
    SELECT w AS word, s1 AS n_occurrences, df AS n_docs_with,
           (CAST(s2 AS DOUBLE) / CAST(n.n_docs AS DOUBLE)
            - (CAST(s1 AS DOUBLE) / CAST(n.n_docs AS DOUBLE))
              * (CAST(s1 AS DOUBLE) / CAST(n.n_docs AS DOUBLE)))
           / (CAST(s1 AS DOUBLE) / CAST(n.n_docs AS DOUBLE)) AS burstiness
    FROM moments CROSS JOIN n
    ORDER BY s1 DESC, w LIMIT {_TOP_WORDS}
    """,
)
def q_word_burstiness(spark, sf_dir):
    """WORD BURSTINESS: for the corpus's top-30 terms, the
    variance-to-mean ratio (VMR) of per-document counts over ALL
    documents (absences count as zero — handled in closed form:
    with Σc and Σc² over docs that contain the word, mean = Σc/N and
    E[c²] = Σc²/N over the full corpus of N docs). VMR ≈ 1 is
    Poisson scatter (function words); VMR ≫ 1 is bursty/topical —
    the Church-Gale dispersion signal used for stopword discovery
    and keyword weighting next to q_text_zipf / q_text_tfidf_top.

    Scale shape: token explode → (word, doc) count grain → word-grain
    exact integer raw moments (Σc, Σc², df) — two partial-aggregated
    passes, no window; N broadcasts as a 1-row scalar and the VMR is
    a fixed-order float chain per word row. Top-30 by exact total
    count with the word as tie-break (TakeOrderedAndProject)."""
    from self_healing_data_pipeline_spark.operators.dedup import normalize_text

    docs = read_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(normalize_text("text"), " ")).alias("w"),
    )
    n = toks.agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs")
    )
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
        .select(
            F.col("w").alias("word"),
            F.col("s1").alias("n_occurrences"),
            F.col("df").alias("n_docs_with"),
            ((ex2 - mean * mean) / mean).alias("burstiness"),
        )
        .orderBy(F.col("n_occurrences").desc(), "word")
        .limit(_TOP_WORDS)
    )
