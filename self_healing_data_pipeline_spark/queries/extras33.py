"""Round-6 batch 15 (SURVEY.md §2.11 similarity / §2.9 analytics):
SPARSE-VECTOR SIMILARITY JOIN through the inverted index (integer
tf·idf-weighted dot products over shared RARE terms — the lexical
near-dup/related-docs op that scales by posting-list join, not
all-pairs) and a CUSTOMER SEGMENT MIGRATION matrix (period-over-period
spend-tercile transitions — the CRM staple behind churn/upgrade
reporting), with the tercile ranks computed by the TWO-PHASE bucketed
rank (no per-period serialized window)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.operators.dedup import (
    NORMALIZE_TEXT_SQL as _NORM_SQL,
)
from self_healing_data_pipeline_spark.operators.text import tokens
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# Rare-term cap: only terms with df <= _DF_CAP join docs pairwise, so
# candidate volume is Σ_rare df² — the sparse-join boundedness knob
# (common terms carry no similarity signal and explode the join).
_DF_CAP = 50


@query(
    "q_sparse_dot_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, UNNEST(STRING_SPLIT({_NORM_SQL.format(c='text')}, ' '))
               AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
      WHERE LENGTH(term) > 0 GROUP BY 1, 2
    ), df AS (
      SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
    ), nd AS (
      SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM tf
    ), rare AS (
      SELECT d.term, (SELECT n FROM nd) // d.df AS w
      FROM df d WHERE d.df <= {_DF_CAP}
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(SUM(a.tf * b.tf * r.w) AS BIGINT) AS score,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM tf a
      JOIN tf b ON a.term = b.term AND a.doc_id < b.doc_id
      JOIN rare r ON a.term = r.term
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, score, n_shared
    FROM pairs ORDER BY score DESC, doc_a, doc_b LIMIT 20
    """,
)
def q_sparse_dot_topk(spark, sf_dir):
    """SPARSE SIMILARITY JOIN via the inverted index: top-20 related
    document pairs by INTEGER-WEIGHTED sparse dot product
    Σ_t tf_a·tf_b·(N//df_t) over shared RARE terms (df <= 50) — the
    posting-list formulation of tf-idf document similarity. Rare-term
    restriction is the boundedness contract: candidate pairs are
    Σ_rare df², never |docs|², and common terms (which carry no
    signal) never join.

    Determinism: weights are integer floor-divided idf, the score is
    an exact integer SUM — no float accumulation order to disagree on
    (the float tf-idf·cosine variant is q_text_tfidf_top's territory;
    here exactness buys a hash-stable oracle). Total (score, a, b)
    tie-break.

    Scale shape: one tokenize pass → (doc, term) tf grain; df on the
    term key; the pair join shuffles postings by TERM (bounded lists);
    pair scores partial-aggregate; TakeOrderedAndProject head."""
    docs = read_table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
        .filter(F.length("term") > 0)
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    nd = tf.agg(F.count_distinct(F.col("doc_id")).cast("bigint").alias("n"))
    rare = (
        df.filter(F.col("df") <= _DF_CAP)
        .crossJoin(F.broadcast(nd))
        .select(
            "term",
            ((F.col("n") - F.pmod(F.col("n"), F.col("df"))) / F.col("df"))
            .cast("bigint")
            .alias("w"),
        )
    )
    a = tf.select(F.col("doc_id").alias("doc_a"), "term", F.col("tf").alias("tf_a"))
    b = tf.select(F.col("doc_id").alias("doc_b"), "term", F.col("tf").alias("tf_b"))
    pairs = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .join(rare, "term")
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(F.col("tf_a") * F.col("tf_b") * F.col("w"))
            .cast("bigint")
            .alias("score"),
            F.count(F.lit(1)).cast("bigint").alias("n_shared"),
        )
    )
    return pairs.orderBy(
        F.desc("score"), F.asc("doc_a"), F.asc("doc_b")
    ).limit(20)


@query(
    "q_segment_migration",
    oracle="""
    WITH spend AS (
      SELECT YEAR(o_orderdate) AS yr, o_custkey AS ck,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders WHERE YEAR(o_orderdate) IN (1996, 1997)
      GROUP BY 1, 2
    ), ranked AS (
      SELECT yr, ck, cents,
             ROW_NUMBER() OVER (PARTITION BY yr ORDER BY cents, ck) AS rn,
             COUNT(*) OVER (PARTITION BY yr) AS n
      FROM spend
    ), seg AS (
      SELECT yr, ck, 3 * (rn - 1) // n + 1 AS tercile FROM ranked
    )
    SELECT COALESCE(a.tercile, 0) AS seg_1996,
           COALESCE(b.tercile, 0) AS seg_1997,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM (SELECT ck, tercile FROM seg WHERE yr = 1996) a
    FULL OUTER JOIN (SELECT ck, tercile FROM seg WHERE yr = 1997) b
      ON a.ck = b.ck
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def q_segment_migration(spark, sf_dir):
    """SEGMENT MIGRATION matrix: every customer's spend TERCILE in
    1996 vs 1997 (0 = absent that year), counted into the 4×4
    transition matrix — the churn/upgrade report behind CRM reviews
    (diagonal = stable, below = downgraded, 0-row/column =
    acquired/churned).

    Terciles are exact rank thirds (3·(rank−1)//n + 1, integer
    arithmetic, (cents, custkey) total order). The per-period rank
    does NOT use a per-period global window (2 periods would
    serialize at 100× — the r4-verdict class): it is the TWO-PHASE
    bucketed rank — spend megabuckets (cents >> 16) → per-(period,
    bucket) counts → cumulative offsets over the tiny bucket grain →
    narrow in-bucket rank + offset.

    Scale shape: customer-grain spend collapse (one keyed shuffle),
    two-phase rank (partitioned windows only), full-outer key join of
    two customer-grain frames, bounded 16-cell rollup. The offsets /
    totals broadcasts KEEP their hints: (yr, cents>>16) is a value-
    domain grain — 2 fixed years × a spend-bucket count that saturates
    because per-customer yearly spend does not grow with SF — audited
    in tools/broadcast_census.py::BOUNDED_BUILD with decade evidence."""
    o = read_table(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    spend = (
        o.filter(yr.isin(1996, 1997))
        .groupBy(yr.alias("yr"), F.col("o_custkey").alias("ck"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    # Two-phase rank: bucket by spend high bits (order-preserving),
    # offsets = customers in lower buckets, rank = offset + in-bucket rn.
    bk = F.shiftright(F.col("cents"), 16)
    s2 = spend.withColumn("bk", bk)
    sub = s2.groupBy("yr", "bk").agg(F.count(F.lit(1)).alias("bn"))
    wprev = (
        Window.partitionBy("yr")
        .orderBy("bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sub.select(
        "yr", "bk", F.coalesce(F.sum("bn").over(wprev), F.lit(0)).alias("off")
    )
    totals = spend.groupBy("yr").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    win = Window.partitionBy("yr", "bk").orderBy("cents", "ck")
    ranked = (
        s2.join(F.broadcast(offsets), ["yr", "bk"])
        .withColumn("rn", F.col("off") + F.row_number().over(win))
        .join(F.broadcast(totals), "yr")
    )
    num = 3 * (F.col("rn") - 1)
    tercile = ((num - F.pmod(num, F.col("n"))) / F.col("n")).cast(
        "bigint"
    ) + 1
    seg = ranked.select("yr", "ck", tercile.alias("tercile"))
    a = seg.filter(F.col("yr") == 1996).select(
        "ck", F.col("tercile").alias("t96")
    )
    b = seg.filter(F.col("yr") == 1997).select(
        "ck", F.col("tercile").alias("t97")
    )
    return (
        a.join(b, "ck", "full_outer")
        .groupBy(
            F.coalesce(F.col("t96"), F.lit(0)).cast("bigint").alias("seg_1996"),
            F.coalesce(F.col("t97"), F.lit(0)).cast("bigint").alias("seg_1997"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
        .orderBy("seg_1996", "seg_1997")
    )
