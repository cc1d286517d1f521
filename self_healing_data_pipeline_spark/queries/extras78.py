"""Round-8 batch 61 (SURVEY.md §2.5 / §2.7 operator-surface
completions): the remaining distribution window functions
(CUME_DIST / PERCENT_RANK, NTILE), the multiset set operations
(INTERSECT ALL / EXCEPT ALL — §2.7 shipped only the DISTINCT forms),
positional explode (POSEXPLODE — §2.8 shipped explode without
ordinality), and the null-safe equi-join (`<=>` / IS NOT DISTINCT
FROM — the §2.3 join family's last comparison operator).

Exactness: distribution windows are single IEEE divisions of exact
integer ranks under a UNIQUE composite order (no peer groups, so
cross-engine tie semantics can't bite); everything else is integers
and fixture values.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_window_cume_dist",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal,
           CUME_DIST() OVER w AS cume,
           PERCENT_RANK() OVER w AS pct_rank
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    ORDER BY c_mktsegment, c_acctbal, c_custkey
    LIMIT 200
    """,
)
def q_window_cume_dist(spark, sf_dir):
    """CUME_DIST + PERCENT_RANK per market segment — the §2.5
    distribution windows (rank/dense_rank/row_number landed round 1).
    The (balance, key) order is unique, so both are single IEEE
    divisions of exact integer ranks: rows≤current / n and
    (rank−1)/(n−1) — bit-exact cross-engine.

    Scale shape: ONE window exchange hash-partitioned by segment (both
    functions share the window), top-200 via the total order."""
    c = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.asc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.cume_dist().over(w).alias("cume"),
            F.percent_rank().over(w).alias("pct_rank"),
        )
        .orderBy("c_mktsegment", "c_acctbal", "c_custkey")
        .limit(200)
    )


@query(
    "q_window_ntile",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           NTILE(4) OVER (PARTITION BY o_custkey % 10
                          ORDER BY o_totalprice, o_orderkey) AS quartile
    FROM orders
    WHERE o_orderkey % 37 = 0
    ORDER BY o_custkey % 10, o_totalprice, o_orderkey
    LIMIT 200
    """,
)
def q_window_ntile(spark, sf_dir):
    """NTILE(4) bucket assignment — the remaining §2.5 ranking window.
    Both engines implement the SQL-standard tile rule (the first
    n mod 4 tiles get the extra row), and the (price, key) order is
    unique, so the integer tile labels replicate exactly."""
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 37 == 0
    )
    w = Window.partitionBy(F.col("o_custkey") % 10).orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy(F.col("o_custkey") % 10, "o_totalprice", "o_orderkey")
        .limit(200)
    )


_SET_A = "SELECT l_suppkey FROM lineitem WHERE l_suppkey % 7 = 0 AND l_quantity <= 10"
_SET_B = "SELECT l_suppkey FROM lineitem WHERE l_suppkey % 7 = 0 AND l_quantity >= 8"


@query(
    "q_set_intersect_all",
    oracle=f"""
    SELECT l_suppkey FROM ({_SET_A})
    INTERSECT ALL
    SELECT l_suppkey FROM ({_SET_B})
    ORDER BY l_suppkey
    """,
)
def q_set_intersect_all(spark, sf_dir):
    """INTERSECT ALL — multiset intersection keeping min(multiplicity)
    copies per value (§2.7 shipped only the DISTINCT form; a migrating
    SQL user's dedup-pair audits rely on the ALL semantics). The two
    sides deliberately overlap (quantity ranges [_,10] and [8,_]) so
    multiplicities differ per supplier.

    Scale shape: Spark plans intersectAll as one aggregate per side on
    the value + a join on (value, count) — shuffles carry the 8-byte
    key only, never rows."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_suppkey") % 7 == 0
    )
    a = li.filter(F.col("l_quantity") <= 10).select("l_suppkey")
    b = li.filter(F.col("l_quantity") >= 8).select("l_suppkey")
    return a.intersectAll(b).orderBy("l_suppkey")


@query(
    "q_set_except_all",
    oracle=f"""
    SELECT l_suppkey FROM ({_SET_A})
    EXCEPT ALL
    SELECT l_suppkey FROM (
      SELECT l_suppkey FROM lineitem
      WHERE l_suppkey % 7 = 0 AND l_quantity BETWEEN 8 AND 12
    )
    ORDER BY l_suppkey
    """,
)
def q_set_except_all(spark, sf_dir):
    """EXCEPT ALL — multiset difference keeping max(0, m_a − m_b)
    copies per value; the ALL twin of §2.7's EXCEPT. The right side is
    a NARROWER quantity band than the left (5 quantity values vs 10),
    so per-supplier multiplicities genuinely differ in both directions
    and the difference is non-empty — a right side that dominates
    everywhere would make the key zero-signal."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_suppkey") % 7 == 0
    )
    a = li.filter(F.col("l_quantity") <= 10).select("l_suppkey")
    b = li.filter(F.col("l_quantity").between(8, 12)).select("l_suppkey")
    return a.exceptAll(b).orderBy("l_suppkey")


@query(
    "q_explode_pos",
    oracle="""
    SELECT d.doc_id,
           CAST(s.i - 1 AS INT) AS pos,
           d.words[s.i] AS word
    FROM (SELECT doc_id, str_split(text, ' ') AS words
          FROM documents WHERE doc_id % 50 = 0) d
    CROSS JOIN (SELECT UNNEST(range(1, 9)) AS i) s
    WHERE s.i <= len(d.words)
    ORDER BY doc_id, pos
    """,
)
def q_explode_pos(spark, sf_dir):
    """POSEXPLODE — ordinality-preserving explode (§2.8 shipped plain
    explode): the first 8 tokens of every 50th document with their
    0-based positions, the shape tokenizer pipelines use when token
    ORDER carries meaning (context packing, n-gram windows).

    Scale shape: narrow row-local transform — slice bounds the fan-out
    to 8 rows per doc before the explode, no shuffle at all."""
    d = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 50 == 0
    )
    return (
        d.select(
            "doc_id",
            F.posexplode(F.slice(F.split(F.col("text"), " "), 1, 8)).alias(
                "pos", "word"
            ),
        )
        .orderBy("doc_id", "pos")
    )


@query(
    "q_join_null_safe",
    oracle="""
    WITH a AS (
      SELECT NULLIF(o_custkey % 100, 0) AS k,
             CAST(COUNT(*) AS BIGINT) AS a_n
      FROM orders GROUP BY 1
    ), b AS (
      SELECT NULLIF(c_custkey % 100, 0) AS k,
             CAST(COUNT(*) AS BIGINT) AS b_n
      FROM customer GROUP BY 1
    )
    SELECT a.k AS k, a.a_n AS a_n, b.b_n AS b_n
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    ORDER BY k NULLS FIRST
    """,
)
def q_join_null_safe(spark, sf_dir):
    """NULL-SAFE equi-join (`<=>` / IS NOT DISTINCT FROM) — the §2.3
    join family's last comparison operator: NULL keys MATCH each other
    instead of vanishing, the semantics needed when a bucketing key is
    legitimately absent. Both sides pre-aggregate to key grain first,
    so the NULL group joins 1:1 — the scale-safe form (joining raw
    rows null-safely would cross-product the NULL populations).

    Scale shape: two partial-aggregate passes to ≤101-row frames, then
    a broadcast-sized null-safe join."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    a = o.groupBy(
        F.nullif(F.col("o_custkey") % 100, F.lit(0)).alias("k")
    ).agg(F.count(F.lit(1)).alias("a_n"))
    b = c.groupBy(
        F.nullif(F.col("c_custkey") % 100, F.lit(0)).alias("k")
    ).agg(F.count(F.lit(1)).alias("b_n"))
    return (
        a.join(b, a["k"].eqNullSafe(b["k"]))
        .select(a["k"].alias("k"), "a_n", "b_n")
        .orderBy(F.asc_nulls_first("k"))
    )
