"""Join / sort / set-op queries (SURVEY.md §2.3, §2.6, §2.7, build step 2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.functions.scalar import dec, dsum, ts_str
from self_healing_data_pipeline_spark.operators.relational import (
    asof_join,
    range_join,
    top_k,
)
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_join_inner",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
    """,
)
def q_join_inner(spark, sf_dir):
    """Inner equi-join; AQE picks broadcast (customer is small) vs SMJ."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q_join_outer",
    oracle="""
    SELECT c.c_custkey,
           COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def q_join_outer(spark, sf_dir):
    """Left outer join keeping customers with zero orders (COUNT(col)
    skips the null-extended rows on both engines)."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "q_join_broadcast",
    oracle="""
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           COUNT(*) AS n_suppliers,
           CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY r.r_name, n.n_name
    """,
)
def q_join_broadcast(spark, sf_dir):
    """Star-schema join with explicit broadcast of the tiny dims — no
    shuffle of the fact side; each executor hash-probes local dim copies."""
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            dsum("s_acctbal").alias("total_bal"),
        )
        .orderBy("region_name", "nation_name")
    )


@query(
    "q_join_semi_anti",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_with_orders,
      (SELECT COUNT(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_without_orders
    """,
)
def q_join_semi_anti(spark, sf_dir):
    """LEFT SEMI (EXISTS) and LEFT ANTI (NOT EXISTS) in one result row."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(
        F.count(F.lit(1)).alias("n_with_orders")
    )
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(
        F.count(F.lit(1)).alias("n_without_orders")
    )
    return semi.crossJoin(anti)


@query(
    "q_join_range",
    oracle="""
    SELECT s.s_suppkey,
           COUNT(c.c_custkey) AS n_close_customers
    FROM supplier s
    LEFT JOIN customer c
      ON c.c_acctbal BETWEEN s.s_acctbal - 50 AND s.s_acctbal + 50
    GROUP BY s.s_suppkey
    """,
)
def q_join_range(spark, sf_dir):
    """Non-equi (band) range join via ``operators.relational.range_join``:
    both sides bucketize on floor(acctbal/band_width), the supplier side
    explodes into its bucket and both neighbors, and Catalyst gets an
    EQUI-join (bucket equality + residual BETWEEN) it can shuffle-hash.
    The plain theta-join form plans BroadcastNestedLoopJoin with the
    corpus-growing CUSTOMER side as the build relation — an O(n·m)
    compare and a cluster OOM at real scale; the banded form compares
    each supplier only against the ≤3 buckets that can hold a match.
    LEFT semantics (suppliers with zero close customers) come back via
    a supplier-grain left join onto the banded inner-join counts —
    identical to counting over the outer theta join, because COUNT(c)
    ignores the NULL row a matchless supplier gets there."""
    s = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    c = read_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    cond = c["c_acctbal"].between(s["s_acctbal"] - 50, s["s_acctbal"] + 50)
    matched = range_join(
        s,
        c,
        cond,
        left_value=s["s_acctbal"],
        right_value=c["c_acctbal"],
        band_width=50.0,
    )
    counts = matched.groupBy("s_suppkey").agg(
        F.count("c_custkey").alias("n")
    )
    return (
        s.select("s_suppkey")
        .join(counts, "s_suppkey", "left")
        .select(
            "s_suppkey",
            F.coalesce(F.col("n"), F.lit(0).cast("bigint")).alias(
                "n_close_customers"
            ),
        )
    )


@query(
    "q_join_asof",
    oracle="""
    SELECT p.event_id,
           CAST(STRFTIME((SELECT MAX(c.ts) FROM events c
                           WHERE c.event_type = 'click'
                             AND c.user_id = p.user_id
                             AND c.ts <= p.ts), '%Y-%m-%d %H:%M:%S') AS VARCHAR) AS last_click
    FROM events p WHERE p.event_type = 'purchase'
    """,
)
def q_join_asof(spark, sf_dir):
    """As-of join: attribute each purchase to the user's latest click at or
    before it. Union+window composition — one shuffle on user_id, no
    per-row subquery (the correlated form is the oracle, not the plan)."""
    ev = read_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value_cols=[],
    )
    return joined.select(
        "event_id", ts_str("asof_ts").alias("last_click")
    )


@query(
    "q_sort_multi",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM orders
    ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def q_sort_multi(spark, sf_dir):
    """Multi-key sort (asc/desc mixed) with unique tie-break + limit."""
    return (
        read_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy(
            F.col("o_orderpriority").asc(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
        .limit(100)
    )


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def q_topk(spark, sf_dir):
    """Top-k — Spark plans TakeOrderedAndProject (heap per partition,
    merge of k·partitions rows; no global sort)."""
    return top_k(
        read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        25,
    )


@query(
    "q_set_union",
    oracle="""
    SELECT key_val, src FROM (
      SELECT DISTINCT o_custkey AS key_val, 'orders' AS src FROM orders
      UNION ALL
      SELECT DISTINCT c_custkey AS key_val, 'customer' AS src FROM customer
    )
    """,
)
def q_set_union(spark, sf_dir):
    """UNION ALL (by name) of two conformed projections."""
    o = (
        read_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("key_val"))
        .distinct()
        .withColumn("src", F.lit("orders"))
    )
    c = (
        read_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("key_val"))
        .distinct()
        .withColumn("src", F.lit("customer"))
    )
    return o.unionByName(c)


@query(
    "q_set_intersect",
    oracle="""
    SELECT o_custkey AS key_val FROM orders
    INTERSECT
    SELECT c_custkey FROM customer
    """,
)
def q_set_intersect(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key_val")
    )
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key_val")
    )
    return o.intersect(c)


@query(
    "q_set_except",
    oracle="""
    SELECT c_custkey AS key_val FROM customer
    EXCEPT
    SELECT o_custkey FROM orders
    """,
)
def q_set_except(spark, sf_dir):
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key_val")
    )
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key_val")
    )
    # subtract = set EXCEPT; exceptAll().distinct() is multiset subtraction
    # and keeps left values whose multiplicity merely exceeds the right's.
    return c.subtract(o)
