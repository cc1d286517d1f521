"""Round-9 batch 68 (SURVEY.md §2 Tier-B surface parity, continuing
batch 67): four more features of the reference's delegated Postgres
surface (`APP/services/pgliteService.ts:36-49` executes arbitrary SQL,
so the Postgres analytic dialect is the capability the reference
exposes):

- **q_distinct_on** — Postgres's `SELECT DISTINCT ON (k) ... ORDER BY
  k, v DESC` (first row per group under an order): Spark has no
  DISTINCT ON, so the engine side is the canonical row_number()=1
  rewrite — which compiles to WindowGroupLimit (map-side top-1 per
  group BEFORE the shuffle); the oracle is DuckDB's native DISTINCT ON,
  proving the rewrite's semantics.
- **q_agg_filter** — the SQL:2003 aggregate FILTER clause, supported
  natively by BOTH engines since Spark 4 (same SQL text both sides):
  selective counts/sums without self-joins or CASE pyramids — each
  FILTER aggregate stays one partial-aggregated pass.
- **q_string_agg** — ordered string aggregation (Postgres string_agg
  / ISO listagg): Spark 4 `listagg(x, ',') WITHIN GROUP (ORDER BY …)`
  vs DuckDB `string_agg(x, ',' ORDER BY …)`. The aggregated set is
  rank-bounded FIRST (top-3 per group via WindowGroupLimit) — the
  scale-safe form: an unbounded group concat is a driver-sized string
  bomb at 100 TB, a bounded one is O(groups × k).
- **q_percentile_within_group** — the NATIVE ordered-set aggregate `percentile_cont(p)
  WITHIN GROUP (ORDER BY v)` (Spark 4 syntax-native). Engines differ
  in interpolation FORM (Spark: lo + frac·(hi−lo); DuckDB quantile
  interpolates differently in the last ulp), so the oracle replays
  Spark's exact chain — pos = p·(n−1) over integer cents, lo/hi via
  rank windows, one float multiply-add — making the hash gate exact.

Money in ROUND(x*100) BIGINT cents throughout; every group/order has a
unique tie-break (repo exactness rules).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_distinct_on",
    oracle="""
    SELECT DISTINCT ON (c_mktsegment)
           c_mktsegment,
           c_custkey,
           CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
    FROM customer
    ORDER BY c_mktsegment,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) DESC,
             c_custkey
    """,
)
def q_distinct_on(spark, sf_dir):
    """Postgres DISTINCT ON — richest customer per market segment.
    Spark rewrite: row_number()=1 over (segment, balance DESC,
    custkey), which Catalyst compiles to WindowGroupLimit: each map
    task forwards ONE row per segment to the shuffle, so the exchange
    is O(partitions × segments) regardless of table size. The oracle
    is DuckDB's native DISTINCT ON under the identical ORDER BY —
    semantic equivalence of the rewrite is what the hash verifies."""
    c = read_table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_cents"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("bal_cents").desc(), F.col("c_custkey")
    )
    return (
        c.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .orderBy("c_mktsegment")
    )


_FILTER_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
         AS n_finished,
       CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
            FILTER (WHERE o_orderstatus = 'F'), 0) AS BIGINT)
         AS finished_cents,
       CAST(COUNT(*) FILTER (WHERE o_orderdate >= DATE '2024-06-01')
            AS BIGINT) AS n_recent
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q_agg_filter", oracle=_FILTER_SQL)
def q_agg_filter(spark, sf_dir):
    """SQL:2003 aggregate FILTER clause, same SQL text on both engines
    (native in Spark 4 and DuckDB): per-priority totals with selective
    finished/recent sub-aggregates — no self-join, no CASE pyramid.
    Plan: ONE scan, one partial-aggregated exchange; each FILTER
    aggregate is a conditional accumulator inside the same hash
    aggregate, so adding filters never adds passes — exactly what you
    want for a 100 TB fact profile."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_FILTER_SQL)


@query(
    "q_string_agg",
    oracle="""
    WITH top3 AS (
      SELECT c_nationkey, c_custkey, c_name
      FROM (
        SELECT c_nationkey, c_custkey, c_name,
               ROW_NUMBER() OVER (
                 PARTITION BY c_nationkey
                 ORDER BY CAST(ROUND(c_acctbal * 100) AS BIGINT) DESC,
                          c_custkey) AS rn
        FROM customer)
      WHERE rn <= 3
    )
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_listed,
           string_agg(c_name, ',' ORDER BY c_custkey) AS top_names
    FROM top3
    GROUP BY c_nationkey
    ORDER BY nationkey
    """,
)
def q_string_agg(spark, sf_dir):
    """Ordered string aggregation (Postgres string_agg / ISO listagg,
    Spark 4 `listagg ... WITHIN GROUP`): comma list of each nation's
    top-3 customers by balance. The concat input is rank-BOUNDED first
    (WindowGroupLimit top-3 per nation) so the aggregated string is
    O(k·name_len) per group at any table size — the scale-safe form of
    a group concat; an unbounded listagg over 100 TB would be a
    per-group string bomb. Order inside the string is pinned by
    c_custkey on both engines (deterministic bytes, hash-exact)."""
    c = read_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_custkey",
        "c_name",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_cents"),
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("bal_cents").desc(), F.col("c_custkey")
    )
    top3 = c.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 3
    )
    top3.createOrReplaceTempView("__sa_top3")
    return spark.sql(
        """
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_listed,
               listagg(c_name, ',') WITHIN GROUP (ORDER BY c_custkey)
                 AS top_names
        FROM __sa_top3
        GROUP BY c_nationkey
        ORDER BY nationkey
        """
    )


@query(
    "q_percentile_within_group",
    # Interpolation replayed in Spark's exact form — pos = p·(n−1) on
    # the sorted cents, result = lo + frac·(hi−lo) as DOUBLE — because
    # DuckDB's quantile_cont interpolates in a different operand order
    # (last-ulp mismatches on the hash gate).
    oracle="""
    WITH cents AS (
      SELECT c_mktsegment,
             CAST(CAST(ROUND(c_acctbal * 100) AS BIGINT) AS DOUBLE) AS v
      FROM customer
    ), ranked AS (
      SELECT c_mktsegment, v,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY v)
               AS rn,
             COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM cents
    ), pick AS (
      SELECT c_mktsegment, p,
             MAX(CASE WHEN rn - 1 = CAST(FLOOR(p * (n - 1)) AS BIGINT)
                      THEN v END) AS lo,
             MAX(CASE WHEN rn - 1 = LEAST(CAST(FLOOR(p * (n - 1))
                          AS BIGINT) + 1, n - 1)
                      THEN v END) AS hi,
             MAX(p * (n - 1) - FLOOR(p * (n - 1))) AS frac
      FROM ranked
      CROSS JOIN (SELECT UNNEST([0.25, 0.5, 0.75]) AS p)
      GROUP BY c_mktsegment, p
    )
    SELECT c_mktsegment,
           CAST(MAX(CASE WHEN p = 0.25 THEN lo + frac * (hi - lo) END)
                AS DOUBLE) AS p25_cents,
           CAST(MAX(CASE WHEN p = 0.5 THEN lo + frac * (hi - lo) END)
                AS DOUBLE) AS p50_cents,
           CAST(MAX(CASE WHEN p = 0.75 THEN lo + frac * (hi - lo) END)
                AS DOUBLE) AS p75_cents
    FROM pick
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q_percentile_within_group(spark, sf_dir):
    """NATIVE ordered-set aggregate percentile_cont WITHIN GROUP
    (Spark 4 syntax): exact interpolated quartiles of customer balance
    per market segment. Complements q_percentile_cont (extras32.py),
    which pins the MANUAL mirrored formulation on both engines; this
    key exercises the built-in aggregate itself — its WITHIN GROUP
    parse path and its partial-aggregated Percentile plan — on integer cents so the only float operation
    is the final interpolation multiply-add (value-exact inputs ≤ 2^53
    → the chain replicates bit-exact when mirrored). Plan: Spark's
    Percentile aggregate is a partial-aggregated sketchless exact form
    (per-partition value maps merged on the reduce side) — one
    exchange, no global sort."""
    read_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "__pc_customer"
    )
    return spark.sql(
        """
        SELECT c_mktsegment,
               CAST(percentile_cont(0.25) WITHIN GROUP (ORDER BY
                 CAST(CAST(ROUND(c_acctbal * 100) AS BIGINT) AS DOUBLE))
                 AS DOUBLE) AS p25_cents,
               CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY
                 CAST(CAST(ROUND(c_acctbal * 100) AS BIGINT) AS DOUBLE))
                 AS DOUBLE) AS p50_cents,
               CAST(percentile_cont(0.75) WITHIN GROUP (ORDER BY
                 CAST(CAST(ROUND(c_acctbal * 100) AS BIGINT) AS DOUBLE))
                 AS DOUBLE) AS p75_cents
        FROM __pc_customer
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )
