"""Round-6 batch 18 (SURVEY.md §2.1 SQL surface / §2.9 graph): native
WITH RECURSIVE support — Spark 4 ships SQL-2008 recursive CTEs, and
this batch exercises that surface end-to-end on a real graph workload
(bounded-depth reachability over the shared co-occurrence graph),
oracle-checked against DuckDB evaluating the SAME recursive SQL.

The production form of unbounded reachability remains the manual
per-hop DISTINCT frontier (q_khop_reach — walk counts explode
combinatorially without per-level dedup); this query pins the ENGINE
SURFACE: a user migrating recursive SQL from Postgres/DuckDB can run
it unchanged."""

from __future__ import annotations

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# Recursion bound for the UNION ALL walk below. The walk has NO
# per-level dedup, so walk volume is Σ deg^depth — depth 2 is safe on
# the co-occurrence graph; anything deeper is combinatorial. Guarded by
# the assert below and by tests/test_recursive_depth_guard.py; if you
# need deeper reach, use q_khop_reach (DISTINCT frontier per hop).
_MAX_DEPTH = 2
assert _MAX_DEPTH <= 2, "undeduplicated recursive walk must stay <= 2 hops"

# The co-occurrence graph build (shared policy text with the other
# co-occurrence consumers): pp → cop → undirected adj.
_GRAPH_CTES = """pp AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM {tbl}
    ), cop AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2
      FROM pp a JOIN pp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )"""

_ADJ_BODY = """SELECT p1 AS u, p2 AS v FROM cop
    UNION ALL
    SELECT p2 AS u, p1 AS v FROM cop"""

_GRAPH_SQL = "WITH " + _GRAPH_CTES + "\n    " + _ADJ_BODY

# The recursion itself, over an adjacency relation {adj}: seeds →
# bounded UNION ALL walk → min-depth rollup. SAME text both engines.
_REACH_SQL = """
    WITH RECURSIVE seeds AS (
      SELECT node FROM (SELECT DISTINCT u AS node FROM {adj})
      ORDER BY node LIMIT 3
    ), reach(node, depth) AS (
      SELECT node, 0 FROM seeds
      UNION ALL
      SELECT a.v, r.depth + 1
      FROM reach r JOIN {adj} a ON a.u = r.node
      WHERE r.depth < {max_depth}
    ), md AS (
      SELECT node, MIN(depth) AS d FROM reach GROUP BY node
    )
    SELECT CAST(d AS BIGINT) AS depth,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(SUM(node) AS BIGINT) AS node_checksum
    FROM md GROUP BY d ORDER BY depth
"""

# Oracle: the same two texts composed as sibling CTEs in one statement
# (DuckDB materializes non-recursive CTEs once, so the build can stay
# inline there).
_RCTE_ORACLE = (
    "WITH RECURSIVE "
    + _GRAPH_CTES.format(tbl="lineitem")
    + ", adj AS (\n    "
    + _ADJ_BODY
    + "\n    )"
    + _REACH_SQL.format(adj="adj", max_depth=_MAX_DEPTH).replace(
        "WITH RECURSIVE", ","
    )
)


@query("q_recursive_reach", oracle=_RCTE_ORACLE)
def q_recursive_reach(spark, sf_dir):
    """Native WITH RECURSIVE reachability: 2-hop reach from the three
    smallest co-occurrence-graph nodes, written as a SQL-2008
    recursive CTE and executed by Spark 4's recursive-CTE engine —
    the SAME SQL text DuckDB evaluates as the oracle (only the
    relation name differs). Per min-depth: node count + id checksum.

    Why both forms exist: the recursive UNION ALL walk has no
    per-level dedup, so walk volume is Σ deg^depth — fine at the
    depth-2 bound here, combinatorial beyond it; q_khop_reach's
    manual frontier loop with DISTINCT per hop is the 100 TB form.
    This query pins SURFACE PARITY (recursive SQL ports unchanged)
    and the correctness of Spark's recursion against an independent
    engine.

    Scale shape: each recursion level is one keyed join against the
    adjacency (Catalyst plans it like the manual loop); the depth
    bound is in the WHERE, so the loop terminates without a global
    dedup barrier. The GRAPH BUILD is materialized ONCE
    (localCheckpoint, per-invocation — no cross-run cache) before the
    recursion: Spark's recursive-CTE engine re-evaluates the anchor's
    upstream plan at every level, so an inline build re-ran the
    600k-row pp distinct + cop self-join 3× (measured ~7.5 s; the
    build alone is ~2 s) — the checkpoint makes each level join a
    materialized 2·|edges| relation instead (round-10 bench-tail
    trim; results and the single-statement oracle are byte-identical,
    and at 100 TB you would stage the adjacency exactly once too)."""
    from self_healing_data_pipeline_spark.operators.graph import (
        co_order_edges,
    )
    from pyspark.sql import functions as F

    li = read_table(spark, sf_dir, "lineitem")
    # Graph build via the shared basket-form builder (round 13 —
    # co_order_edges is the one Spark definition of the cop CTE, two
    # exchanges and no self-join); the RECURSION below stays the same
    # SQL text both engines evaluate, which is the surface this key
    # pins. _GRAPH_SQL remains the build's SQL statement of record
    # (the oracle composes the identical CTE text).
    e = co_order_edges(li)
    adj = (
        e.select(F.col("p1").alias("u"), F.col("p2").alias("v"))
        .unionAll(e.select(F.col("p2").alias("u"), F.col("p1").alias("v")))
        .localCheckpoint(eager=True)
    )
    adj.createOrReplaceTempView("adj_rcte")
    return spark.sql(
        _REACH_SQL.format(adj="adj_rcte", max_depth=_MAX_DEPTH)
    )
