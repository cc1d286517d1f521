"""Round-6 batch 45 (SURVEY.md §2.1 storage / §2.9 graph): SORT-KEY
WHAT-IF advisor (for each candidate sort key, the EXACT run count a
target column would have if pages were rewritten sorted by that key —
the closed form count(distinct (page, key, value)), no actual sort
needed) and the CO-PURCHASE DEGREE DISTRIBUTION (log2-bucketed degree
histogram of the part co-occurrence graph — the structural summary
that predicts which graph ops blow up).

Exactness: run counts and degrees are exact integers; the only
doubles are final mirrored ratios."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# Same page model as q_encoding_advisor / q_compaction_bins.
_PG_SQL = (
    "STRFTIME(l_shipdate, '%Y-%m') || '/' || CAST(l_orderkey % 8 AS VARCHAR)"
)
# Candidate sort keys evaluated for the rounded-quantity target column.
_CANDIDATES = ("l_returnflag", "l_linestatus", "l_shipdate")


def _whatif_oracle() -> str:
    branches = []
    for k in _CANDIDATES:
        kv = f"CAST({k} AS VARCHAR)"
        branches.append(
            f"""
    SELECT '{k}' AS sort_key,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           CAST(COUNT(DISTINCT (pg, {kv}, v)) AS BIGINT) AS n_runs,
           CAST(COUNT(*) AS DOUBLE)
             / CAST(COUNT(DISTINCT (pg, {kv}, v)) AS DOUBLE) AS avg_run_len
    FROM (
      SELECT {_PG_SQL} AS pg, {kv} AS k,
             CAST(ROUND(l_quantity) AS BIGINT) AS v,
             l_returnflag, l_linestatus, l_shipdate
      FROM lineitem
    )"""
        )
    return " UNION ALL ".join(branches) + " ORDER BY sort_key"


@query("q_sort_key_whatif", oracle=_whatif_oracle())
def q_sort_key_whatif(spark, sf_dir):
    """SORT-KEY WHAT-IF: for each candidate sort key, the exact RLE
    run count the rounded-quantity column would have if every page
    were rewritten sorted by (key, value) — without sorting anything,
    because after such a sort equal (page, key, value) rows are
    adjacent, so runs = COUNT(DISTINCT (page, key, value)). This is
    the second half of the layout service q_encoding_advisor starts:
    the advisor measures runs under the CURRENT order; this predicts
    runs under each candidate REWRITE, so "re-sort by returnflag
    halves the run count" is a query, not an experiment.

    Scale shape: one distinct-count aggregate per candidate (columns
    widen the union, not the data path); no window, no sort, no
    shuffle beyond the distinct's partial aggregation. The closed
    form is exact — not an estimate."""
    li = read_table(spark, sf_dir, "lineitem")
    pg = F.concat(
        F.date_format("l_shipdate", "yyyy-MM"),
        F.lit("/"),
        (F.col("l_orderkey") % 8).cast("string"),
    )
    base = li.select(
        pg.alias("pg"),
        F.round(F.col("l_quantity")).cast("bigint").alias("v"),
        F.col("l_returnflag").cast("string").alias("l_returnflag"),
        F.col("l_linestatus").cast("string").alias("l_linestatus"),
        F.col("l_shipdate").cast("string").alias("l_shipdate"),
    )
    outs = []
    for k in _CANDIDATES:
        stats = base.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_values"),
            F.countDistinct("pg", k, "v").cast("bigint").alias("n_runs"),
        )
        outs.append(
            stats.select(
                F.lit(k).alias("sort_key"),
                "n_values",
                "n_runs",
                (
                    F.col("n_values").cast("double")
                    / F.col("n_runs").cast("double")
                ).alias("avg_run_len"),
            )
        )
    out = outs[0]
    for x in outs[1:]:
        out = out.unionAll(x)
    return out.orderBy("sort_key")


@query(
    "q_degree_distribution",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ), und AS (
      SELECT p1 AS p, p2 AS q FROM pairs
      UNION ALL
      SELECT p2 AS p, p1 AS q FROM pairs
    ), deg AS (
      SELECT p, CAST(COUNT(*) AS BIGINT) AS degree FROM und GROUP BY p
    )
    SELECT CAST(FLOOR(LOG2(degree)) AS BIGINT) AS degree_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(MIN(degree) AS BIGINT) AS min_degree,
           CAST(MAX(degree) AS BIGINT) AS max_degree,
           CAST(SUM(degree) AS BIGINT) AS total_edges_x2
    FROM deg GROUP BY 1 ORDER BY degree_bucket
    """,
)
def q_degree_distribution(spark, sf_dir):
    """CO-PURCHASE DEGREE DISTRIBUTION: each part's degree in the
    "bought in the same order" graph, bucketed by floor(log2(degree))
    — the one-page structural summary (is the graph bounded-degree or
    scale-free?) read before running q_part_triangles /
    q_label_propagation / q_pagerank, because a heavy-tail bucket is
    exactly where triangle counting and message passing blow up.

    Scale shape: the pair join is per-order (bounded by basket size,
    the q_basket_pairs bound — never all-pairs across orders);
    distinct edges collapse at the pair grain, degrees at the part
    grain, and the histogram at the log-bucket grain (≤ ~20 rows).
    log2 of an exact integer is deterministic on both engines;
    bucket boundaries are exact because floor(log2(2^k)) is exact in
    IEEE for all representable degrees."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    b = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("p2")
    )
    pairs = (
        li.join(b, (li.l_orderkey == b.ok2) & (li.l_partkey < b.p2))
        .select(F.col("l_partkey").alias("p1"), "p2")
        .distinct()
        # both union directions read the pair set: materialize the
        # basket self-join ONCE (round-11 lineage-truncation convention
        # — AQE defeats ReuseExchange on these duplicate subtrees)
        .localCheckpoint(eager=True)
    )
    und = pairs.select(F.col("p1").alias("p")).unionAll(
        pairs.select(F.col("p2").alias("p"))
    )
    deg = und.groupBy("p").agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    return (
        deg.groupBy(
            F.floor(F.log2("degree")).cast("bigint").alias("degree_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.min("degree").cast("bigint").alias("min_degree"),
            F.max("degree").cast("bigint").alias("max_degree"),
            F.sum("degree").cast("bigint").alias("total_edges_x2"),
        )
        .orderBy("degree_bucket")
    )
