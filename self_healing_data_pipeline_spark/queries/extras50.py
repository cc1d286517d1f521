"""Round-6 batch 32 (SURVEY.md §2.4 ML-eval / graph): exact ROC-AUC
(tie-corrected Mann-Whitney, computed at value grain with NO global
sort — the classifier-quality gate a training pipeline runs on every
scored snapshot) and SYNCHRONOUS LABEL PROPAGATION (3 rounds of
min-label community detection on the co-order part graph — the
clustering coarser and faster than connected components when only a
bounded number of rounds is affordable).

Exactness: AUC's U statistic accumulates in HALF-UNITS (×2 so tie
midpoints stay integral) — the verdict is exact integer arithmetic
with one final mirrored IEEE division; label propagation is pure
integer min over a fixed unrolled round count, identical in both
engines by induction."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.operators.graph import (
    CO_PAIR_CTE_SQL,
    co_order_edges,
)
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# Value-band width for the two-phase prefix sum over score grain.
_AUC_SHIFT = 20

# Synchronous min-label rounds (unrolled identically in both engines).
_LP_ROUNDS = 3


@query(
    "q_roc_auc",
    oracle="""
    WITH s AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS score,
             (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS pos
      FROM orders
    ), v AS (
      SELECT score,
             CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np,
             CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS nn
      FROM s GROUP BY 1
    ), c AS (
      SELECT score, np, nn,
             SUM(nn) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW) - nn AS neg_below
      FROM v
    ), agg AS (
      SELECT CAST(SUM(np * (2 * neg_below + nn)) AS BIGINT) AS u2,
             CAST(SUM(np) AS BIGINT) AS n_pos,
             CAST(SUM(nn) AS BIGINT) AS n_neg
      FROM c
    )
    SELECT n_pos, n_neg, u2,
           CAST(u2 AS DOUBLE)
             / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) AS auc
    FROM agg
    """,
)
def q_roc_auc(spark, sf_dir):
    """EXACT ROC-AUC of "does order value predict urgent/high
    priority": the tie-corrected Mann-Whitney statistic AUC =
    Σ_v np_v·(neg_below_v + nn_v/2) / (nP·nN), accumulated in
    half-units (u2 = 2U stays integral through tie midpoints) — the
    eval gate for any scored binary label, computed exactly rather
    than from a sampled curve.

    Scale shape: collapse to VALUE GRAIN first (one partial-aggregated
    groupBy — |values| ≤ |rows|, usually ≪), then the negatives-below
    prefix sum runs TWO-PHASE over value bands (superband offsets +
    narrow in-band window, the q_ks_drift / q_gini_concentration
    pattern) — no global-order sort of anything row-grain, no
    SinglePartition on the data path. The oracle keeps the plain
    single-window formulation."""
    orders = read_table(spark, sf_dir, "orders")
    s = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("score"),
        F.col("o_orderpriority")
        .isin("1-URGENT", "2-HIGH")
        .alias("pos"),
    )
    v = s.groupBy("score").agg(
        F.sum(F.when(F.col("pos"), 1).otherwise(0))
        .cast("bigint")
        .alias("np"),
        F.sum(F.when(F.col("pos"), 0).otherwise(1))
        .cast("bigint")
        .alias("nn"),
    ).withColumn("band", F.shiftright(F.col("score"), _AUC_SHIFT))
    bands = v.groupBy("band").agg(F.sum("nn").alias("bn"))
    wb = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = bands.select(
        "band", (F.sum("bn").over(wb) - F.col("bn")).alias("off")
    )
    ww = (
        Window.partitionBy("band")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = v.join(offsets, "band").select(
        "np",
        "nn",
        (F.col("off") + F.sum("nn").over(ww) - F.col("nn")).alias(
            "neg_below"
        ),
    )
    agg = c.agg(
        F.sum(F.col("np") * (2 * F.col("neg_below") + F.col("nn")))
        .cast("bigint")
        .alias("u2"),
        F.sum("np").cast("bigint").alias("n_pos"),
        F.sum("nn").cast("bigint").alias("n_neg"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        "u2",
        (
            F.col("u2").cast("double")
            / (
                F.lit(2.0)
                * F.col("n_pos").cast("double")
                * F.col("n_neg").cast("double")
            )
        ).alias("auc"),
    )


def _lp_oracle() -> str:
    rounds = []
    prev = "l0"
    for r in range(1, _LP_ROUNDS + 1):
        rounds.append(
            f"""l{r} AS (
      SELECT n.node, LEAST(n.label, COALESCE(MIN(m.label), n.label))
               AS label
      FROM {prev} n
      LEFT JOIN adj e ON e.u = n.node
      LEFT JOIN {prev} m ON m.node = e.v
      GROUP BY n.node, n.label
    )"""
        )
        prev = f"l{r}"
    return f"""
    WITH {CO_PAIR_CTE_SQL}, adj AS (
      SELECT p1 AS u, p2 AS v FROM cop
      UNION ALL
      SELECT p2 AS u, p1 AS v FROM cop
    ), nodes AS (
      SELECT DISTINCT u AS node FROM adj
    ), l0 AS (
      SELECT node, node AS label FROM nodes
    ), {", ".join(rounds)}
    SELECT label AS community,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MIN(node) AS BIGINT) AS min_node,
           CAST(MAX(node) AS BIGINT) AS max_node
    FROM {prev}
    GROUP BY label HAVING COUNT(*) >= 3
    ORDER BY n_members DESC, community LIMIT 20
    """


@query("q_label_propagation", oracle=_lp_oracle())
def q_label_propagation(spark, sf_dir):
    """SYNCHRONOUS MIN-LABEL PROPAGATION (3 rounds) on the co-order
    part graph (shared edge contract ``operators/graph.py``): every
    node starts labeled with itself; each round it takes the min of
    its own and its neighbors' labels. After k rounds, a node's label
    is the smallest node id within k hops — a deterministic,
    round-bounded community coarsening (full convergence = connected
    components, which q_dedup_clusters already does with
    pointer-jumping; the fixed-round form is what you run when the
    diameter is unknown and the budget is k passes). Report:
    communities of ≥3 members, top 20 by size.

    Scale shape: each round is ONE keyed equi-join of the label frame
    against the edge list plus a partial-aggregated min — k rounds =
    k joins, unrolled; state is node-grain. No iteration-until-
    convergence driver loop, no window, no SinglePartition.

    Lineage truncation (round 11, the q_pagerank/q_khop_reach
    convention): the label frame is referenced TWICE per round (once
    as the node side, once as the neighbor side), so an un-truncated
    plan doubles per round — 2^k copies of the edge build by round k.
    ``localCheckpoint`` on the adjacency and on each round's labels
    keeps every round one join over materialized node-grain state (at
    cluster scale: a persisted, source-key-partitioned edge relation
    reused across rounds)."""
    li = read_table(spark, sf_dir, "lineitem")
    edges = co_order_edges(li)
    adj = (
        edges.select(F.col("p1").alias("u"), F.col("p2").alias("v"))
        .unionAll(edges.select(F.col("p2").alias("u"), F.col("p1").alias("v")))
        .localCheckpoint(eager=True)
    )
    labels = adj.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(_LP_ROUNDS):
        nbr = (
            labels.join(adj, labels["node"] == adj["u"], "left")
            .join(
                labels.select(
                    F.col("node").alias("vnode"), F.col("label").alias("vlabel")
                ),
                F.col("v") == F.col("vnode"),
                "left",
            )
            .groupBy("node", "label")
            .agg(F.min("vlabel").alias("nbr_min"))
        )
        labels = nbr.select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
            ).alias("label"),
        ).localCheckpoint(eager=True)
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.min("node").cast("bigint").alias("min_node"),
            F.max("node").cast("bigint").alias("max_node"),
        )
        .where(F.col("n_members") >= 3)
        .orderBy(F.col("n_members").desc(), F.col("community"))
        .limit(20)
    )
