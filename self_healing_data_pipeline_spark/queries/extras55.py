"""Round-6 batch 37 (SURVEY.md §2.11 similarity / DQ): ANN
RECALL@K EVALUATION (the offline eval every vector index needs —
IVF's probed-lists answer scored against the exact brute-force top-k
over a probe panel, per-probe recall reported) and the TEMPORAL
CONSISTENCY audit (cross-table date sanity: a line shipped before its
order existed, or absurdly long after — the referential-time DQ rule
q_dq_fk_orphans's key check cannot see).

The recall eval is rows-only (float ranking is engine-sensitive) with
an in-row witness; the temporal audit is exact integer counting with
a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

_K = 10
_N_PROBE = 8
_N_CENTROIDS = 16
# Label-clustered fixture embeddings put most of a probe's true top-k
# inside its nearest lists; the witness floor is deliberately below
# the observed recall so it flags structural regressions, not noise.
_RECALL_FLOOR = 0.5
_SHIP_SLA_DAYS = 365


@query("q_ann_recall_at_k")  # rows-only: float ranking, witness in-row
def q_ann_recall_at_k(spark, sf_dir):
    """ANN RECALL@10 over a probe panel (every 50th vector): IVF with
    a deterministic coarse quantizer probes its 8 nearest of
    16 inverted lists; the exact brute-force top-10 is the
    per-probe ground truth; the report is per-probe overlap and
    recall, with ``witness_ok`` asserting recall ≥ 0.5 (the
    label-clustered fixture space puts true neighbors in the probed
    lists; a quantizer or candidate-join regression drops it to ~0).

    This is the BATCH eval form — all probes in one plan: the exact
    baseline is a crossJoin against the broadcast probe panel (cost
    |probes|·n, the honest offline-eval price), ANN candidates come
    from ONE equi-join on centroid_id (cost |probes|·n·nprobe/cells),
    and both rank with windows partitioned BY PROBE — parallel across
    the panel, never a global sort. Reuses the production operators
    (``operators/similarity.py``: deterministic_centroids /
    ivf_assignments / dot_product)."""
    from self_healing_data_pipeline_spark.functions.vector import dot_product
    from self_healing_data_pipeline_spark.operators.similarity import (
        deterministic_centroids,
        ivf_assignments,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.pmod("vec_id", F.lit(50)) == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").alias("probe_vec"),
    )
    # Exact ground truth: probe-panel crossJoin + per-probe rank.
    scored = emb.crossJoin(F.broadcast(probes)).select(
        "probe_id",
        "vec_id",
        dot_product(F.col("embedding"), F.col("probe_vec")).alias("score"),
    )
    wp = Window.partitionBy("probe_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    exact = (
        scored.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= _K)
        .select("probe_id", F.col("vec_id").alias("exact_id"))
    )
    # IVF: deterministic centroids -> cells; probes pick their
    # n_probe nearest lists; candidates come from ONE equi-join.
    cents = deterministic_centroids(emb, _N_CENTROIDS)
    cent_df = F.broadcast(
        spark.createDataFrame(
            [(i, [float(v) for v in c]) for i, c in enumerate(cents)],
            "centroid_id int, centroid array<float>",
        )
    )
    probe_cells = (
        probes.join(cent_df)
        .select(
            "probe_id",
            "centroid_id",
            dot_product(F.col("probe_vec"), F.col("centroid")).alias("cs"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("probe_id").orderBy(
                    F.col("cs").desc(), F.col("centroid_id")
                )
            ),
        )
        .where(F.col("rn") <= _N_PROBE)
        .select("probe_id", "centroid_id")
    )
    assigned = ivf_assignments(emb, cents)
    cand = (
        assigned.join(F.broadcast(probe_cells), "centroid_id")
        .join(F.broadcast(probes), "probe_id")
        .select(
            "probe_id",
            "vec_id",
            dot_product(F.col("embedding"), F.col("probe_vec")).alias(
                "score"
            ),
        )
    )
    ann = (
        cand.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= _K)
        .select(
            F.col("probe_id").alias("probe_id_a"),
            F.col("vec_id").alias("ann_id"),
        )
    )
    hits = exact.join(
        ann,
        (exact["probe_id"] == ann["probe_id_a"])
        & (exact["exact_id"] == ann["ann_id"]),
        "left",
    ).groupBy(exact["probe_id"].alias("probe_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact"),
        F.count("ann_id").cast("bigint").alias("n_overlap"),
    )
    return hits.select(
        "probe_id",
        "n_exact",
        "n_overlap",
        (F.col("n_overlap").cast("double") / F.col("n_exact").cast("double"))
        .alias("recall_at_k"),
        (
            F.col("n_overlap").cast("double")
            >= F.lit(_RECALL_FLOOR) * F.col("n_exact").cast("double")
        ).alias("witness_ok"),
    ).orderBy("probe_id")


@query(
    "q_dq_temporal_consistency",
    oracle=f"""
    WITH j AS (
      SELECT STRFTIME(o.o_orderdate, '%Y-%m') AS order_month,
             DATE_DIFF('day', o.o_orderdate, l.l_shipdate) AS lag_days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT order_month,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN lag_days < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS shipped_before_order,
           CAST(SUM(CASE WHEN lag_days > {_SHIP_SLA_DAYS} THEN 1 ELSE 0 END)
             AS BIGINT) AS shipped_past_sla,
           CAST(SUM(CASE WHEN lag_days >= 0
                          AND lag_days <= {_SHIP_SLA_DAYS}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_consistent,
           CAST(MIN(lag_days) AS BIGINT) AS min_lag_days,
           CAST(MAX(lag_days) AS BIGINT) AS max_lag_days
    FROM j GROUP BY order_month
    HAVING SUM(CASE WHEN lag_days < 0 OR lag_days > {_SHIP_SLA_DAYS}
               THEN 1 ELSE 0 END) > 0
    ORDER BY order_month
    """,
)
def q_dq_temporal_consistency(spark, sf_dir):
    """TEMPORAL CONSISTENCY audit: per order month, lines whose ship
    date precedes the order date (impossible — a key-integrity-passing
    row that is still wrong) or trails it by more than a year (stale
    linkage / unit confusion). The cross-table DATE rule that
    completes the DQ suite: q_dq_fk_orphans checks the key exists,
    this checks the TIMELINE makes sense. Only months with violations
    are reported (the actionable set).

    Scale shape: one fact-fact equi-join on the order key (both sides
    shuffle-partitioned alike), one month-grain conditional rollup —
    no window, no SinglePartition. Day lags are exact integers
    (date-boundary diffs, identical in both engines)."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        F.datediff(
            F.col("l_shipdate").cast("date"),
            F.col("o_orderdate").cast("date"),
        ).alias("lag_days"),
    )
    viol = (
        (F.col("lag_days") < 0)
        | (F.col("lag_days") > _SHIP_SLA_DAYS)
    )
    return (
        j.groupBy("order_month")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(F.when(F.col("lag_days") < 0, 1).otherwise(0))
            .cast("bigint")
            .alias("shipped_before_order"),
            F.sum(
                F.when(F.col("lag_days") > _SHIP_SLA_DAYS, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("shipped_past_sla"),
            F.sum(F.when(viol, 0).otherwise(1))
            .cast("bigint")
            .alias("n_consistent"),
            F.min("lag_days").cast("bigint").alias("min_lag_days"),
            F.max("lag_days").cast("bigint").alias("max_lag_days"),
            F.sum(F.when(viol, 1).otherwise(0)).alias("_n_viol"),
        )
        .where(F.col("_n_viol") > 0)
        .drop("_n_viol")
        .orderBy("order_month")
    )
