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
# Probe panel = the FIRST 40 of the every-50th sample (orderBy+limit →
# TakeOrderedAndProject), the q_ann_two_stage/extras72 discipline: an
# eval workload is a FIXED SAMPLE, not a corpus fraction. Uncapped, the
# panel is n/50 rows crossJoin-broadcast against the corpus — executor
# memory and eval cost that GROW with the corpus (10/10/40 probes at
# the driver SFs, 2×10⁷ at 10⁹ vectors). The cap is bit-identical at
# every driver SF (panels never exceeded 40 there); the oracle carries
# the same ORDER BY vec_id LIMIT in lockstep.
_PANEL_CAP = 40
# Label-clustered fixture embeddings put most of a probe's true top-k
# inside its nearest lists; the witness floor is deliberately below
# the observed recall so it flags structural regressions, not noise.
_RECALL_FLOOR = 0.5
_SHIP_SLA_DAYS = 365

# Sequential-fold dot product of two float32 lists, mirroring
# functions.vector.dot_product bit-for-bit: per element a float32
# product (FLOAT * FLOAT stays FLOAT in DuckDB, as zip_with does on
# array<float>), cast to DOUBLE, accumulated strictly left-to-right
# (list_reduce's left fold == F.aggregate's; the 0.0 init is a no-op).
def _dot32(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] * {b}[i] AS DOUBLE)), (x, y) -> x + y)"
    )


# Same fold over DOUBLE lists (the assignment path uses full-precision
# centroids, matching ivf_assignments' float64 matmul).
def _dot64(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
    )


_ANN_RECALL_ORACLE = f"""
WITH ed AS (
  SELECT vec_id,
         list_transform(embedding, v -> CAST(v AS DOUBLE)) AS x
  FROM embeddings
), probes AS (
  SELECT vec_id AS probe_id, embedding AS pv
  FROM embeddings WHERE vec_id % 50 = 0
  ORDER BY vec_id LIMIT {_PANEL_CAP}
), cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS centroid_id,
         list_transform(x, v -> v / (CASE WHEN nrm = 0 THEN 1.0
                                          ELSE nrm END)) AS cd
  FROM (SELECT vec_id, x,
               SQRT(list_reduce(list_transform(x, u -> u * u),
                                (a, b) -> a + b)) AS nrm
        FROM (SELECT vec_id, x FROM ed ORDER BY vec_id LIMIT {_N_CENTROIDS}))
), cent32 AS (
  SELECT centroid_id, list_transform(cd, v -> CAST(v AS FLOAT)) AS cf
  FROM cent
), exact AS (
  SELECT probe_id, vec_id AS exact_id FROM (
    SELECT p.probe_id, e.vec_id,
           ROW_NUMBER() OVER (PARTITION BY p.probe_id
             ORDER BY {_dot32('e.embedding', 'p.pv')} DESC, e.vec_id) AS rn
    FROM embeddings e, probes p) WHERE rn <= {_K}
), assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT ed.vec_id, cent.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY ed.vec_id
             ORDER BY {_dot64('ed.x', 'cent.cd')} DESC,
                      cent.centroid_id) AS rn
    FROM ed, cent) WHERE rn = 1
), pc AS (
  SELECT probe_id, centroid_id FROM (
    SELECT p.probe_id, c.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY p.probe_id
             ORDER BY {_dot32('p.pv', 'c.cf')} DESC, c.centroid_id) AS rn
    FROM probes p, cent32 c) WHERE rn <= {_N_PROBE}
), ann AS (
  SELECT probe_id, vec_id AS ann_id FROM (
    SELECT pc.probe_id, a.vec_id,
           ROW_NUMBER() OVER (PARTITION BY pc.probe_id
             ORDER BY {_dot32('e2.embedding', 'p.pv')} DESC, a.vec_id) AS rn
    FROM assign a
    JOIN pc ON a.centroid_id = pc.centroid_id
    JOIN probes p ON p.probe_id = pc.probe_id
    JOIN embeddings e2 ON e2.vec_id = a.vec_id) WHERE rn <= {_K}
), hits AS (
  SELECT ex.probe_id,
         CAST(COUNT(*) AS BIGINT) AS n_exact,
         CAST(COUNT(an.ann_id) AS BIGINT) AS n_overlap
  FROM exact ex LEFT JOIN ann an
    ON ex.probe_id = an.probe_id AND ex.exact_id = an.ann_id
  GROUP BY ex.probe_id
)
SELECT probe_id, n_exact, n_overlap,
       CAST(n_overlap AS DOUBLE) / CAST(n_exact AS DOUBLE) AS recall_at_k,
       CAST(n_overlap AS DOUBLE) >=
         {_RECALL_FLOOR} * CAST(n_exact AS DOUBLE) AS witness_ok
FROM hits ORDER BY probe_id
"""


@query(
    "q_ann_recall_at_k",
    # Oracle-backed since round 9 (was rows-only; round-8 verdict task
    # #4): every stage — seed centroids, float64 argmax assignment,
    # float32 probe-cell ranking, candidate top-k, recall — is
    # deterministic arithmetic over the fixture, so DuckDB replays the
    # WHOLE IVF eval pipeline and the driver hash-verifies recall
    # itself, not just a bounds witness. Float chains mirror
    # functions.vector.dot_product token-for-token (float32 products,
    # strict left-fold double accumulation); the one non-mirrored chain
    # is numpy's pairwise/BLAS summation inside ivf_assignments and
    # np.linalg.norm vs the oracle's sequential fold — a last-ulp
    # difference that only matters if two centroid dots tie within
    # ~1e-14 (never on this fixture; verified bit-green at sf0.001,
    # sf0.01 AND sf0.1).
    oracle=_ANN_RECALL_ORACLE,
)
def q_ann_recall_at_k(spark, sf_dir):
    """ANN RECALL@10 over a probe panel (first ``_PANEL_CAP`` of the
    every-50th sample — a fixed eval panel, not a corpus fraction): IVF with
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
    probes = (
        emb.filter(F.pmod("vec_id", F.lit(50)) == 0)
        .orderBy("vec_id")
        .limit(_PANEL_CAP)
        .select(
            F.col("vec_id").alias("probe_id"),
            F.col("embedding").alias("probe_vec"),
        )
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
