"""Round-9 batch 70 (SURVEY.md §2.11 similarity / vector-store ops):
TWO-STAGE RETRIEVAL (coarse truncated-dim shortlist → exact rerank —
the standard ANN accelerator shape: a cheap low-dimension scan prunes
the candidate set, the full-precision dot reranks only the shortlist)
and a MATRYOSHKA-STYLE DIMENSION-ABLATION recall curve (recall@k of
brute-force search at prefix dims 8/16/32 vs the full 64 — the eval
that decides how many dimensions a vector store can drop).

Both are DETERMINISTIC evals, oracle-backed end-to-end (the
q_ann_recall_at_k discipline): every dot product is float32 products
accumulated left-to-right into a double — `functions.vector.
dot_product` on the Spark side, the identical list_reduce fold in
DuckDB — so rankings, overlaps and recall values hash-match exactly.
Fixture embeddings are near-uniform random (the ANN worst case), so
shortlist sizes scale ∝ n (L = max(50, n/10), mirrored integer
arithmetic) and witness floors sit far below measured recall.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.functions.vector import dot_product
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

_K = 10
_COARSE_DIMS = 16
_MRL_DIMS = (8, 16, 32)

#: Probe-panel cap (round-10 sf1 fix): the eval workload is the FIRST
#: 40 sampled probe ids, not every 50th vector forever — an uncapped
#: panel made |probes| ∝ n and every eval term quadratic (measured
#: 8.6× wall at 10× data; the rerank term dominated). At the driver
#: SFs the panel is unchanged (10/10/40 probes at sf0.001/0.01/0.1 —
#: the cap only binds beyond sf0.1), so all recorded hashes are
#: bit-identical; at scale the eval cost is |panel| × n — linear.
_PROBE_CAP = 40

_PROBES_SQL = f"""
  SELECT probe_id, pv FROM (
    SELECT vec_id AS probe_id, embedding AS pv,
           ROW_NUMBER() OVER (ORDER BY vec_id) AS prn
    FROM embeddings WHERE vec_id % 50 = 0
  ) WHERE prn <= {_PROBE_CAP}"""


def _probe_panel(emb):
    """The fixed eval workload: the first :data:`_PROBE_CAP` sampled
    probe vectors (every-50th id, lowest ids first). ``orderBy +
    limit`` plans as TakeOrderedAndProject — distributed, bounded
    driver state. SQL twin: :data:`_PROBES_SQL`."""
    return (
        emb.filter(F.pmod("vec_id", F.lit(50)) == 0)
        .select(
            F.col("vec_id").alias("probe_id"),
            F.col("embedding").alias("pv"),
        )
        .orderBy("probe_id")
        .limit(_PROBE_CAP)
    )


def _dot32_prefix(a: str, b: str, dims: str) -> str:
    """DuckDB twin of dot_product over the first ``dims`` elements:
    float32 products (FLOAT * FLOAT stays FLOAT), cast to DOUBLE,
    strict left fold — mirrors zip_with + aggregate bit-for-bit."""
    return (
        f"list_reduce(list_transform(range(1, {dims} + 1), "
        f"i -> CAST({a}[i] * {b}[i] AS DOUBLE)), (x, y) -> x + y)"
    )


_TWO_STAGE_ORACLE = f"""
WITH probes AS ({_PROBES_SQL}
), n AS (
  SELECT COUNT(*) AS n_vecs FROM embeddings
), exact AS (
  SELECT probe_id, vec_id AS exact_id FROM (
    SELECT p.probe_id, e.vec_id,
           ROW_NUMBER() OVER (PARTITION BY p.probe_id
             ORDER BY {_dot32_prefix('e.embedding', 'p.pv',
                                     'len(e.embedding)')} DESC,
                      e.vec_id) AS rn
    FROM embeddings e, probes p) WHERE rn <= {_K}
), shortlist AS (
  SELECT probe_id, vec_id, embedding FROM (
    SELECT p.probe_id, e.vec_id, e.embedding,
           ROW_NUMBER() OVER (PARTITION BY p.probe_id
             ORDER BY {_dot32_prefix('e.embedding', 'p.pv',
                                     str(_COARSE_DIMS))} DESC,
                      e.vec_id) AS rn
    FROM embeddings e, probes p)
  WHERE rn <= GREATEST(50, (SELECT n_vecs FROM n) // 10)
), reranked AS (
  SELECT probe_id, vec_id AS ann_id FROM (
    SELECT s.probe_id, s.vec_id,
           ROW_NUMBER() OVER (PARTITION BY s.probe_id
             ORDER BY {_dot32_prefix('s.embedding', 'p.pv',
                                     'len(s.embedding)')} DESC,
                      s.vec_id) AS rn
    FROM shortlist s JOIN probes p ON p.probe_id = s.probe_id)
  WHERE rn <= {_K}
)
SELECT ex.probe_id,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(COUNT(r.ann_id) AS BIGINT) AS n_overlap,
       CAST(COUNT(r.ann_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         AS recall_at_k,
       COUNT(r.ann_id) * 5 >= COUNT(*) AS witness_ok
FROM exact ex LEFT JOIN reranked r
  ON ex.probe_id = r.probe_id AND ex.exact_id = r.ann_id
GROUP BY ex.probe_id
ORDER BY ex.probe_id
"""


@query("q_ann_two_stage", oracle=_TWO_STAGE_ORACLE)
def q_ann_two_stage(spark, sf_dir):
    """TWO-STAGE retrieval eval: a coarse scan over the first
    {16}-of-64 dimensions shortlists L = max(50, n/10) candidates per
    probe (cheap: 4× less arithmetic and memory traffic per vector —
    at 100 TB the coarse columns can live in a separate, smaller
    index), then the exact full-dimension dot reranks only the
    shortlist. Per-probe recall@10 vs exact brute-force truth is the
    output; ``witness_ok`` floors it at 0.2 (integer cross-multiply —
    measured recall on the worst-case random fixture is far higher;
    the hash gate pins the exact values anyway).

    Plan: both scans are broadcast-probe crossJoins with per-probe
    rank windows (WindowGroupLimit-able top-k, never a global sort);
    the rerank touches |probes| × L rows only. Shortlist size scales
    ∝ n because near-uniform random vectors (the fixture) shrink
    coarse/full score gaps as n grows — fixed L would decay to chance
    recall at scale. The probe PANEL, by contrast, is capped (first
    ``_PROBE_CAP`` sampled ids via TakeOrderedAndProject — an eval
    workload is a fixed sample, not a corpus fraction): uncapped it
    made every term quadratic, measured 8.6× wall at 10× data; capped,
    the eval is |panel| × n linear, and at the driver SFs the panel —
    hence every recorded hash — is unchanged (round-10 sf1 fix)."""
    emb = read_table(spark, sf_dir, "embeddings")
    probes = _probe_panel(emb)
    n_vecs = emb.count()
    shortlist_l = max(50, n_vecs // 10)
    wp = Window.partitionBy("probe_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    scored = emb.crossJoin(F.broadcast(probes))
    exact = (
        scored.select(
            "probe_id",
            "vec_id",
            dot_product(F.col("embedding"), F.col("pv")).alias("score"),
        )
        .withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= _K)
        .select("probe_id", F.col("vec_id").alias("exact_id"))
    )
    shortlist = (
        scored.select(
            "probe_id",
            "vec_id",
            "embedding",
            "pv",
            dot_product(
                F.slice("embedding", 1, _COARSE_DIMS),
                F.slice("pv", 1, _COARSE_DIMS),
            ).alias("score"),
        )
        .withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= shortlist_l)
    )
    reranked = (
        shortlist.select(
            "probe_id",
            "vec_id",
            dot_product(F.col("embedding"), F.col("pv")).alias("score"),
        )
        .withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= _K)
        .select(
            F.col("probe_id").alias("probe_id_r"),
            F.col("vec_id").alias("ann_id"),
        )
    )
    return (
        exact.join(
            reranked,
            (exact["probe_id"] == reranked["probe_id_r"])
            & (exact["exact_id"] == reranked["ann_id"]),
            "left",
        )
        .groupBy(exact["probe_id"].alias("probe_id"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exact"),
            F.count("ann_id").cast("bigint").alias("n_overlap"),
        )
        .select(
            "probe_id",
            "n_exact",
            "n_overlap",
            (
                F.col("n_overlap").cast("double")
                / F.col("n_exact").cast("double")
            ).alias("recall_at_k"),
            (F.col("n_overlap") * 5 >= F.col("n_exact")).alias(
                "witness_ok"
            ),
        )
        .orderBy("probe_id")
    )


_MRL_UNION = "\nUNION ALL\n".join(
    f"""
  SELECT {d} AS dim, p.probe_id, e.vec_id,
         ROW_NUMBER() OVER (PARTITION BY p.probe_id
           ORDER BY {_dot32_prefix('e.embedding', 'p.pv', str(d))} DESC,
                    e.vec_id) AS rn
  FROM embeddings e, probes p"""
    for d in _MRL_DIMS
)

_MRL_ORACLE = f"""
WITH probes AS ({_PROBES_SQL}
), exact AS (
  SELECT probe_id, vec_id AS exact_id FROM (
    SELECT p.probe_id, e.vec_id,
           ROW_NUMBER() OVER (PARTITION BY p.probe_id
             ORDER BY {_dot32_prefix('e.embedding', 'p.pv',
                                     'len(e.embedding)')} DESC,
                      e.vec_id) AS rn
    FROM embeddings e, probes p) WHERE rn <= {_K}
), truncated AS (
  SELECT dim, probe_id, vec_id FROM ({_MRL_UNION})
  WHERE rn <= {_K}
)
SELECT t.dim,
       CAST(COUNT(DISTINCT t.probe_id) AS BIGINT) AS n_probes,
       CAST(COUNT(ex.exact_id) AS BIGINT) AS total_overlap,
       CAST(COUNT(ex.exact_id) AS DOUBLE)
         / CAST(COUNT(DISTINCT t.probe_id) * {_K} AS DOUBLE)
         AS mean_recall_at_k
FROM truncated t
LEFT JOIN exact ex
  ON ex.probe_id = t.probe_id AND ex.exact_id = t.vec_id
GROUP BY t.dim
ORDER BY t.dim
"""


@query("q_ann_mrl_ablation", oracle=_MRL_ORACLE)
def q_ann_mrl_ablation(spark, sf_dir):
    """MATRYOSHKA-style dimension-ablation recall curve: brute-force
    top-10 using only the first 8 / 16 / 32 dimensions, scored against
    the full-64-dim exact truth — one row per prefix dim with the
    panel's mean recall@10. This is the eval behind "how many
    dimensions can the vector store drop": at 100 TB, halving stored
    dims halves index memory and scan bytes, and this curve prices the
    recall cost. Monotonicity (more dims → recall rises toward 1) is
    visible in the hashed values themselves.

    Plan: ONE broadcast-probe crossJoin scored at every prefix width
    in the same pass (the prefix dots reuse the row), per-(dim, probe)
    rank windows, then an exact-overlap count at dim grain — integer
    counts and one final division, hash-exact. Probe panel capped like
    q_ann_two_stage's (same round-10 sf1 fix; same unchanged hashes)."""
    emb = read_table(spark, sf_dir, "embeddings")
    probes = _probe_panel(emb)
    scored = emb.crossJoin(F.broadcast(probes))
    wp = Window.partitionBy("dim", "probe_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    exact = (
        scored.select(
            "probe_id",
            "vec_id",
            dot_product(F.col("embedding"), F.col("pv")).alias("score"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("probe_id").orderBy(
                    F.col("score").desc(), F.col("vec_id").asc()
                )
            ),
        )
        .where(F.col("rn") <= _K)
        .select(
            F.col("probe_id").alias("probe_id_e"),
            F.col("vec_id").alias("exact_id"),
        )
    )
    per_dim = scored.select(
        "probe_id",
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("dim"),
                        dot_product(
                            F.slice("embedding", 1, d),
                            F.slice("pv", 1, d),
                        ).alias("score"),
                    )
                    for d in _MRL_DIMS
                ]
            )
        ).alias("ds"),
    ).select("probe_id", "vec_id", "ds.dim", "ds.score")
    truncated = (
        per_dim.withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= _K)
        .select("dim", "probe_id", "vec_id")
    )
    return (
        truncated.join(
            exact,
            (truncated["probe_id"] == exact["probe_id_e"])
            & (truncated["vec_id"] == exact["exact_id"]),
            "left",
        )
        .groupBy("dim")
        .agg(
            F.countDistinct("probe_id").cast("bigint").alias("n_probes"),
            F.count("exact_id").cast("bigint").alias("total_overlap"),
        )
        .select(
            F.col("dim").cast("int").alias("dim"),
            "n_probes",
            "total_overlap",
            (
                F.col("total_overlap").cast("double")
                / (F.col("n_probes") * _K).cast("double")
            ).alias("mean_recall_at_k"),
        )
        .orderBy("dim")
    )