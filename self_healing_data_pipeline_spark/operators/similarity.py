"""Vector similarity search over array<float> embedding columns.

Three tiers (SURVEY.md §2.11; baseline = exact brute force, scale path =
LSH / IVF pruning):

- ``brute_force_topk``: score every row against one query vector — a
  narrow map + TakeOrderedAndProject. At 100 TB this is a full scan but
  perfectly parallel and shuffle-free; it is also the *oracle* for the
  approximate variants.
- ``similarity_join``: all pairs ≥ threshold within blocking keys; the
  block key (label / LSH bucket) turns O(n²) into Σ|block|².
- ``lsh_bucket_topk``: random-hyperplane LSH — b sign-bits per table →
  candidates share a bucket; probes only matching buckets. Hyperplanes
  are generated from a seeded hash of (table, bit, dim) so the plan is
  fully deterministic with no driver-side randomness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.functions.vector import (
    cosine_similarity,
    dot_product,
)


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "dot",
) -> DataFrame:
    """Exact top-k: score all rows, keep k best (deterministic tie-break on id)."""
    q = F.array(*[F.lit(float(v)).cast("float") for v in query_vec])
    score = (
        dot_product(F.col(vec_col), q)
        if metric == "dot"
        else cosine_similarity(F.col(vec_col), q)
    )
    return (
        embeddings.select(F.col(id_col), score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def similarity_join(
    embeddings: DataFrame,
    block_col: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine similarity ≥ threshold within blocking groups.

    Equi-join on the block key (shuffle-hash / broadcast by AQE), then
    per-pair scoring and filter — the blocked self-join pattern every
    pairwise method at scale reduces to.
    """
    l = embeddings.select(
        F.col(id_col).alias("id_l"),
        F.col(vec_col).alias("vec_l"),
        F.col(block_col).alias("blk"),
    )
    r = embeddings.select(
        F.col(id_col).alias("id_r"),
        F.col(vec_col).alias("vec_r"),
        F.col(block_col).alias("blk"),
    )
    pairs = l.join(r, on="blk").filter(F.col("id_l") < F.col("id_r"))
    scored = pairs.select(
        "id_l",
        "id_r",
        cosine_similarity(F.col("vec_l"), F.col("vec_r")).alias("cosine_sim"),
    )
    return scored.filter(F.col("cosine_sim") >= threshold)


def _hyperplane(table: int, bit: int, dim: int) -> F.Column:
    """Deterministic pseudo-random hyperplane: component d is a hash of
    (table, bit, d) mapped to [-1, 1). Seeded, engine-side, reproducible."""
    return F.array(
        *[
            (
                F.xxhash64(F.lit(f"hp:{table}:{bit}:{d}")).cast("double")
                / F.lit(float(2 ** 63))
            )
            for d in range(dim)
        ]
    )


def lsh_bucket_key(vec_col, table: int, bits: int, dim: int) -> F.Column:
    """Random-hyperplane LSH bucket id: ``bits`` sign bits packed into a long."""
    key = F.lit(0).cast("bigint")
    for b in range(bits):
        proj = F.aggregate(
            F.zip_with(
                F.col(vec_col) if isinstance(vec_col, str) else vec_col,
                _hyperplane(table, b, dim),
                lambda x, h: x.cast("double") * h,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        key = key + F.when(proj >= 0, F.lit(2 ** b)).otherwise(F.lit(0)).cast("bigint")
    return key


def lsh_ann_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tables: int = 4,
    bits: int = 8,
) -> DataFrame:
    """Approximate NN: score only rows sharing an LSH bucket with the query
    in any of ``tables`` hash tables. At scale, bucket keys are precomputed
    and partitioned-by, so a query touches ~n/2^bits · tables rows."""
    dim = len(query_vec)
    q = F.array(*[F.lit(float(v)).cast("float") for v in query_vec])
    cand = None
    for t in range(tables):
        bucket = lsh_bucket_key(F.col(vec_col), t, bits, dim)
        qbucket = lsh_bucket_key(q, t, bits, dim)
        hit = embeddings.filter(bucket == qbucket)
        cand = hit if cand is None else cand.unionByName(hit)
    cand = cand.dropDuplicates([id_col])
    return (
        cand.select(F.col(id_col), dot_product(F.col(vec_col), q).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
