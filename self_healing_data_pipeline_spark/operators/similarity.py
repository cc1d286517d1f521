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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from self_healing_data_pipeline_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_norm,
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
    # Precompute each vector's L2 norm ONCE (O(n) higher-order-function
    # evals) instead of inside the pair score (O(pairs) — the dominant
    # cost: HOF lambdas run interpreted, so per-pair work is the budget).
    # The norm value is bit-identical to computing it in-pair, so the
    # threshold comparison — and the DuckDB oracle match — are unchanged.
    base = embeddings.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        F.col(block_col).alias("blk"),
        l2_norm(F.col(vec_col)).alias("__norm"),
    )
    l = base.select(
        F.col("__id").alias("id_l"),
        F.col("__vec").alias("vec_l"),
        F.col("__norm").alias("norm_l"),
        "blk",
    )
    r = base.select(
        F.col("__id").alias("id_r"),
        F.col("__vec").alias("vec_r"),
        F.col("__norm").alias("norm_r"),
        "blk",
    )
    pairs = l.join(r, on="blk").filter(F.col("id_l") < F.col("id_r"))
    scored = pairs.select(
        "id_l",
        "id_r",
        (
            dot_product(F.col("vec_l"), F.col("vec_r"))
            / (F.col("norm_l") * F.col("norm_r"))
        ).alias("cosine_sim"),
    )
    return scored.filter(F.col("cosine_sim") >= threshold)


def blocked_dedup_survivors(
    embeddings: DataFrame,
    block_col: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Keep-first cosine dedup survivors at VALUE grain: ids with no
    lower-id same-block neighbor at cosine ≥ threshold.

    Semantics are defined at VECTOR grain (the DuckDB oracle's NOT
    EXISTS form), but the pair join runs over DISTINCT (block, value)
    groups — the ``semdedup_drops`` collapse (round-12 sf1 probe: the
    vector-grain join measured 15.8× wall at 10× data once block sizes
    grew linearly; this form re-probed 1.1×). Exactness:

    - identical vectors score cos ≈ 1.0 ≥ τ against each other, so
      within a value group only the MIN id can survive, and it is the
      group's rep;
    - a rep survives iff no partner value in the block (cos ≥ τ) has a
      smaller rep: any dominating member u implies rep(group(u)) ≤
      id(u) < rep, so rep-vs-rep comparison is complete;
    - zero-norm vectors have no cosine (NULL/NaN on both engines,
      never ≥ τ): they all survive and never dominate — passed
      through at vector grain, excluded from the pair space.

    The cosine chain (precomputed norms, sequential-fold dot) is the
    same float chain ``similarity_join`` runs on identical arrays, so
    every threshold decision — and the oracle hash — is unchanged.
    Shuffles: one groupBy on (block, value), the block-key pair join
    at value grain, one anti-join on rep id."""
    base = embeddings.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        F.col(block_col).alias("blk"),
        l2_norm(F.col(vec_col)).alias("__norm"),
    )
    zero = base.filter(~(F.col("__norm") > 0)).select(
        F.col("__id").alias(id_col)
    )
    groups = (
        base.filter(F.col("__norm") > 0)
        .groupBy("blk", "__vec")
        .agg(F.min("__id").alias("rep_id"), F.min("__norm").alias("nrm"))
    )
    l = groups.select(
        "blk",
        F.col("__vec").alias("v_l"),
        F.col("rep_id").alias("rep_l"),
        F.col("nrm").alias("n_l"),
    )
    r = groups.select(
        "blk",
        F.col("__vec").alias("v_r"),
        F.col("rep_id").alias("rep_r"),
        F.col("nrm").alias("n_r"),
    )
    dominated = (
        l.join(r, "blk")
        .filter(F.col("rep_l") < F.col("rep_r"))
        .filter(
            dot_product(F.col("v_l"), F.col("v_r"))
            / (F.col("n_l") * F.col("n_r"))
            >= threshold
        )
        .select(F.col("rep_r").alias("rep_id"))
        .distinct()
    )
    survivors = groups.join(dominated, "rep_id", "left_anti").select(
        F.col("rep_id").alias(id_col)
    )
    return survivors.unionByName(zero)


def hyperplanes(tables: int, bits: int, dim: int, seed: int = 42):
    """Deterministic random hyperplanes, shape (tables, bits, dim).

    Seeded PCG64 — reproducible across runs/machines; generated once on
    the driver (tables·bits·dim floats, trivially broadcastable)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    return rng.standard_normal((tables, bits, dim))


def lsh_bucket_udf(planes):
    """Vectorized bucket-key computation: one Arrow batch → numpy matmul →
    packed sign-bit keys per table. A (batch × dim) @ (dim × bits) GEMM per
    table beats thousands of scalar expressions and is the shape that
    saturates SIMD on executors at scale. Returns array<bigint> (one key
    per table)."""
    n_tables, n_bits, _ = planes.shape
    weights = [planes[t].T.copy() for t in range(n_tables)]  # dim × bits
    powers = (2 ** np.arange(n_bits)).astype("int64")

    @pandas_udf("array<long>")
    def bucket_keys(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy()).astype("float64")  # batch × dim
        keys = [((mat @ w) >= 0).astype("int64") @ powers for w in weights]
        stacked = np.stack(keys, axis=1)  # batch × tables
        return pd.Series(list(stacked))

    return bucket_keys


def ivf_assignments(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (IVF coarse quantizer).

    One Arrow-batched (batch × dim) @ (dim × K) matmul per batch — narrow
    map, no shuffle. At scale this column is computed at ingest and the
    table is repartitioned/sorted by it, so probes touch only the listed
    partitions.
    """
    c_t = centroids.T.copy()  # dim × K

    @pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy()).astype("float64")
        return pd.Series((mat @ c_t).argmax(axis=1).astype("int32"))

    return embeddings.withColumn("centroid_id", assign(F.col(vec_col)))


def deterministic_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic seed centroids: the ``n_centroids`` lowest-id vectors,
    L2-normalized. (A production index would run a few k-means rounds —
    also expressible as repeated assign+average aggregates; seeds keep the
    fixture pipeline deterministic.)"""
    rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(n_centroids)
        .collect()
    )
    c = np.array([r[1] for r in rows], dtype="float64")
    norms = np.linalg.norm(c, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return c / norms


def semdedup_drops(
    embeddings: DataFrame,
    tau: float,
    min_k: int = 16,
    target_cluster: int = 125,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) at VALUE grain:
    one row per DROPPED vector — ``(vec_id, cluster_id, dup_of,
    cos_sim)`` where ``dup_of`` is the lowest same-cluster id at cosine
    ≥ ``tau`` and ``cos_sim`` that pair's cosine.

    Semantics are defined at VECTOR grain (drop x iff a lower-id
    same-cluster neighbor has cos ≥ τ), but the computation collapses
    bit-identical vectors first — the template-page adversary (one hot
    vector at 20% of corpus mass, the --embskew tier) otherwise lands
    ~0.2n copies in ONE cluster and makes the pair join O(n²). The
    collapse is EXACT, not approximate, by two observations:

    - a value's lowest member id IS its representative id, so the
      minimum qualifying id for any vector x of value V is
      ``m(V) = min(rep(W) : W partner of V)`` where partners are the
      same-cluster values at cos ≥ τ — V always partners ITSELF
      (cos(V,V) ≥ τ), so copies collapse to one self-pair and only
      partners with smaller reps can win the min;
    - x is dropped iff ``m(V) < id(x)``, with ``dup_of = m(V)`` and
      ``cos_sim = cos(V, value(m(V)))`` — computed from the same
      arrays by the same float chain as the vector-grain form, hence
      bit-identical (the DuckDB oracle stays at vector grain: an
      independent formulation, not a rewrite twin).

    Pair work is Σ|distinct values per cluster|² and K = max(min_k,
    n // target_cluster) keeps clusters bounded, so the whole plan is
    linear in corpus size for any duplication profile. Shuffles: one
    groupBy on the vector value, one on cluster id, plus the narrow
    assignment map.
    """
    n = embeddings.count()
    k = max(min_k, n // target_cluster)
    # Seeds stay at VECTOR grain (first k by id — duplicates included),
    # mirroring the oracle's definition.
    cents = deterministic_centroids(embeddings, k, id_col, vec_col)
    groups = embeddings.groupBy(vec_col).agg(
        F.min(id_col).alias("rep_id"),
        F.sort_array(F.collect_list(id_col)).alias("member_ids"),
    )
    a = (
        ivf_assignments(groups, cents, id_col="rep_id", vec_col=vec_col)
        .withColumn("nrm", l2_norm(F.col(vec_col)))
        # Zero-norm vectors have no cosine: exclude them from the pair
        # space entirely (never dropped, never a dup_of) — mirrored by
        # the oracle's nrm > 0 predicate. Without this, Spark's 0/0
        # divide yields NULL (pair filtered) while DuckDB's yields NaN,
        # which DuckDB compares GREATER than any number (review finding).
        .filter(F.col("nrm") > 0)
    )
    l = a.select(
        F.col("rep_id").alias("rep_l"),
        F.col("centroid_id").alias("cid"),
        F.col(vec_col).alias("v_l"),
        F.col("nrm").alias("n_l"),
    )
    r = a.select(
        F.col("rep_id").alias("rep_r"),
        F.col("centroid_id").alias("cid"),
        F.col(vec_col).alias("v_r"),
        F.col("nrm").alias("n_r"),
        "member_ids",
    )
    # rep_l <= rep_r keeps the SELF-pair (copies dup against their own
    # rep); partners with larger reps can never win the min, so one
    # direction is complete.
    pairs = (
        l.join(r, "cid")
        .filter(F.col("rep_l") <= F.col("rep_r"))
        .withColumn(
            "cos",
            dot_product(F.col("v_l"), F.col("v_r"))
            / (F.col("n_l") * F.col("n_r")),
        )
        .filter(F.col("cos") >= F.lit(tau))
    )
    per_value = pairs.groupBy("rep_r", "cid", "member_ids").agg(
        F.min("rep_l").alias("m"),
        F.min_by("cos", "rep_l").alias("cos_m"),
    )
    return (
        per_value.select(
            F.explode("member_ids").alias(id_col),
            F.col("cid").cast("int").alias("cluster_id"),
            F.col("m").alias("dup_of"),
            F.col("cos_m").alias("cos_sim"),
        )
        .filter(F.col(id_col) > F.col("dup_of"))
        .orderBy(id_col)
    )


def ivf_train(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Lloyd's k-means for the IVF coarse quantizer, Spark-native.

    Per iteration: assign (Arrow matmul, narrow) → per-centroid mean via
    posexplode + one hash aggregate keyed on (centroid, dim) — shuffle
    rows = n_centroids × dim, never the vectors themselves. Centroids
    (K × dim floats) round-trip through the driver each iteration, which
    is exactly the state k-means needs and is tiny at any data scale.
    Deterministic: seed centroids + deterministic assignment tie-breaks
    (argmax picks the lowest index on ties).
    """
    centroids = deterministic_centroids(embeddings, n_centroids, id_col, vec_col)
    for _ in range(iters):
        assigned = ivf_assignments(embeddings, centroids, id_col, vec_col)
        sums = (
            assigned.select(
                "centroid_id", F.posexplode(F.col(vec_col)).alias("dim", "val")
            )
            .groupBy("centroid_id", "dim")
            .agg(F.sum(F.col("val").cast("double")).alias("s"),
                 F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = centroids.copy()
        acc: dict[int, np.ndarray] = {}
        cnt: dict[int, int] = {}
        for r in sums:
            cid, dim = r["centroid_id"], r["dim"]
            if cid not in acc:
                acc[cid] = np.zeros(centroids.shape[1])
                cnt[cid] = 0
            acc[cid][dim] = r["s"]
            cnt[cid] = max(cnt[cid], int(r["n"]))
        for cid, vec in acc.items():
            if cnt[cid] > 0:
                new[cid] = vec / cnt[cid]
        norms = np.linalg.norm(new, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        centroids = new / norms
    return centroids


def similarity_join_lsh(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    tables: int = 4,
    bits: int | None = None,
    seed: int = 42,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Label-free near-dup pairs: candidates share a random-hyperplane LSH
    bucket in ANY of ``tables`` hash tables; exact cosine verifies.

    Same scale skeleton as MinHash banding: one bucket-key pass (Arrow
    matmul), one groupBy per table, in-bucket pair generation, distinct,
    exact verify on candidates only — no O(n²). ``dim`` defaults to the
    width of the first embedding (a mismatch would otherwise surface as
    an opaque numpy shape error inside an executor).

    ``bits=None`` sizes buckets from the corpus: 2^bits ≈ n/32, clamped
    to [4, 16]. Fixed bits don't survive growth — at constant bits the
    expected bucket occupancy (and the quadratic in-bucket pair cost)
    scales linearly with n; scaling bits with log2(n) keeps expected
    bucket size — and verify cost per table — roughly constant. More
    tables, not fewer bits, is the recall lever at scale.
    """
    if dim is None:
        first = embeddings.select(vec_col).head()
        # empty input: any width works — no row ever reaches the UDF
        dim = len(first[0]) if first is not None else 1
    if bits is None:
        n = embeddings.count()  # cheap column-pruned count job
        bits = max(4, min(16, int(np.ceil(np.log2(max(n, 1) / 32 + 1)))))
    planes = hyperplanes(tables, bits, dim, seed)
    keys = lsh_bucket_udf(planes)
    with_keys = embeddings.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        keys(F.col(vec_col)).alias("__keys"),
        l2_norm(F.col(vec_col)).alias("__norm"),
    )
    banded = with_keys.select(
        "__id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        F.col("__keys").getItem(t).alias("bucket"),
                    )
                    for t in range(tables)
                ]
            )
        ).alias("bk"),
    ).select("__id", "bk.tbl", "bk.bucket")
    from self_healing_data_pipeline_spark.operators.dedup import (
        pairs_within_buckets,
    )

    cand = pairs_within_buckets(banded, ["tbl", "bucket"], max_bucket)
    # Norms ride the side tables (computed once per vector, not per pair);
    # the per-pair verify is a single dot-product HOF eval.
    l = with_keys.select(
        F.col("__id").alias("id_l"),
        F.col("__vec").alias("vec_l"),
        F.col("__norm").alias("norm_l"),
    )
    r = with_keys.select(
        F.col("__id").alias("id_r"),
        F.col("__vec").alias("vec_r"),
        F.col("__norm").alias("norm_r"),
    )
    return (
        cand.join(l, "id_l")
        .join(r, "id_r")
        .select(
            "id_l",
            "id_r",
            (
                dot_product(F.col("vec_l"), F.col("vec_r"))
                / (F.col("norm_l") * F.col("norm_r"))
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate NN: probe only the ``n_probe`` inverted lists
    whose centroids are closest to the query (~n·n_probe/n_centroids rows
    scored instead of n)."""
    centroids = deterministic_centroids(embeddings, n_centroids, id_col, vec_col)
    qv = np.asarray(query_vec, dtype="float64")
    probe = np.argsort(-(centroids @ qv))[:n_probe].tolist()
    q = F.array(*[F.lit(float(v)).cast("float") for v in query_vec])
    assigned = ivf_assignments(embeddings, centroids, id_col, vec_col)
    cand = assigned.filter(F.col("centroid_id").isin(probe))
    return (
        cand.select(F.col(id_col), dot_product(F.col(vec_col), q).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def lsh_ann_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tables: int = 4,
    bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate NN: score only rows sharing an LSH bucket with the query
    in any of ``tables`` hash tables.

    At scale the bucket-key column is precomputed at ingest and the table
    is partitioned by it, so a query probes ~n/2^bits · tables rows; here
    keys are computed inline (one narrow pandas-UDF pass, no shuffle).
    """
    dim = len(query_vec)
    planes = hyperplanes(tables, bits, dim, seed)
    qv = np.asarray(query_vec, dtype="float64")
    powers = (2 ** np.arange(bits)).astype("int64")
    q_keys = [
        int(((planes[t] @ qv) >= 0).astype("int64") @ powers) for t in range(tables)
    ]

    keys = lsh_bucket_udf(planes)
    q = F.array(*[F.lit(float(v)).cast("float") for v in query_vec])
    with_keys = embeddings.withColumn("__keys", keys(F.col(vec_col)))
    match = None
    for t in range(tables):
        cond = F.col("__keys").getItem(t) == F.lit(q_keys[t])
        match = cond if match is None else (match | cond)
    cand = with_keys.filter(match)
    return (
        cand.select(F.col(id_col), dot_product(F.col(vec_col), q).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the codebook-compression companion to IVF.
# A 64-dim float32 vector (256 B) compresses to m=8 one-byte codes: 32×
# smaller, which is what makes billion-vector ANN indexes fit in memory
# at 100 TB corpus scale (IVF prunes WHICH vectors to score; PQ shrinks
# WHAT is stored and scored). Jégou et al., "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011 — public method.
# ---------------------------------------------------------------------------


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train per-subspace codebooks, shape ``(m, k, dim/m)``.

    Spark-native Lloyd over ALL subspaces in one pass per iteration:
    assign (Arrow kernel, narrow) → per-(subspace, code, dim) mean via
    one hash aggregate — shuffle rows = m·k·(dim/m) = dim·k partials,
    never the vectors. Codebooks (m·k·sub floats) round-trip through
    the driver per iteration — the tiny state Lloyd needs at any scale.
    Deterministic: seeded from the k lowest-id vectors; ``np.argmin``
    takes the lowest code on ties."""
    rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(k)
        .collect()
    )
    x0 = np.array([r[1] for r in rows], dtype="float64")
    dim = x0.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    books = np.ascontiguousarray(x0.reshape(k, m, sub).transpose(1, 0, 2))
    for _ in range(iters):
        codes = pq_assign(embeddings, books, id_col, vec_col)
        joined = embeddings.select(id_col, vec_col).join(codes, id_col)
        stats = (
            joined.select(
                F.posexplode(F.col(vec_col)).alias("dim", "val"),
                F.col("__codes"),
            )
            .select(
                (F.col("dim") / sub).cast("int").alias("sp"),
                (F.col("dim") % sub).cast("int").alias("sd"),
                F.element_at(
                    "__codes", ((F.col("dim") / sub).cast("int") + 1)
                ).alias("code"),
                F.col("val").cast("double").alias("v"),
            )
            .groupBy("sp", "code", "sd")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = books.copy()
        for r in stats:
            if r["n"] > 0:
                new[r["sp"], r["code"], r["sd"]] = r["s"] / r["n"]
        books = new
    return books


def pq_assign(
    embeddings: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, __codes array<int>): per-subspace nearest codeword (L2),
    one narrow Arrow-batched kernel — no shuffle."""
    m, k, sub = books.shape
    b = books.copy()

    @pandas_udf("array<int>")
    def assign(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            x = np.asarray(v, dtype="float64").reshape(m, sub)
            # (m, k) squared distances: per-subspace ||x_s - c||^2
            d2 = ((b - x[:, None, :]) ** 2).sum(axis=2)
            out.append(d2.argmin(axis=1).astype("int32"))
        return pd.Series(out)

    return embeddings.select(
        F.col(id_col), assign(F.col(vec_col)).alias("__codes")
    )


def pq_encode_with_error(
    embeddings: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, __codes, __recon_mse): codes plus the per-vector
    reconstruction MSE — the quality witness PQ carries alongside the
    32× compression. mapInPandas so codes and error come from ONE
    decode of each Arrow batch."""
    m, k, sub = books.shape
    b = books.copy()
    schema = f"{id_col} long, __codes array<int>, __recon_mse double"

    def batches(it):
        for pdf in it:
            codes_col, err_col = [], []
            for v in pdf[vec_col]:
                x = np.asarray(v, dtype="float64").reshape(m, sub)
                d2 = ((b - x[:, None, :]) ** 2).sum(axis=2)
                c = d2.argmin(axis=1)
                codes_col.append(c.astype("int32"))
                err_col.append(float(d2[np.arange(m), c].sum() / (m * sub)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "__codes": codes_col,
                    "__recon_mse": err_col,
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(batches, schema)


def pq_encode_replayable(
    embeddings: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``pq_encode_with_error`` with a CONTRACTED float fold order, so a
    SQL oracle can replay every output bit (the q_embedding_pq
    promotion): per-subspace squared distance accumulates over the
    dims SEQUENTIALLY left-to-right starting from 0.0 (matching
    DuckDB's ``list_reduce`` over the 8 squared diffs — IEEE doubles,
    0.0 + v == v), and the per-vector reconstruction MSE folds the m
    chosen distances in subspace order before one power-of-two scale
    (/dim — exact in binary FP). ``pq_encode_with_error`` keeps numpy's
    pairwise ``.sum`` for throughput; this twin is for oracle-gated
    paths where the last ulp is part of the contract. Ties at argmin
    take the lowest code on both engines (exact-equality doubles)."""
    m, k, sub = books.shape
    b = books.copy()
    schema = f"{id_col} long, __codes array<int>, __recon_mse double"

    def batches(it):
        for pdf in it:
            codes_col, err_col = [], []
            for v in pdf[vec_col]:
                x = np.asarray(v, dtype="float64").reshape(m, sub)
                d2 = np.zeros((m, k))
                for d in range(sub):  # sequential per-dim left fold
                    diff = x[:, d : d + 1] - b[:, :, d]
                    d2 = d2 + diff * diff
                c = d2.argmin(axis=1)
                acc = 0.0
                for i in range(m):  # subspace-order left fold
                    acc = acc + float(d2[i, c[i]])
                codes_col.append(c.astype("int32"))
                err_col.append(acc / (m * sub))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "__codes": codes_col,
                    "__recon_mse": err_col,
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(batches, schema)


def adc_lut_replayable(books: np.ndarray, query_vec) -> list[list[float]]:
    """``adc_lut`` with the same contracted fold order as
    ``pq_encode_replayable``: each (subspace, code) inner product is a
    sequential left fold over the sub dims in pure Python doubles —
    bit-identical to DuckDB's ``list_reduce`` over the products —
    instead of einsum's BLAS ordering. Driver-sized (m × k floats)."""
    m, k, sub = books.shape
    q = [float(v) for v in query_vec]
    lut: list[list[float]] = []
    for i in range(m):
        row = []
        for j in range(k):
            acc = 0.0
            for d in range(sub):
                acc = acc + q[i * sub + d] * float(books[i, j, d])
            row.append(acc)
        lut.append(row)
    return lut


def adc_lut(books: np.ndarray, query_vec) -> np.ndarray:
    """(m × k) asymmetric-distance lookup table: the inner product of
    each of the query's m subvectors with every codeword in that
    subspace. THE single home of the LUT construction — IVFADC and
    plain PQ retrieval must share it so the codeword layout convention
    cannot drift between callers."""
    m, k, sub = books.shape
    q = np.asarray(query_vec, dtype="float64").reshape(m, sub)
    return np.einsum("ms,mks->mk", q, books)


def adc_score(codes_col, lut_col) -> F.Column:
    """JVM-side ADC fold: look each of the row's m codes up in its LUT
    row and sum — whole-stage codegen, no Python in the scan. Codes are
    0-based; SQL ``element_at`` is 1-based, hence the ``c + 1`` (the
    single home of that convention)."""
    return F.aggregate(
        F.zip_with(
            codes_col,
            lut_col,
            lambda c, row: F.element_at(row, c + F.lit(1)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_adc_topk(
    encoded: DataFrame,
    books: np.ndarray,
    query_vec: list[float],
    k_top: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes, fully JVM-side: the
    query builds an (m × k) inner-product lookup table driver-side
    (tiny), broadcast as a literal array-of-arrays; each row's score is
    a zip_with/element_at fold over its m codes — whole-stage codegen,
    no Python in the query path, TakeOrderedAndProject for the top-k.
    This is the shape that scans a billion codes cheaply: 8 bytes per
    row and an 8-term add."""
    m, k, sub = books.shape
    lut = adc_lut(books, query_vec)
    lut_col = F.array(
        *[
            F.array(*[F.lit(float(lut[i, j])) for j in range(k)])
            for i in range(m)
        ]
    )
    score = adc_score(F.col("__codes"), lut_col)
    return (
        encoded.select(F.col(id_col), score.alias("adc_score"), "__recon_mse")
        .orderBy(F.col("adc_score").desc(), F.col(id_col).asc())
        .limit(k_top)
    )
