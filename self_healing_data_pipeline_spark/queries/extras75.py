"""Round-7 batch 58 (SURVEY.md §2.10 ML statistics): OLS TREND
(least-squares revenue slope per order priority from one exact-integer
moment pass — the regression surface every BI layer exposes) and
EMBEDDING PCA (top principal component of the 64-dim embedding space
via a distributed Gram pass + driver-side eigendecomposition — the
anisotropy diagnostic run before building a similarity index).

Exactness: OLS moments are exact BIGINT sums of centered day indices
and cents, each ≤ 2^53 so the cast to double is value-exact, and the
slope/intercept float chains mirror token-for-token — oracle-backed.
PCA is rows-only (eigenvector floats are accumulation-order-sensitive)
with an in-row Rayleigh-residual witness."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

_EDIM = 64


@query(
    "q_ols_trend",
    oracle="""
    WITH base AS (
      SELECT o_orderpriority AS priority,
             CAST(CAST(o_orderdate AS DATE)
                  - (SELECT MIN(CAST(o_orderdate AS DATE)) FROM orders)
                  AS BIGINT) AS x,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS y
      FROM orders
    ), m AS (
      SELECT priority,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(CAST(COUNT(*) AS BIGINT) AS DOUBLE) AS n,
             CAST(CAST(SUM(x) AS BIGINT) AS DOUBLE) AS sx,
             CAST(CAST(SUM(y) AS BIGINT) AS DOUBLE) AS sy,
             CAST(CAST(SUM(x * y) AS BIGINT) AS DOUBLE) AS sxy,
             CAST(CAST(SUM(x * x) AS BIGINT) AS DOUBLE) AS sxx
      FROM base GROUP BY priority
    )
    SELECT priority, n_orders,
           (n * sxy - sx * sy) / (n * sxx - sx * sx)
             AS slope_cents_per_day,
           (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
             AS intercept_cents
    FROM m ORDER BY priority
    """,
)
def q_ols_trend(spark, sf_dir):
    """ORDINARY LEAST SQUARES revenue trend per order priority: the
    slope (cents/day) and intercept of o_totalprice against days since
    the first order — "is this priority class growing or shrinking" as
    one closed-form regression, the moment-pass discipline of
    q_embedding_covariance applied to the time axis.

    Exactness: x is the integer day offset from the broadcast global
    min date (centering keeps Σxy ≈ 5·10¹⁴ < 2^53, so every exact
    BIGINT moment converts to double value-exactly); slope and
    intercept are mirrored IEEE chains over those exact moments —
    bit-identical cross-engine with no decimal tricks needed.

    Scale shape: one scalar min-date subquery (broadcast), then ONE
    partial-aggregated moment scan at the priority grain (5 groups);
    closed-form division at the end. No windows, no sorts beyond the
    5-row output."""
    o = read_table(spark, sf_dir, "orders")
    d0 = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("d0")
    )
    base = o.crossJoin(F.broadcast(d0)).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(F.col("o_orderdate").cast("date"), F.col("d0"))
        .cast("bigint")
        .alias("x"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("y"),
    )
    m = base.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.count(F.lit(1)).cast("bigint").cast("double").alias("n"),
        F.sum("x").cast("bigint").cast("double").alias("sx"),
        F.sum("y").cast("bigint").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").cast("double").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        "priority",
        "n_orders",
        slope.alias("slope_cents_per_day"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias(
            "intercept_cents"
        ),
    ).orderBy("priority")


@query("q_embedding_pca")  # rows-only: eigenvector floats, witness in-row
def q_embedding_pca(spark, sf_dir):
    """TOP PRINCIPAL COMPONENT of the embedding space: per dimension,
    the leading eigenvector loading, the eigenvalue, and the variance
    share — the anisotropy diagnostic (a dominant component means
    cosine scores are driven by one direction; common embedding
    pathologies show up here before an ANN index bakes them in).
    Extends q_embedding_covariance (8-dim exact matrix) to the full 64
    dims, trading the exact-integer oracle for a Gram pass + exact
    eigensolve with an in-row witness.

    Spark shape: ONE mapInPandas pass emits per-partition Gram
    partials (X'X as a 4096-float row, the column-sum vector, and the
    row count) — the shuffle carries partitions × (64² + 64 + 1)
    numbers, never vectors; the driver reduces the partials (the same
    tiny-state pattern as pq_train/ivf_train), forms the sample
    covariance, and runs 50 deterministic power iterations from the
    uniform start vector. Witness per row: the Rayleigh residual
    ||Cv − λv||₂ ≤ 10⁻⁶·λ (converged eigenpair) AND λ within
    (trace/64, trace] (a real dominant component, not numerical
    noise)."""
    emb = read_table(spark, sf_dir, "embeddings")

    def gram_batches(it):
        g = np.zeros((_EDIM, _EDIM))
        s = np.zeros(_EDIM)
        n = 0
        for pdf in it:
            if not len(pdf):
                continue
            x = np.vstack(pdf["embedding"].to_numpy()).astype("float64")
            g += x.T @ x
            s += x.sum(axis=0)
            n += len(x)
        yield pd.DataFrame(
            {"g": [g.ravel()], "s": [s], "n": [n]}
        )

    partials = emb.select("embedding").mapInPandas(
        gram_batches, "g array<double>, s array<double>, n long"
    ).collect()
    g = np.zeros((_EDIM, _EDIM))
    s = np.zeros(_EDIM)
    n = 0
    for r in partials:
        g += np.asarray(r["g"]).reshape(_EDIM, _EDIM)
        s += np.asarray(r["s"])
        n += r["n"]
    cov = (g - np.outer(s, s) / n) / (n - 1)
    # Symmetric eigendecomposition of the 64x64 driver-side covariance
    # (LAPACK dsyevd — deterministic). Power iteration was tried and
    # REJECTED: the fixture's near-uniform embeddings have an almost
    # flat Marchenko-Pastur spectrum (lambda2/lambda1 ~ 0.97), so the
    # iteration converges too slowly to pass a tight residual witness.
    eigvals, eigvecs = np.linalg.eigh(cov)
    lam = float(eigvals[-1])
    v = eigvecs[:, -1]
    resid = float(np.linalg.norm(cov @ v - lam * v))
    trace = float(np.trace(cov))
    # Sign convention: make the largest-|loading| coordinate positive
    # so the answer doesn't flip between runs.
    if v[np.argmax(np.abs(v))] < 0:
        v = -v
    ok = (resid <= 1e-6 * lam) and (trace / _EDIM < lam <= trace)
    rows = [
        (int(i), float(v[i]), lam, lam / trace, bool(ok))
        for i in range(_EDIM)
    ]
    return spark.createDataFrame(
        rows,
        "dim int, loading double, eigenvalue double, var_share double, "
        "witness_ok boolean",
    )
