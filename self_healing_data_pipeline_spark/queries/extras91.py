"""Round-10 batch 74 (SURVEY.md §2.5 / §2.11): two closers —

- ``q_window_range_interval``: RANGE frame bounded by a TIME interval
  (``RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW`` over a
  timestamp order key) — the standard-SQL window shape the numeric
  RANGE keys (q_window_range_frame) don't cover; both engines parse
  the same text natively. (A ``regr_*`` aggregate key was drafted for
  this batch and DROPPED pre-commit: q_regr_slope (extras45.py)
  already hash-verifies grouped OLS slope/intercept/R² on the same
  columns — a second formulation would be padding, not surface.)
- ``q_semdedup``: SemDeDup-style SEMANTIC dedup over the embedding
  corpus (Abbas et al. 2023, arXiv:2303.09540 — public method):
  k-means-assign each vector to a coarse cluster, compute pairwise
  cosine ONLY within clusters, drop any vector with a lower-id
  neighbor at cosine ≥ τ and report which representative it
  duplicates. The cluster prefilter is what makes semantic dedup
  feasible at 100 TB: pair work is bounded by cluster size (K grows
  with n to keep clusters bounded), never O(n²) over the corpus —
  contrast q_dedup_embedding, which blocks on a GIVEN label column.

Reference parity: the dedup/profiling surface of
`automated-data-catalog-&-etl/services/geminiService.ts` (the catalog
app delegates table analysis to an engine; these are engine-side).
"""

from __future__ import annotations

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# Same text in both engines: Spark and DuckDB both parse the interval
# RANGE frame natively (no rewrite — the point of the key).
_RANGE_INTERVAL_SQL = """
SELECT event_id, user_id,
       {ts_fmt} AS ts_s,
       COUNT(*) OVER w AS n_1h,
       -- DECIMAL(18,2): |value| < 10^16 provably fits, where (12,2)
       -- would silently NULL >= 10^10 in Spark's non-ANSI cast while
       -- DuckDB raised — a latent cross-engine divergence if fixture
       -- value ranges grow (round-11 advisor item)
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
FROM {table}
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


@query(
    "q_window_range_interval",
    oracle=_RANGE_INTERVAL_SQL.format(
        ts_fmt="STRFTIME(ts, '%Y-%m-%d %H:%M:%S')", table="events"
    ),
)
def q_window_range_interval(spark, sf_dir):
    """Time-interval RANGE frame: per user, the trailing-1-hour event
    count and exact-decimal value sum at every event (the rolling-
    window primitive behind rate limits, trailing spend, and feature
    windows). RANGE peers (equal timestamps) enter the frame together
    in both engines — SQL:2011 semantics, not ROWS. The decimal SUM
    keeps the frame aggregation bit-reproducible regardless of
    intra-frame order; COUNT is exact by nature.

    Scale shape: one hash exchange on user_id + per-partition sort —
    identical to any other window key; the frame is evaluated by a
    running multiset over the sorted run (Spark's unbounded-preceding
    sliding frame machinery), no per-row rescan."""
    ev = read_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("__ev_ri")
    return spark.sql(
        _RANGE_INTERVAL_SQL.format(
            ts_fmt="date_format(ts, 'yyyy-MM-dd HH:mm:ss')",
            table="__ev_ri",
        )
    )


_SEMDEDUP_TAU = 0.4
# Cluster count scales with corpus size (the paper's regime): K =
# max(16, n // TARGET) keeps the average cluster ~TARGET vectors, so
# within-cluster pair work grows LINEARLY with n instead of
# quadratically at fixed K. Mirrored exactly in the oracle.
_SEMDEDUP_MIN_K = 16
_SEMDEDUP_TARGET_CLUSTER = 125

# Sequential-fold dot-product SQL (float32 products, strict left-fold
# double accumulation): the single source of the fold discipline lives
# in extras55 beside its documentation — a third copy here would have
# to be kept in sync by hand (review finding).
from self_healing_data_pipeline_spark.queries.extras55 import (  # noqa: E402
    _dot32,
    _dot64,
)


@query(
    "q_semdedup",
    oracle=f"""
    WITH ed AS (
      SELECT vec_id,
             list_transform(embedding, v -> CAST(v AS DOUBLE)) AS x
      FROM embeddings
    ), kk AS (
      SELECT GREATEST({_SEMDEDUP_MIN_K},
                      COUNT(*) // {_SEMDEDUP_TARGET_CLUSTER}) AS kv
      FROM embeddings
    ), cent AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS centroid_id,
             list_transform(x, v -> v / (CASE WHEN nrm = 0 THEN 1.0
                                              ELSE nrm END)) AS c
      FROM (SELECT vec_id, x,
                   SQRT(list_reduce(list_transform(x, u -> u * u),
                                    (a, b) -> a + b)) AS nrm
            FROM (SELECT vec_id, x,
                         ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
                  FROM ed), kk
            WHERE rn <= kk.kv)
    ), assign AS (
      SELECT vec_id, centroid_id FROM (
        SELECT ed.vec_id, cent.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY ed.vec_id
                 ORDER BY {_dot64('ed.x', 'cent.c')} DESC,
                          cent.centroid_id) AS rn
        FROM ed, cent) WHERE rn = 1
    ), nrm AS (
      -- zero-norm vectors have no cosine: excluded from the pair
      -- space on BOTH engines (Spark: NULL from 0/0; DuckDB: NaN,
      -- which compares GREATER than any number — divergent without
      -- this symmetric predicate)
      SELECT vec_id, nrm FROM (
        SELECT vec_id,
               SQRT({_dot32('e.embedding', 'e.embedding')}) AS nrm
        FROM embeddings e
      ) WHERE nrm > 0
    ), pairs AS (
      SELECT ar.vec_id AS id_r, al.vec_id AS id_l,
             ar.centroid_id AS cid,
             {_dot32('el.embedding', 'er.embedding')}
               / (nl.nrm * nr.nrm) AS cos
      FROM assign al
      JOIN assign ar ON al.centroid_id = ar.centroid_id
                    AND al.vec_id < ar.vec_id
      JOIN embeddings el ON el.vec_id = al.vec_id
      JOIN embeddings er ON er.vec_id = ar.vec_id
      JOIN nrm nl ON nl.vec_id = al.vec_id
      JOIN nrm nr ON nr.vec_id = ar.vec_id
    )
    SELECT id_r AS vec_id, CAST(cid AS INT) AS cluster_id,
           MIN(id_l) AS dup_of, ARG_MIN(cos, id_l) AS cos_sim
    FROM pairs WHERE cos >= {_SEMDEDUP_TAU}
    GROUP BY id_r, cid ORDER BY vec_id
    """,
)
def q_semdedup(spark, sf_dir):
    """SemDeDup — semantic dedup by cluster-bounded cosine (Abbas et
    al. 2023, arXiv:2303.09540): assign every embedding to its nearest
    of K seed centroids (the same fixed-seed quantizer q_kmeans_assign
    hash-verifies), then WITHIN each cluster drop any vector with a
    lower-id neighbor at cosine ≥ τ=0.4; output one row
    per dropped vector with its keep-first representative (lowest
    qualifying id) and that pair's cosine.

    Determinism: pair cosines are sequential-fold float32-product /
    double-accumulate chains (functions.vector.dot_product ≡ the
    oracle's list_reduce — bit-identical), norms likewise, so the
    gated cos_sim doubles match exactly. The one non-mirrored chain is
    the centroid ASSIGNMENT (Arrow matmul vs the oracle's fold — the
    accepted q_kmeans_assign residual: argmax flips only on dots tied
    within ~1e-14, never on this fixture).

    Scale shape (operators.similarity.semdedup_drops): the engine runs
    at VALUE grain — bit-identical vectors collapse before the pair
    join, which is what survives the template-page adversary (one hot
    vector at 20% of corpus mass — the --embskew tier; at vector grain
    that cluster alone is O(n²) pairs). The collapse is EXACT (the
    minimum qualifying id for any copy is always a value's rep — see
    the operator docstring), so the DuckDB oracle deliberately stays
    at VECTOR grain: an independent formulation of the same
    semantics, not a rewrite twin. K is NOT fixed — K = max(16,
    n // 125) keeps the average cluster at ~125 vectors (the paper's
    regime), so pair volume grows LINEARLY with the corpus (a fixed K
    would make it quadratic — probed and rejected pre-commit); the
    oracle mirrors the same K rule via a COUNT(*) scalar."""
    from self_healing_data_pipeline_spark.operators.similarity import (
        semdedup_drops,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    return semdedup_drops(
        emb,
        tau=_SEMDEDUP_TAU,
        min_k=_SEMDEDUP_MIN_K,
        target_cluster=_SEMDEDUP_TARGET_CLUSTER,
    )
