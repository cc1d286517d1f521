"""Round-6 batch 30 (SURVEY.md §2.11 DQ / LLM-pipeline): the
KOLMOGOROV-SMIRNOV DRIFT statistic (max ECDF gap between two eras of
the order-value distribution — the numeric-drift gate that catches
what q_dq_category_drift's PSI catches for categoricals) and the
EMBEDDING COVARIANCE MATRIX (dimension-pair cov/corr of the embedding
space in ONE pass — the collapsed-dimension / anisotropy audit for
representation quality, q_corr_matrix lifted onto array columns).

Exactness: the KS gap compares ECDFs by CROSS-MULTIPLIED EXACT
INTEGERS (|cum_a·n_b − cum_b·n_a| — no float ever enters the argmax),
so the drift verdict is exact rational arithmetic; embedding floats
become exact micro-units (×10⁶) and the centered-moment fence keeps
every sum correctly rounded through BIGINT→DOUBLE."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# ECDF evaluation grid: cents >> 13 ($81.92 buckets). The KS of the
# bucketed ECDF lower-bounds the continuous KS and is the standard
# fixed-grid form a warehouse can evaluate without a global sort.
_KS_SHIFT = 13
# Superband width for the two-phase bucket-grain prefix sum.
_SUPER_SHIFT = 6

# Embedding dims profiled pairwise (first 8 of 64 — the matrix is
# k² wide; widening k widens ONE aggregate, never adds passes).
_EDIMS = 8


@query(
    "q_ks_drift",
    oracle=f"""
    WITH e AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) >> {_KS_SHIFT}
               AS bucket,
             (o_orderdate < TIMESTAMP '1998-01-01') AS pre
      FROM orders
    ), b AS (
      SELECT bucket,
             CAST(SUM(CASE WHEN pre THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(SUM(CASE WHEN pre THEN 0 ELSE 1 END) AS BIGINT) AS n_b
      FROM e GROUP BY 1
    ), c AS (
      SELECT bucket,
             SUM(n_a) OVER w AS cum_a, SUM(n_b) OVER w AS cum_b
      FROM b
      WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    ), t AS (
      SELECT CAST(SUM(n_a) AS BIGINT) AS tot_a,
             CAST(SUM(n_b) AS BIGINT) AS tot_b
      FROM b
    )
    SELECT c.bucket AS at_bucket,
           CAST((c.bucket + 1) << {_KS_SHIFT} AS BIGINT) AS edge_cents,
           CAST(c.cum_a AS BIGINT) AS cum_pre,
           CAST(c.cum_b AS BIGINT) AS cum_post,
           t.tot_a AS n_pre, t.tot_b AS n_post,
           CAST(ABS(c.cum_a * t.tot_b - c.cum_b * t.tot_a) AS BIGINT)
             AS ks_num,
           CAST(ABS(c.cum_a * t.tot_b - c.cum_b * t.tot_a) AS DOUBLE)
             / (CAST(t.tot_a AS DOUBLE) * CAST(t.tot_b AS DOUBLE)) AS ks
    FROM c CROSS JOIN t
    ORDER BY ks_num DESC, at_bucket LIMIT 1
    """,
)
def q_ks_drift(spark, sf_dir):
    """TWO-SAMPLE KS DRIFT between pre-1998 and post-1998 order
    values: bucket both eras' cents onto a fixed $81.92 grid, build
    both ECDFs as exact integer prefix sums, and report the grid point
    with the largest gap — the numeric distribution-shift gate a
    training pipeline runs between snapshots before trusting a
    feature. The gap ranks by |cum_a·n_b − cum_b·n_a| (exact integer
    cross-multiplication), so the verdict never touches a float; the
    reported ks value is one final mirrored IEEE division.

    Scale shape: era counts are ONE partial-aggregated groupBy at
    bucket grain (bounded by value range / 8192, not by rows); the
    prefix sum is TWO-PHASE — per-superband subtotals (64 buckets
    each) cumulate over the tiny superband frame, then a narrow
    within-superband window — the q_gini_concentration /
    q_shard_assign pattern, so no window ever sees more than
    superband-count or 64 rows. TakeOrdered(1) picks the argmax."""
    orders = read_table(spark, sf_dir, "orders")
    e = orders.select(
        F.shiftright(
            F.round(F.col("o_totalprice") * 100).cast("bigint"), _KS_SHIFT
        ).alias("bucket"),
        (F.col("o_orderdate") < F.lit("1998-01-01")).alias("pre"),
    )
    b = e.groupBy("bucket").agg(
        F.sum(F.when(F.col("pre"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("pre"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_b"),
    ).withColumn("super", F.shiftright(F.col("bucket"), _SUPER_SHIFT))
    # Phase 1: superband subtotals → offsets (tiny frame).
    supers = b.groupBy("super").agg(
        F.sum("n_a").alias("sa"), F.sum("n_b").alias("sb")
    )
    ws = Window.orderBy("super").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = supers.select(
        "super",
        (F.sum("sa").over(ws) - F.col("sa")).alias("off_a"),
        (F.sum("sb").over(ws) - F.col("sb")).alias("off_b"),
    )
    # Phase 2: narrow within-superband running sum.
    ww = (
        Window.partitionBy("super")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = b.join(offsets, "super").select(
        "bucket",
        (F.col("off_a") + F.sum("n_a").over(ww)).alias("cum_a"),
        (F.col("off_b") + F.sum("n_b").over(ww)).alias("cum_b"),
    )
    t = b.agg(
        F.sum("n_a").cast("bigint").alias("tot_a"),
        F.sum("n_b").cast("bigint").alias("tot_b"),
    )
    num = F.abs(
        F.col("cum_a") * F.col("tot_b") - F.col("cum_b") * F.col("tot_a")
    )
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            F.col("bucket").alias("at_bucket"),
            F.shiftleft(F.col("bucket") + 1, _KS_SHIFT)
            .cast("bigint")
            .alias("edge_cents"),
            F.col("cum_a").cast("bigint").alias("cum_pre"),
            F.col("cum_b").cast("bigint").alias("cum_post"),
            F.col("tot_a").alias("n_pre"),
            F.col("tot_b").alias("n_post"),
            num.cast("bigint").alias("ks_num"),
            (
                num.cast("double")
                / (F.col("tot_a").cast("double") * F.col("tot_b").cast("double"))
            ).alias("ks"),
        )
        .orderBy(F.col("ks_num").desc(), F.col("at_bucket"))
        .limit(1)
    )


def _emb_cov_oracle() -> str:
    micro = [
        f"CAST(ROUND(CAST(embedding[{i + 1}] AS DOUBLE) * 1000000)"
        f" AS BIGINT) AS c_{i}"
        for i in range(_EDIMS)
    ]
    mu = ", ".join(
        f"SUM(c_{i}) // COUNT(*) AS m_{i}" for i in range(_EDIMS)
    )
    moms = ", ".join(
        f"CAST(CAST(SUM((v.c_{i} - m.m_{i}) * (v.c_{j} - m.m_{j}))"
        f" AS BIGINT) AS DOUBLE) AS sp_{i}_{j}"
        for i in range(_EDIMS)
        for j in range(i, _EDIMS)
    ) + ", " + ", ".join(
        f"CAST(CAST(SUM(v.c_{i} - m.m_{i}) AS BIGINT) AS DOUBLE) AS s_{i}"
        for i in range(_EDIMS)
    )
    cells = " UNION ALL ".join(
        f"SELECT {i} AS dim_a, {j} AS dim_b, n_rows,"
        f" (n * sp_{i}_{j} - s_{i} * s_{j}) / (n * (n - 1.0)) AS cov_micro2,"
        f" (n * sp_{i}_{j} - s_{i} * s_{j})"
        f" / (SQRT(GREATEST(n * sp_{i}_{i} - s_{i} * s_{i}, 0.0))"
        f" * SQRT(GREATEST(n * sp_{j}_{j} - s_{j} * s_{j}, 0.0))) AS corr"
        f" FROM moms"
        for i in range(_EDIMS)
        for j in range(i, _EDIMS)
    )
    return f"""
    WITH v AS (
      SELECT {", ".join(micro)} FROM embeddings
    ), m AS (
      SELECT {mu} FROM v
    ), moms AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_rows, {moms}
      FROM v, m
    )
    SELECT dim_a, dim_b, n_rows, cov_micro2, corr FROM ({cells})
    ORDER BY dim_a, dim_b
    """


@query("q_embedding_covariance", oracle=_emb_cov_oracle())
def q_embedding_covariance(spark, sf_dir):
    """EMBEDDING-SPACE COVARIANCE/CORRELATION MATRIX: sample cov and
    Pearson r for every pair of the first 8 embedding dimensions, in
    ONE moment pass over the vector column — the representation-
    quality audit that exposes collapsed dimensions (zero variance)
    and anisotropy (strongly correlated dims) before a similarity
    index is built on the space. q_corr_matrix's centered-integer
    discipline applied to array elements: floats become exact
    micro-units, per-dim integer floor means center the moments into
    int64, and cov/corr are mirrored IEEE chains.

    Scale shape: one tiny means pass (broadcast 1-row) + ONE
    partial-aggregated moment scan reading only the vector column;
    k dims widen the aggregate to k(k+1)/2 + k columns but never add
    passes or shuffles. The 36-row matrix unfolds from the scalar
    frame driver-side-free."""
    emb = read_table(spark, sf_dir, "embeddings")
    v = emb.select(
        *[
            F.round(F.col("embedding").getItem(i).cast("double") * 1000000)
            .cast("bigint")
            .alias(f"c_{i}")
            for i in range(_EDIMS)
        ]
    )
    mu_aggs = []
    for i in range(_EDIMS):
        s, n_ = F.sum(F.col(f"c_{i}")), F.count(F.lit(1))
        mu_aggs.append(
            ((s - F.pmod(s, n_)) / n_).cast("bigint").alias(f"m_{i}")
        )
    mu = v.agg(*mu_aggs)
    j = v.crossJoin(F.broadcast(mu))
    aggs = [
        F.count(F.lit(1)).cast("double").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    ]
    for i in range(_EDIMS):
        for k in range(i, _EDIMS):
            aggs.append(
                F.sum(
                    (F.col(f"c_{i}") - F.col(f"m_{i}"))
                    * (F.col(f"c_{k}") - F.col(f"m_{k}"))
                )
                .cast("bigint")
                .cast("double")
                .alias(f"sp_{i}_{k}")
            )
    for i in range(_EDIMS):
        aggs.append(
            F.sum(F.col(f"c_{i}") - F.col(f"m_{i}"))
            .cast("bigint")
            .cast("double")
            .alias(f"s_{i}")
        )
    moms = j.agg(*aggs)
    # Unfold the matrix by exploding ONE struct array projected from
    # the 1-row moment frame — a unionAll of 36 selects would
    # re-evaluate the aggregate per cell (measured 7.6s → 1.4s).
    cells = []
    for i in range(_EDIMS):
        for k in range(i, _EDIMS):
            n = F.col("n")
            si, sk = F.col(f"s_{i}"), F.col(f"s_{k}")
            sik = F.col(f"sp_{i}_{k}")
            sii, skk = F.col(f"sp_{i}_{i}"), F.col(f"sp_{k}_{k}")
            num = n * sik - si * sk
            cells.append(
                F.struct(
                    F.lit(i).cast("int").alias("dim_a"),
                    F.lit(k).cast("int").alias("dim_b"),
                    F.col("n_rows").alias("n_rows"),
                    (num / (n * (n - F.lit(1.0)))).alias("cov_micro2"),
                    (
                        num
                        / (
                            F.sqrt(F.greatest(n * sii - si * si, F.lit(0.0)))
                            * F.sqrt(
                                F.greatest(n * skk - sk * sk, F.lit(0.0))
                            )
                        )
                    ).alias("corr"),
                )
            )
    return (
        moms.select(F.explode(F.array(*cells)).alias("cell"))
        .select("cell.*")
        .orderBy("dim_a", "dim_b")
    )
