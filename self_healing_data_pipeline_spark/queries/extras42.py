"""Round-6 batch 24 (SURVEY.md §2.4 profiling): CORRELATION MATRIX in
ONE moment pass (every numeric-column pair's Pearson r — the
profiler's relationships panel, generalizing q_agg_corr's single
pair) and VALUE PERCENTILE LOOKUP (where fixed probe values sit in
the distribution — the inverse of percentile selection, exact ppm)."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# The numeric lineitem columns profiled pairwise, as exact integer
# cents (two decimals ×100).
_VARS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
_PAIRS = list(itertools.combinations(range(len(_VARS)), 2))

_CENTS = {v: f"CAST(ROUND({v} * 100) AS BIGINT)" for v in _VARS}

# Integer floor means (exact: sums of cents fit int64 comfortably).
_MU_SQL = ", ".join(
    f"SUM({_CENTS[v]}) // COUNT(*) AS m_{i}" for i, v in enumerate(_VARS)
)

# Centered moments: shifting by ANY per-variable constant leaves
# Pearson r mathematically unchanged, and the integer-mean shift keeps
# every moment inside int64 (centered cents² sums ~ n·var ≈ 2.4e18 at
# sf0.1) so the BIGINT→DOUBLE conversion is correctly rounded on both
# engines — the raw-moment form overflowed int64 AND hit DuckDB's
# one-ulp int128→double conversion above 2^53.
_CMOMS_SQL = ", ".join(
    [
        f"CAST(CAST(SUM(({_CENTS[_VARS[i]]} - m.m_{i})"
        f" * ({_CENTS[_VARS[j]]} - m.m_{j})) AS BIGINT) AS DOUBLE)"
        f" AS sp_{i}_{j}"
        for i in range(len(_VARS))
        for j in range(i, len(_VARS))
    ]
    + [
        f"CAST(CAST(SUM({_CENTS[_VARS[i]]} - m.m_{i}) AS BIGINT) AS DOUBLE)"
        f" AS s_{i}"
        for i in range(len(_VARS))
    ]
)


def _corr_sql(i: int, j: int) -> str:
    return (
        f"(n * sp_{i}_{j} - s_{i} * s_{j})"
        f" / (SQRT(GREATEST(n * sp_{i}_{i} - s_{i} * s_{i}, 0.0))"
        f" * SQRT(GREATEST(n * sp_{j}_{j} - s_{j} * s_{j}, 0.0)))"
    )


_PAIR_SELECTS = " UNION ALL ".join(
    f"SELECT '{_VARS[i]}' AS var_a, '{_VARS[j]}' AS var_b, "
    f"{_corr_sql(i, j)} AS corr FROM moms"
    for i, j in _PAIRS
)


@query(
    "q_corr_matrix",
    oracle=f"""
    WITH m AS (
      SELECT {_MU_SQL} FROM lineitem
    ), moms AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n, {_CMOMS_SQL}
      FROM lineitem, m
    )
    SELECT var_a, var_b, corr FROM ({_PAIR_SELECTS})
    ORDER BY var_a, var_b
    """,
)
def q_corr_matrix(spark, sf_dir):
    """One-pass CORRELATION MATRIX: Pearson r for all 6 pairs of the
    four numeric lineitem columns from a single 15-moment aggregate
    over CENTERED exact-integer cents — the profiler's relationships
    panel, generalizing q_agg_corr: never one job per pair.

    Determinism and the centering trick: shifting each variable by its
    integer floor mean leaves r EXACTLY invariant while shrinking
    every moment into int64 (n·variance scale instead of n·mean²), so
    sums stay exact integers and the BIGINT→DOUBLE hop is correctly
    rounded on both engines — the raw-moment form both overflowed
    int64 at sf0.1 AND exposed DuckDB's one-ulp int128→double
    conversion above 2^53 (found by the oracle gate; this query
    documents the fence). Every r is then a mirrored IEEE chain.

    Scale shape: one tiny means pass (broadcast 1-row) + ONE
    partial-aggregated moment scan; the 6-row matrix unfolds from the
    scalar frame. Column count grows moment WIDTH (k²), not passes."""
    li = read_table(spark, sf_dir, "lineitem")
    cents = [
        F.round(F.col(v) * 100).cast("bigint").alias(f"c_{i}")
        for i, v in enumerate(_VARS)
    ]
    base = li.select(*cents)
    mu_aggs = []
    for i in range(len(_VARS)):
        s = F.sum(F.col(f"c_{i}"))
        n = F.count(F.lit(1))
        mu_aggs.append(((s - F.pmod(s, n)) / n).cast("bigint").alias(f"m_{i}"))
    mu = base.agg(*mu_aggs)

    j = base.crossJoin(F.broadcast(mu))
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for i in range(len(_VARS)):
        for k in range(i, len(_VARS)):
            aggs.append(
                F.sum(
                    (F.col(f"c_{i}") - F.col(f"m_{i}"))
                    * (F.col(f"c_{k}") - F.col(f"m_{k}"))
                )
                .cast("bigint")
                .cast("double")
                .alias(f"sp_{i}_{k}")
            )
    for i in range(len(_VARS)):
        aggs.append(
            F.sum(F.col(f"c_{i}") - F.col(f"m_{i}"))
            .cast("bigint")
            .cast("double")
            .alias(f"s_{i}")
        )
    m = j.agg(*aggs)

    def corr(i, k):
        n = F.col("n")
        si, sk = F.col(f"s_{i}"), F.col(f"s_{k}")
        sik = F.col(f"sp_{i}_{k}")
        sii, skk = F.col(f"sp_{i}_{i}"), F.col(f"sp_{k}_{k}")
        return (n * sik - si * sk) / (
            F.sqrt(F.greatest(n * sii - si * si, F.lit(0.0)))
            * F.sqrt(F.greatest(n * skk - sk * sk, F.lit(0.0)))
        )

    rows = None
    for i, k in _PAIRS:
        r = m.select(
            F.lit(_VARS[i]).alias("var_a"),
            F.lit(_VARS[k]).alias("var_b"),
            corr(i, k).alias("corr"),
        )
        rows = r if rows is None else rows.unionAll(r)
    return rows.orderBy("var_a", "var_b")


_PROBES = (100000, 1000000, 10000000)  # cents: $1k, $10k, $100k


@query(
    "q_value_percentile",
    oracle=f"""
    WITH v AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders
    ), probes AS (
      SELECT * FROM (VALUES {", ".join(f"({p})" for p in _PROBES)})
        AS t(probe_cents)
    )
    SELECT CAST(p.probe_cents AS BIGINT) AS probe_cents,
           CAST(SUM(CASE WHEN v.cents <= p.probe_cents THEN 1 ELSE 0 END)
                AS BIGINT) AS n_at_or_below,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN v.cents <= p.probe_cents THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS pct_rank_ppm
    FROM v, probes p
    GROUP BY p.probe_cents ORDER BY probe_cents
    """,
)
def q_value_percentile(spark, sf_dir):
    """VALUE PERCENTILE LOOKUP — the inverse of percentile selection:
    for fixed probe amounts ($1k/$10k/$100k), the exact-ppm fraction
    of orders at or below each — "is this order big?" answered
    against the live distribution (the threshold-setting companion to
    q_histogram_equidepth and q_percentile_cont).

    Scale shape: the 3-row probe grid broadcasts into ONE
    conditional-counter scan (one counter per probe, one pass — the
    q_dq_expectations discipline); integer ppm."""
    o = read_table(spark, sf_dir, "orders")
    v = o.select(F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"))
    probes = F.broadcast(
        spark.createDataFrame([(p,) for p in _PROBES], "probe_cents long")
    )
    j = v.crossJoin(probes)
    hits = F.sum(
        F.when(F.col("cents") <= F.col("probe_cents"), 1).otherwise(0)
    ).cast("bigint")
    n = F.count(F.lit(1)).cast("bigint")
    agg = j.groupBy("probe_cents").agg(
        hits.alias("n_at_or_below"), n.alias("n_total")
    )
    scaled = F.col("n_at_or_below") * F.lit(1000000)
    ppm = ((scaled - F.pmod(scaled, F.col("n_total"))) / F.col("n_total")).cast(
        "bigint"
    )
    return agg.select(
        "probe_cents", "n_at_or_below", "n_total", ppm.alias("pct_rank_ppm")
    ).orderBy("probe_cents")
