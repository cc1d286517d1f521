"""Round-6 batch 28 (SURVEY.md §2.4 / LLM-pipeline feature prep):
TARGET ENCODING (smoothed category→mean replacement, the standard
high-cardinality categorical feature for tabular training sets) and
the CATEGORICAL ASSOCIATION TABLE (per-cell PMI/lift between two
discrete columns — the exact-count decomposition of mutual
information, the profiler's "are these columns related?" panel for
non-numerics, complementing q_type_weekday_chisq's χ²).

Exactness: counts and cents are exact integers; lift is a mirrored
IEEE ratio; PMI's ln is rounded to 6 places PER ROW (the q_dq_benford
precedent — cross-engine libm agrees through 6 decimals, and no
rounded floats are ever summed, which would re-introduce order
dependence)."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# Smoothing pseudo-count: the encoding of a category with n samples
# blends n:_M between its own mean and the global mean (Micci-Barreca
# 2001, the standard smoothed target encoder).
_M = 20


@query(
    "q_target_encoding",
    oracle=f"""
    WITH j AS (
      SELECT c.c_mktsegment AS segment,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
             CAST(SUM(cents) AS BIGINT) AS sum_all
      FROM j
    )
    SELECT j.segment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(j.cents) AS BIGINT) AS sum_cents,
           CAST(SUM(j.cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS raw_mean_cents,
           (CAST(SUM(j.cents) AS DOUBLE)
            + {_M}.0 * (CAST(MIN(g.sum_all) AS DOUBLE)
                        / CAST(MIN(g.n_all) AS DOUBLE)))
           / (CAST(COUNT(*) AS DOUBLE) + {_M}.0) AS encoded_cents
    FROM j, g
    GROUP BY j.segment
    ORDER BY j.segment
    """,
)
def q_target_encoding(spark, sf_dir):
    """SMOOTHED TARGET ENCODING of market segment against order value:
    enc(c) = (Σ_c y + m·μ_global) / (n_c + m) with m=20 — the encoder
    that replaces a categorical column with a leakage-damped target
    mean when building tabular training features. Emits n, the raw
    category mean, and the smoothed encoding per segment.

    Scale shape: one partial-aggregated groupBy at category grain plus
    a broadcast 1-row global aggregate — the encoder fits any
    cardinality because the output is category-grain, and applying it
    back to rows is a broadcast join. Exact integer cents end to end;
    the blend is a mirrored IEEE chain."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    j = orders.join(
        cust.select("c_custkey", "c_mktsegment"),
        orders["o_custkey"] == cust["c_custkey"],
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    g = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
        F.sum("cents").cast("bigint").alias("sum_all"),
    )
    per = j.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
    )
    jj = per.crossJoin(F.broadcast(g))
    mu_g = F.col("sum_all").cast("double") / F.col("n_all").cast("double")
    return jj.select(
        "segment",
        "n",
        "sum_cents",
        (F.col("sum_cents").cast("double") / F.col("n").cast("double")).alias(
            "raw_mean_cents"
        ),
        (
            (F.col("sum_cents").cast("double") + F.lit(float(_M)) * mu_g)
            / (F.col("n").cast("double") + F.lit(float(_M)))
        ).alias("encoded_cents"),
    ).orderBy("segment")


@query(
    "q_assoc_pmi",
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), cells AS (
      SELECT segment, priority, CAST(COUNT(*) AS BIGINT) AS c_xy
      FROM j GROUP BY 1, 2
    ), mx AS (
      SELECT segment, CAST(COUNT(*) AS BIGINT) AS c_x FROM j GROUP BY 1
    ), my AS (
      SELECT priority, CAST(COUNT(*) AS BIGINT) AS c_y FROM j GROUP BY 1
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM j
    )
    SELECT cells.segment, cells.priority, cells.c_xy, mx.c_x, my.c_y,
           tot.n,
           (CAST(cells.c_xy AS DOUBLE) * CAST(tot.n AS DOUBLE))
             / (CAST(mx.c_x AS DOUBLE) * CAST(my.c_y AS DOUBLE)) AS lift,
           ROUND(LN((CAST(cells.c_xy AS DOUBLE) * CAST(tot.n AS DOUBLE))
             / (CAST(mx.c_x AS DOUBLE) * CAST(my.c_y AS DOUBLE))), 6)
             AS pmi_round6
    FROM cells JOIN mx ON cells.segment = mx.segment
               JOIN my ON cells.priority = my.priority
               CROSS JOIN tot
    ORDER BY cells.segment, cells.priority
    """,
)
def q_assoc_pmi(spark, sf_dir):
    """ASSOCIATION TABLE between market segment and order priority:
    every contingency cell with its observed count, marginals, lift
    (observed/expected, an exact IEEE ratio), and pointwise mutual
    information ln(lift) rounded to 6 places per row — the exact-count
    decomposition a profiler sums into mutual information, emitted at
    cell grain so no rounded floats are ever added (order-dependent).

    Scale shape: three partial-aggregated counts (cell, two marginals)
    over one shuffled join of fact to broadcast dim; marginals and the
    1-row total broadcast back into the cell table. Cell cardinality
    = |X|·|Y|, independent of row count. No SinglePartition."""
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    j = orders.join(
        cust.select("c_custkey", "c_mktsegment"),
        orders["o_custkey"] == cust["c_custkey"],
    ).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("o_orderpriority").alias("priority"),
    )
    cells = j.groupBy("segment", "priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_xy")
    )
    mx = j.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_x")
    )
    my = j.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_y")
    )
    tot = j.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    lift = (F.col("c_xy").cast("double") * F.col("n").cast("double")) / (
        F.col("c_x").cast("double") * F.col("c_y").cast("double")
    )
    return (
        cells.join(F.broadcast(mx), "segment")
        .join(F.broadcast(my), "priority")
        .crossJoin(F.broadcast(tot))
        .select(
            "segment",
            "priority",
            "c_xy",
            "c_x",
            "c_y",
            "n",
            lift.alias("lift"),
            F.round(F.log(lift), 6).alias("pmi_round6"),
        )
        .orderBy("segment", "priority")
    )
