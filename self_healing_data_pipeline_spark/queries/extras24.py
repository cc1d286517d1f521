"""Round-6 batch 6 (SURVEY.md §2.3/§2.4/§2.11): RUNTIME JOIN PRUNING
with a Bloom-style position filter (the runtime-filter / DPP pattern
for big fact⋈dim joins), exact WEIGHTED MEDIAN selection, and
item-item COLLABORATIVE FILTERING neighbors (the co-purchase
recommender beside q_basket_rules' directed rules).

Reference scope: the catalog/ETL app delegates arbitrary analytics to
its embedded SQL engine (`APP/services/pgliteService.ts:36-49`); these
are the warehouse-grade forms a 100 TB Spark deployment needs."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# Bloom grid: positions per hash seed. At 100 TB the dim side may hold
# millions of keys; the filter stays <= 2*BLOOM_M rows regardless (the
# point of a Bloom filter vs broadcasting the raw key set), and the
# false-positive rate (1 - e^{-n/m})^2 is tuned by raising BLOOM_M.
BLOOM_M = 4096
_BLOOM_SEEDS = (0x5EED1, 0x5EED2)


@query(
    "q_bloom_join",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_regionkey = 0
    GROUP BY 1 ORDER BY 1
    """,
)
def q_bloom_join(spark, sf_dir):
    """RUNTIME BLOOM-FILTER JOIN PRUNING: revenue by supplier nation
    for one region, with the fact scan pre-filtered by a Bloom-style
    position filter built from the (filtered) dim side — the
    runtime-filter pattern (Spark's own runtime bloom / dynamic
    partition pruning) made explicit as a composable DataFrame plan.

    How: the qualifying suppliers hash to ``pmod(xxhash64(key, seed),
    m)`` under two seeds; each seed's DISTINCT position set (<= m rows
    by construction, however many dim keys exist) broadcasts into a
    LEFT SEMI join against the fact's computed positions. A fact row
    survives only if BOTH probes hit — exactly a k=2 Bloom test, with
    the bitmap realized as two broadcast hash sets so the probe stays
    in whole-stage codegen. False positives then fall out of the exact
    broadcast dim join, so the result is EXACTLY the plain join (the
    oracle) — the filter is a pure pruning layer.

    Scale shape: the only full-fact stages are the two broadcast semi
    probes (narrow, no shuffle) and the final broadcast join +
    partial-aggregated rollup; the fact is never shuffled. With a
    1/5-of-nations region the probes drop ~80% of fact rows before
    any join work — at 100 TB that is the difference between scanning
    and shuffling."""
    nat = read_table(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 0)
    sup = read_table(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    )
    dim = sup.select("s_suppkey", "n_name")

    li = read_table(spark, sf_dir, "lineitem")
    pruned = li
    for seed in _BLOOM_SEEDS:
        pos = F.pmod(F.xxhash64(F.col("s_suppkey"), F.lit(seed)), F.lit(BLOOM_M))
        probe = F.pmod(F.xxhash64(F.col("l_suppkey"), F.lit(seed)), F.lit(BLOOM_M))
        positions = dim.select(pos.alias("__pos")).distinct()
        pruned = pruned.join(
            F.broadcast(positions),
            probe == F.col("__pos"),
            "left_semi",
        )
    return (
        pruned.join(F.broadcast(dim), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("revenue_cents"),
        )
        .orderBy("nation")
    )


@query(
    "q_weighted_median",
    oracle="""
    WITH grain AS (
      SELECT l_returnflag AS flag,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY 1, 2
    ), c AS (
      SELECT flag, cents, w,
             SUM(w) OVER (PARTITION BY flag ORDER BY cents
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cumw,
             SUM(w) OVER (PARTITION BY flag) AS total
      FROM grain
    )
    SELECT flag,
           CAST(MIN(cents) AS BIGINT) AS median_cents,
           CAST(MAX(total) AS BIGINT) AS total_weight
    FROM c WHERE 2 * cumw >= total
    GROUP BY flag ORDER BY flag
    """,
)
def q_weighted_median(spark, sf_dir):
    """Exact WEIGHTED MEDIAN of line price per return flag, weighted
    by quantity — the robust-center statistic percentile sketches
    approximate, computed exactly by rank selection (lower weighted
    median: the smallest value whose cumulative weight reaches half
    the total; entirely integer arithmetic, no interpolation).

    Scale shape: the raw fact collapses map-side to the (flag, cents)
    VALUE GRAIN first — the ordered pass then runs over at most
    |price domain| rows per flag (a value-bounded set that does NOT
    grow with fact rows; ~10^6 distinct cents at any SF), partitioned
    by flag. The same two-phase trick as q_percentile_bands: weights
    travel as exact int64, 2*cumw >= total avoids any division."""
    li = read_table(spark, sf_dir, "lineitem")
    grain = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    ).agg(
        F.sum(F.round(F.col("l_quantity")).cast("bigint"))
        .cast("bigint")
        .alias("w")
    )
    from pyspark.sql import Window

    wo = (
        Window.partitionBy("flag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("flag")
    c = grain.select(
        "flag",
        "cents",
        F.sum("w").over(wo).alias("cumw"),
        F.sum("w").over(wt).alias("total"),
    )
    return (
        c.filter(2 * F.col("cumw") >= F.col("total"))
        .groupBy("flag")
        .agg(
            F.min("cents").cast("bigint").alias("median_cents"),
            F.max("total").cast("bigint").alias("total_weight"),
        )
        .orderBy("flag")
    )


@query(
    "q_item_cf",
    oracle="""
    WITH grain AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ), freq AS (
      SELECT pk, CAST(COUNT(*) AS BIGINT) AS n FROM grain GROUP BY 1
    ), co AS (
      SELECT a.pk AS part_a, b.pk AS part_b, CAST(COUNT(*) AS BIGINT) AS co
      FROM grain a JOIN grain b ON a.ok = b.ok AND a.pk <> b.pk
      GROUP BY 1, 2 HAVING COUNT(*) >= 3
    ), scored AS (
      SELECT co.part_a, co.part_b, co.co, fa.n AS n_a, fb.n AS n_b,
             CAST(co.co * co.co AS DOUBLE) / CAST(fa.n * fb.n AS DOUBLE)
               AS cf_score
      FROM co
      JOIN freq fa ON co.part_a = fa.pk
      JOIN freq fb ON co.part_b = fb.pk
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY part_a
                 ORDER BY cf_score DESC, co DESC, part_b) AS rk
      FROM scored
    )
    SELECT part_a, part_b, co, n_a, n_b, cf_score, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 3 ORDER BY part_a, rk
    """,
)
def q_item_cf(spark, sf_dir):
    """Item-item COLLABORATIVE FILTERING neighbors: for every part,
    the top-3 most-similar parts by squared co-purchase cosine
    co²/(n_a·n_b) with support >= 3 — the "customers who bought this
    also bought" recommender, the undirected-similarity complement of
    q_basket_rules' directed confidence/lift rules.

    Determinism: similarity is ONE IEEE division of exact integer
    cross-products (identical operands → identical double on both
    engines); the per-part rank carries a total tie-break chain
    (score desc, co desc, neighbor id). Squared cosine preserves the
    cosine ORDER while avoiding engine-varying sqrt-last-ulp risk.

    Scale shape (round-13, the co_order_pairs basket discipline): the
    per-order distinct part BASKET is staged once (one collect_set
    shuffle — the in-group DISTINCT the old checkpointed grain
    expressed as a distinct exchange), co-purchase pairs come from a
    bounded in-array explode of BOTH directions (the old within-order
    self-join's two extra exchanges are gone; pair volume is still the
    q_basket_pairs Σ|basket|² bound, baskets ≤ ~7 parts), and the part
    frequencies explode the same staged baskets. Frequencies join back
    via the (part) key — dim-sized, broadcastable; the final rank
    window partitions by part_a. No global sort, no SinglePartition
    stage."""
    li = read_table(spark, sf_dir, "lineitem")
    from self_healing_data_pipeline_spark.operators.graph import (
        order_baskets,
    )

    baskets = order_baskets(li).localCheckpoint(eager=True)
    freq = (
        baskets.select(F.explode("parts").alias("pk"))
        .groupBy("pk")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    # both directed pairs per basket: x paired with every OTHER member
    pair_expr = (
        "flatten(transform(parts, x ->"
        " transform(filter(parts, y -> y != x),"
        " y -> struct(x AS part_a, y AS part_b))))"
    )
    co = (
        baskets.select(F.explode(F.expr(pair_expr)).alias("pr"))
        .groupBy(
            F.col("pr.part_a").alias("part_a"),
            F.col("pr.part_b").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("co"))
        .filter(F.col("co") >= 3)
    )
    scored = (
        co.join(
            freq.select(F.col("pk"), F.col("n").alias("n_a")),
            F.col("part_a") == F.col("pk"),
        )
        .drop("pk")
        .join(
            freq.select(F.col("pk"), F.col("n").alias("n_b")),
            F.col("part_b") == F.col("pk"),
        )
        .drop("pk")
        .withColumn(
            "cf_score",
            (F.col("co") * F.col("co")).cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double"),
        )
    )
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy("part_a").orderBy(
            F.col("cf_score").desc(), F.col("co").desc(), F.col("part_b")
        )
    )
    return (
        scored.withColumn("rk", rk.cast("bigint"))
        .filter(F.col("rk") <= 3)
        .select("part_a", "part_b", "co", "n_a", "n_b", "cf_score", "rk")
        .orderBy("part_a", "rk")
    )
