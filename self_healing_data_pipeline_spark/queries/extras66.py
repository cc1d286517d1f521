"""Round-6 batch 49 (SURVEY.md §2.9 supply chain / §2.1 storage):
BULLWHIP RATIO (variance amplification between monthly ordered and
shipped quantities — the Lee/Padmanabhan/Whang supply-chain
instability metric) and CLUSTERING DEPTH (per column, the expected
number of pages whose min/max zone overlaps a uniformly random point
of the domain — the scalar that says whether zone maps will actually
skip anything, completing the q_zone_map_prune / q_sort_key_whatif /
q_encoding_advisor storage-layout suite).

Exactness: both reduce to exact integer sums at bounded grains
(months / pages); the final statistics are fixed-order float chains
over those integers."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# Same page model as q_encoding_advisor / q_compaction_bins.
_PG_SQL = (
    "STRFTIME(l_shipdate, '%Y-%m') || '/' || CAST(l_orderkey % 8 AS VARCHAR)"
)
# Integer-domain columns audited for zone-map usefulness.
_DEPTH_COLS = (
    ("l_quantity", "CAST(ROUND(l_quantity) AS BIGINT)"),
    ("l_shipdate_day", "CAST(l_shipdate AS DATE) - DATE '1970-01-05'"),
    ("l_partkey", "l_partkey"),
)


@query(
    "q_bullwhip",
    oracle="""
    WITH om AS (
      SELECT STRFTIME(o.o_orderdate, '%Y-%m') AS m,
             CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1
    ), sm AS (
      SELECT STRFTIME(l_shipdate, '%Y-%m') AS m,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS q
      FROM lineitem GROUP BY 1
    ), mo AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS BIGINT) AS s1,
             CAST(SUM(q * q) AS BIGINT) AS s2
      FROM om
    ), ms AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS BIGINT) AS s1,
             CAST(SUM(q * q) AS BIGINT) AS s2
      FROM sm
    )
    SELECT mo.n AS n_order_months, ms.n AS n_ship_months,
           CAST(mo.s2 AS DOUBLE) / CAST(mo.n AS DOUBLE)
             - (CAST(mo.s1 AS DOUBLE) / CAST(mo.n AS DOUBLE))
               * (CAST(mo.s1 AS DOUBLE) / CAST(mo.n AS DOUBLE))
             AS order_var,
           CAST(ms.s2 AS DOUBLE) / CAST(ms.n AS DOUBLE)
             - (CAST(ms.s1 AS DOUBLE) / CAST(ms.n AS DOUBLE))
               * (CAST(ms.s1 AS DOUBLE) / CAST(ms.n AS DOUBLE))
             AS ship_var,
           (CAST(ms.s2 AS DOUBLE) / CAST(ms.n AS DOUBLE)
            - (CAST(ms.s1 AS DOUBLE) / CAST(ms.n AS DOUBLE))
              * (CAST(ms.s1 AS DOUBLE) / CAST(ms.n AS DOUBLE)))
           / (CAST(mo.s2 AS DOUBLE) / CAST(mo.n AS DOUBLE)
              - (CAST(mo.s1 AS DOUBLE) / CAST(mo.n AS DOUBLE))
                * (CAST(mo.s1 AS DOUBLE) / CAST(mo.n AS DOUBLE)))
             AS bullwhip
    FROM mo CROSS JOIN ms
    """,
)
def q_bullwhip(spark, sf_dir):
    """BULLWHIP RATIO: Var(monthly shipped quantity) / Var(monthly
    ordered quantity) — the Lee et al. (1997) variance-amplification
    diagnostic; > 1 means the fulfillment side swings harder than
    demand (batching/backlog effects), the instability a supply
    planner damps first. Demand is keyed by ORDER month, fulfillment
    by SHIP month, over the same lines.

    Scale shape: two month-grain exact-integer aggregates (the ship
    side needs no join at all; the order side is the co-partitionable
    orderkey join), then integer raw moments over the BOUNDED month
    grain (~84 rows) and one fixed-order float chain. The two scalar
    reductions are the only single-partition stages."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    qty = F.round(F.col("l_quantity")).cast("bigint")
    om = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("m"))
        .agg(F.sum(qty).cast("bigint").alias("q"))
    )
    sm = li.groupBy(
        F.date_format("l_shipdate", "yyyy-MM").alias("m")
    ).agg(F.sum(qty).cast("bigint").alias("q"))

    def moments(df, n_name):
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias(n_name),
            F.sum("q").cast("bigint").alias(n_name + "_s1"),
            F.sum(F.col("q") * F.col("q")).cast("bigint").alias(
                n_name + "_s2"
            ),
        )

    mo = moments(om, "n_order_months")
    ms = moments(sm, "n_ship_months")

    def var_of(n, s1, s2):
        nd = F.col(n).cast("double")
        m1 = F.col(s1).cast("double") / nd
        return F.col(s2).cast("double") / nd - m1 * m1

    order_var = var_of("n_order_months", "n_order_months_s1", "n_order_months_s2")
    ship_var = var_of("n_ship_months", "n_ship_months_s1", "n_ship_months_s2")
    return mo.crossJoin(F.broadcast(ms)).select(
        "n_order_months",
        "n_ship_months",
        order_var.alias("order_var"),
        ship_var.alias("ship_var"),
        (ship_var / order_var).alias("bullwhip"),
    )


def _depth_oracle() -> str:
    branches = []
    for name, expr in _DEPTH_COLS:
        branches.append(
            f"""
    SELECT '{name}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_pages,
           CAST(SUM(hi - lo + 1) AS BIGINT) AS total_span,
           CAST(MAX(hi) - MIN(lo) + 1 AS BIGINT) AS domain_span,
           CAST(SUM(hi - lo + 1) AS DOUBLE)
             / CAST(MAX(hi) - MIN(lo) + 1 AS DOUBLE) AS clustering_depth
    FROM (
      SELECT pg, MIN(v) AS lo, MAX(v) AS hi
      FROM (SELECT {_PG_SQL} AS pg, {expr} AS v FROM lineitem)
      GROUP BY pg
    )"""
        )
    return " UNION ALL ".join(branches) + " ORDER BY column_name"


@query("q_clustering_depth", oracle=_depth_oracle())
def q_clustering_depth(spark, sf_dir):
    """CLUSTERING DEPTH: for each integer-domain column, the expected
    number of pages a point query must touch — Σ(page_max − page_min
    + 1) / (domain_max − domain_min + 1), i.e. how many page zones
    overlap a uniformly random domain point. depth ≈ 1 means the
    column is perfectly clustered (zone maps skip almost everything);
    depth ≈ n_pages means zones are useless and q_sort_key_whatif's
    rewrite is worth it. The Snowflake-style clustering-depth metric,
    computed exactly.

    Scale shape: one page-grain MIN/MAX aggregate per column (pages
    are bounded and parallel), then a 1-row scalar rollup per column;
    columns widen the union, not the data path. All spans are exact
    integers (quantities rounded, dates as epoch days, keys raw)."""
    li = read_table(spark, sf_dir, "lineitem")
    pg = F.concat(
        F.date_format("l_shipdate", "yyyy-MM"),
        F.lit("/"),
        (F.col("l_orderkey") % 8).cast("string"),
    )
    spark_exprs = {
        "l_quantity": F.round(F.col("l_quantity")).cast("bigint"),
        "l_shipdate_day": F.datediff(
            F.col("l_shipdate"), F.lit("1970-01-05").cast("date")
        ).cast("bigint"),
        "l_partkey": F.col("l_partkey").cast("bigint"),
    }
    outs = []
    for name, _ in _DEPTH_COLS:
        zones = (
            li.select(pg.alias("pg"), spark_exprs[name].alias("v"))
            .groupBy("pg")
            .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        )
        stats = zones.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pages"),
            F.sum(F.col("hi") - F.col("lo") + 1)
            .cast("bigint")
            .alias("total_span"),
            (F.max("hi") - F.min("lo") + 1).cast("bigint").alias(
                "domain_span"
            ),
        )
        outs.append(
            stats.select(
                F.lit(name).alias("column_name"),
                "n_pages",
                "total_span",
                "domain_span",
                (
                    F.col("total_span").cast("double")
                    / F.col("domain_span").cast("double")
                ).alias("clustering_depth"),
            )
        )
    out = outs[0]
    for x in outs[1:]:
        out = out.unionAll(x)
    return out.orderBy("column_name")
