"""Shared graph builders: the support-filtered part CO-OCCURRENCE
graph over lineitem, used by triangle counting (`extras8`), k-hop
reach (`extras9`), and association rules (`extras10`) — one Spark
definition and ONE oracle CTE so the three consumers can never count
different graphs.

Scale shape (shared by construction): the (order, part) grain
self-joins WITHIN order only — pair volume is Σ|basket|², bounded by
per-order line counts, never |parts|² — and the weight-filtered edge
list collapses map-side before any consumer touches it."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: DuckDB twin: CTEs `pp` (distinct order-part grain) and `cop`
#: (weighted co-order pairs, support >= 2, p1 < p2). Splice as
#: ``WITH {CO_PAIR_CTE_SQL}, ...``.
CO_PAIR_CTE_SQL = """pp AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), cop AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM pp a JOIN pp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )"""


def order_part_grain(li: DataFrame) -> DataFrame:
    """Distinct (order, part) grain — ``pp`` in the oracle CTE."""
    return li.select("l_orderkey", "l_partkey").distinct()


def co_order_pairs(li: DataFrame) -> DataFrame:
    """Weighted co-order part pairs: (p1 < p2, w = #orders containing
    both), support-filtered at w >= 2 — the Spark twin of
    ``CO_PAIR_CTE_SQL``'s ``cop``."""
    pp = order_part_grain(li)
    rhs = pp.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pb")
    )
    return (
        pp.join(rhs, (pp.l_orderkey == rhs.ok) & (pp.l_partkey < rhs.pb))
        .groupBy(F.col("l_partkey").alias("p1"), F.col("pb").alias("p2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .where(F.col("w") >= 2)
    )


def co_order_edges(li: DataFrame) -> DataFrame:
    """The unweighted edge list (p1 < p2) of the co-occurrence graph."""
    return co_order_pairs(li).select("p1", "p2")
