"""Round-6 batch 25 (SURVEY.md §2.3 range joins / §2.9): FIFO
ALLOCATION — the first-in-first-out matching of issues to receipts
(inventory costing, lot tracking, payment application) that looks
inherently sequential, expressed in CLOSED FORM as an INTERVAL
ALIGNMENT: on each supplier's cumulative-quantity axis, receipt r
occupies [Rprev, Rcum) and issue i occupies [Iprev, Icum), and FIFO
matches exactly their overlap — qty(r,i) = min(Rcum, Icum) −
max(Rprev, Iprev) where positive. The q_inventory_floor trick
(kill the sequential fold with an identity) applied to MATCHING."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# Cumulative-axis band width for the candidate join: intervals are
# line quantities (1..50), so each spans 1-2 bands and band population
# stays O(B/avg_qty) — candidates scale linearly with lines, never
# |receipts|×|issues| per supplier.
_BAND = 256


@query(
    "q_fifo_allocation",
    oracle="""
    WITH mv AS (
      SELECT l_suppkey AS sk,
             l_returnflag = 'R' AS is_recv,
             CAST(ROUND(l_quantity) AS BIGINT) AS qty,
             l_shipdate AS o1, l_orderkey AS o2, l_linenumber AS o3
      FROM lineitem
    ), recv AS (
      SELECT sk, qty,
             SUM(qty) OVER w AS rcum,
             SUM(qty) OVER w - qty AS rprev
      FROM mv WHERE is_recv
      WINDOW w AS (PARTITION BY sk ORDER BY o1, o2, o3, qty
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), issu AS (
      SELECT sk, qty,
             SUM(qty) OVER w AS icum,
             SUM(qty) OVER w - qty AS iprev
      FROM mv WHERE NOT is_recv
      WINDOW w AS (PARTITION BY sk ORDER BY o1, o2, o3, qty
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), alloc AS (
      SELECT r.sk,
             LEAST(r.rcum, i.icum) - GREATEST(r.rprev, i.iprev) AS m
      FROM recv r JOIN issu i
        ON r.sk = i.sk AND r.rprev < i.icum AND i.iprev < r.rcum
    )
    SELECT a.sk AS suppkey,
           CAST(COUNT(*) AS BIGINT) AS n_allocations,
           CAST(SUM(a.m) AS BIGINT) AS matched_qty,
           CAST(MAX(t.recv_q) AS BIGINT) AS received_qty,
           CAST(MAX(t.iss_q) AS BIGINT) AS issued_qty
    FROM alloc a
    JOIN (
      SELECT sk,
             SUM(CASE WHEN is_recv THEN qty ELSE 0 END) AS recv_q,
             SUM(CASE WHEN is_recv THEN 0 ELSE qty END) AS iss_q
      FROM mv GROUP BY sk
    ) t ON a.sk = t.sk
    GROUP BY a.sk ORDER BY suppkey
    """,
)
def q_fifo_allocation(spark, sf_dir):
    """FIFO ALLOCATION per supplier: receipts (returned lines) match
    issues (everything else) first-in-first-out by ship order, and the
    report counts allocations, matched quantity (provably
    min(received, issued) — the FIFO conservation law the oracle
    re-derives), and both side totals.

    The sequential "consume earliest remaining receipt" loop becomes a
    RANGE JOIN via the cumulative-axis identity: FIFO matches receipt
    and issue iff their [prev, cum) intervals overlap, with matched
    qty = interval overlap — exact integers end to end.

    The arrival order appends qty as the final window key (round-12
    queued tie-order batch): the fixture's (l_orderkey, l_linenumber)
    is not unique, and two same-side rows tying on every ordering key
    INCLUDING qty occupy interchangeable cumulative intervals, so the
    allocation report is layout-independent on both engines.

    Scale shape: cumulative sums are per-supplier windows
    (q_inventory_floor's pass); the candidate join BANDS the
    cumulative axis (each interval explodes to its ≤1+qty/256 bands;
    join keys (sk, band); exact overlap filter after) so candidate
    volume stays linear in lines instead of |R|×|I| per supplier —
    the same banding discipline as q_join_range/LSH. The oracle keeps
    the plain range-join formulation."""
    li = read_table(spark, sf_dir, "lineitem")
    mv = li.select(
        F.col("l_suppkey").alias("sk"),
        (F.col("l_returnflag") == "R").alias("is_recv"),
        F.round(F.col("l_quantity")).cast("bigint").alias("qty"),
        F.col("l_shipdate").alias("o1"),
        F.col("l_orderkey").alias("o2"),
        F.col("l_linenumber").alias("o3"),
    )
    w = Window.partitionBy("sk").orderBy("o1", "o2", "o3", "qty").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )

    def cums(df, cum, prev):
        return df.select(
            "sk",
            "qty",
            F.sum("qty").over(w).alias(cum),
            (F.sum("qty").over(w) - F.col("qty")).alias(prev),
        )

    recv = cums(mv.filter(F.col("is_recv")), "rcum", "rprev")
    issu = cums(mv.filter(~F.col("is_recv")), "icum", "iprev")

    def banded(df, lo, hi):
        return df.withColumn(
            "band",
            F.explode(
                F.sequence(
                    F.shiftright(F.col(lo), 8), F.shiftright(F.col(hi) - 1, 8)
                )
            ),
        )

    rb = banded(recv, "rprev", "rcum")
    ib = banded(issu, "iprev", "icum").select(
        F.col("sk").alias("sk2"), "band", "icum", "iprev"
    )
    cand = (
        rb.join(ib, (F.col("sk") == F.col("sk2")) & (rb["band"] == ib["band"]))
        .filter(
            (F.col("rprev") < F.col("icum")) & (F.col("iprev") < F.col("rcum"))
        )
        .select("sk", "rprev", "rcum", "iprev", "icum")
        .distinct()
    )
    alloc = cand.select(
        "sk",
        (
            F.least(F.col("rcum"), F.col("icum"))
            - F.greatest(F.col("rprev"), F.col("iprev"))
        ).alias("m"),
    )
    totals = mv.groupBy("sk").agg(
        F.sum(F.when(F.col("is_recv"), F.col("qty")).otherwise(0)).alias(
            "recv_q"
        ),
        F.sum(F.when(F.col("is_recv"), 0).otherwise(F.col("qty"))).alias(
            "iss_q"
        ),
    )
    return (
        alloc.groupBy(F.col("sk").alias("suppkey"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_allocations"),
            F.sum("m").cast("bigint").alias("matched_qty"),
        )
        .join(
            totals.select(
                F.col("sk").alias("suppkey"),
                F.col("recv_q").cast("bigint").alias("received_qty"),
                F.col("iss_q").cast("bigint").alias("issued_qty"),
            ),
            "suppkey",
        )
        .orderBy("suppkey")
    )
