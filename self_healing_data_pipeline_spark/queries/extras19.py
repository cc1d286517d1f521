"""Round-6 batch 1 (SURVEY.md §2.9/§2.11): iterative graph ranking,
catalog dependency profiling, and operational time-series diagnostics —
PageRank over the part co-occurrence graph, functional-dependency
discovery, CUSUM change-point detection, day-of-week seasonality, and
a join-key skew report.

Cross-engine determinism (SURVEY.md §7 playbook): every iterative /
ratio quantity is computed in EXACT integer arithmetic as long as
possible — PageRank runs entirely in fixed-point BIGINT (integer floor
division is deterministic and its sums are order-independent, unlike
IEEE float addition), CUSUM is the algebraically-multiplied-out
``n·cumsum − t·total`` (no division at all), and shares/ratios perform
exactly ONE IEEE divide at the very end in mirrored operand order.

Reference parity: the catalog/relationship-discovery vision
(`automated-data-catalog-&-etl/README.md:7,21` — "relationships between
datasets", knowledge-graph view) is what FD discovery and the skew
report serve; the profiling surface (`services/geminiService.ts`
prompt fields) lists per-column dependency/quality facts this computes
deterministically.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from self_healing_data_pipeline_spark.operators.graph import (
    CO_PAIR_CTE_SQL as _CO_PAIR_CTE,
    co_order_edges,
)
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# PageRank fixed-point scale: ranks live in units of 1e-9. Chosen so
# the hottest node's incoming mass times 85 stays far under 2^63 even
# at ~1e9 nodes (mass per node is bounded by in-degree * SCALE / 100,
# and real co-occurrence in-degrees are << 1e6; a whole-graph bound of
# N * SCALE * 85 < 2^63 holds to N ~ 1e11 nodes at this scale).
_PR_SCALE = 1_000_000_000
_PR_BASE = (15 * _PR_SCALE) // 100  # teleport mass, exact integer


def _pr_iter_cte(prev: str, cur: str) -> str:
    """One unrolled PageRank iteration as a DuckDB CTE: contributions
    are BIGINT floor divisions rank//degree summed per destination —
    bit-identical to the Spark ``div`` lane."""
    return f"""{cur} AS (
      SELECT g.p AS p,
             CAST({_PR_BASE} + (85 * COALESCE(s.m, 0)) // 100 AS BIGINT) AS r
      FROM deg g LEFT JOIN (
        SELECT a.d AS p, SUM(r.r // g2.dg) AS m
        FROM adj a JOIN {prev} r ON a.s = r.p JOIN deg g2 ON g2.p = a.s
        GROUP BY 1
      ) s ON s.p = g.p
    )"""


@query(
    "q_pagerank",
    oracle=f"""
    WITH {_CO_PAIR_CTE}, e AS (
      SELECT p1, p2 FROM cop
    ), adj AS (
      SELECT p1 AS s, p2 AS d FROM e UNION ALL SELECT p2, p1 FROM e
    ), deg AS (
      SELECT s AS p, CAST(COUNT(*) AS BIGINT) AS dg FROM adj GROUP BY 1
    ), r0 AS (
      SELECT p, CAST({_PR_SCALE} AS BIGINT) AS r FROM deg
    ), {_pr_iter_cte('r0', 'r1')}, {_pr_iter_cte('r1', 'r2')},
       {_pr_iter_cte('r2', 'r3')}
    SELECT p AS part, r AS rank_fp FROM r3
    ORDER BY rank_fp DESC, part LIMIT 20
    """,
)
def q_pagerank(spark, sf_dir):
    """PageRank (3 iterations, damping 0.85) over the support-filtered
    part co-occurrence graph — the canonical iterative-graph-analytics
    operator (influence/centrality ranking), expressed Pregel-style as
    per-iteration join + aggregate rounds.

    Determinism: ranks are FIXED-POINT BIGINT (units of 1e-9).
    Per-edge contributions are integer floor divisions ``rank div
    degree`` (Spark ``div`` truncation == DuckDB ``//`` floor on
    non-negative operands), so the per-destination sums are
    order-independent — the property IEEE float addition lacks and the
    reason floating PageRank can't be oracle-checked bit-exact. The
    damping step is ``(85·m) div 100 + base`` in exact integers.

    Scale shape: each iteration is ONE shuffle — ranks join the
    adjacency list on the source key (both sides hash-partitioned on
    node id; on a real cluster the adjacency partitioning is computed
    once and reused across iterations), then contributions reduce
    map-side-partial on the destination key. State per node is 16
    bytes; nothing collects to the driver; iteration count is a
    constant (3), not data-dependent. Degrees are never zero by
    construction (every node in the edge list has an edge), so there
    is no dangling-mass correction term."""
    li = read_table(spark, sf_dir, "lineitem")
    e = co_order_edges(li)
    # Materialize the adjacency ONCE (the union-find convention,
    # operators/dedup.py): without this, each of the 3 iterations
    # re-plans the whole basket-pair build — 4× the most expensive
    # subtree. On a real cluster this is a persisted/checkpointed edge
    # RDD partitioned on the source key, reused by every iteration.
    adj = (
        e.select(F.col("p1").alias("s"), F.col("p2").alias("d"))
        .unionAll(e.select(F.col("p2").alias("s"), F.col("p1").alias("d")))
        .localCheckpoint(eager=True)
    )
    deg = adj.groupBy(F.col("s").alias("p")).agg(
        F.count(F.lit(1)).cast("bigint").alias("dg")
    ).localCheckpoint(eager=True)
    ranks = deg.select("p", F.lit(_PR_SCALE).cast("bigint").alias("r"))
    for _ in range(3):
        contrib = (
            adj.join(ranks.withColumnRenamed("p", "s"), "s")
            .join(deg.select(F.col("p").alias("s"), "dg"), "s")
            .select(F.col("d").alias("p"), F.expr("r div dg").alias("c"))
        )
        m = contrib.groupBy("p").agg(F.sum("c").alias("m"))
        ranks = deg.select("p").join(m, "p", "left").select(
            "p",
            (
                F.lit(_PR_BASE)
                + F.expr("(85 * coalesce(m, cast(0 as bigint))) div 100")
            ).cast("bigint").alias("r"),
        )
    return (
        ranks.select(F.col("p").alias("part"), F.col("r").alias("rank_fp"))
        .orderBy(F.col("rank_fp").desc(), "part")
        .limit(20)
    )


_FD_CANDIDATES = [
    ("nation", "n_nationkey", "n_name"),  # holds: key discovery
    ("nation", "n_name", "n_regionkey"),  # holds: genuine non-key FD
    ("part", "p_brand", "p_type"),        # fails: brand doesn't fix type
    ("customer", "c_nationkey", "c_mktsegment"),  # fails
    ("supplier", "s_nationkey", "s_acctbal"),     # fails (23/25 keys)
]


def _fd_select(tbl: str, det: str, dep: str) -> str:
    return f"""
      SELECT '{tbl}' AS tbl, '{det}' AS det, '{dep}' AS dep,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating,
             (SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0) AS holds
      FROM (SELECT {det} AS k, COUNT(DISTINCT {dep}) AS nd
            FROM {tbl} GROUP BY 1)"""


@query(
    "q_fd_discovery",
    oracle="SELECT * FROM ("
    + " UNION ALL ".join(_fd_select(*c) for c in _FD_CANDIDATES)
    + ") ORDER BY tbl, det",
)
def q_fd_discovery(spark, sf_dir):
    """Functional-dependency DISCOVERY over candidate column pairs —
    the catalog profiling op behind "relationships between datasets"
    (`automated-data-catalog-&-etl/README.md:21`): for each candidate
    determinant→dependent pair, how many determinant values exist and
    how many VIOLATE the dependency (more than one distinct dependent).
    On these fixtures ``n_nationkey→n_name`` (key discovery) and
    ``n_name→n_regionkey`` (a genuine non-key FD) hold; the other
    three genuinely fail — the report distinguishes them with exact
    counts, not samples.

    Scale shape: one groupBy per candidate on the determinant key with
    an exact COUNT(DISTINCT dep) — two-level partial aggregation, no
    row ever carries more than (det, dep); the per-candidate verdict
    reduces to a single row before the 4-row union. Candidate
    generation is config (a list), so the pass is embarrassingly
    parallel across candidates."""
    outs = []
    for tbl, det, dep in _FD_CANDIDATES:
        t = read_table(spark, sf_dir, tbl)
        per_key = t.groupBy(F.col(det).alias("k")).agg(
            F.countDistinct(dep).alias("nd")
        )
        viol = F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
        outs.append(
            per_key.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_keys"),
                viol.cast("bigint").alias("n_violating"),
                (viol == 0).alias("holds"),
            ).select(
                F.lit(tbl).alias("tbl"),
                F.lit(det).alias("det"),
                F.lit(dep).alias("dep"),
                "n_keys",
                "n_violating",
                "holds",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("tbl", "det")


@query(
    "q_changepoint_cusum",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS total
      FROM daily
    ), cur AS (
      SELECT day,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
             CAST(SUM(cents) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
      FROM daily
    )
    SELECT STRFTIME(day, '%Y-%m-%d') AS day_str, t,
           CAST(CAST(n AS HUGEINT) * cum - CAST(t AS HUGEINT) * total
                AS DOUBLE) AS cusum_scaled
    FROM cur, tot
    ORDER BY ABS(CAST(CAST(n AS HUGEINT) * cum
                      - CAST(t AS HUGEINT) * total AS DOUBLE)) DESC,
             day_str LIMIT 5
    """,
)
def q_changepoint_cusum(spark, sf_dir):
    """CUSUM change-point detection on the daily revenue series: the
    days where the cumulative deviation from the series mean peaks —
    the classic level-shift detector (did the process change here?),
    next to the anomaly/drift ops.

    Determinism: the textbook statistic ``Σ_{i<=t}(x_i − mean)``
    divides by n; multiplied out by n it becomes
    ``n·cumsum_t − t·total`` — ALL integer, no division, no float
    accumulation. The single lossy step is the final cast of that
    exact integer to DOUBLE (same integer → same IEEE double on both
    engines). Products are taken in HUGEINT/decimal lanes so
    petabyte-scale cents can't overflow.

    Scale shape: the raw scan collapses map-side-partial to DAY grain
    (bounded by the calendar — a few thousand rows at ANY data scale),
    so the ordered running-sum window over it is bounded work, the
    same bounded-grain exemption as the hourly interpolation op. The
    one-row (n, total) frame broadcasts."""
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("total"),
    )
    w = Window.orderBy("day")
    cur = daily.select(
        "day",
        F.row_number().over(w).cast("bigint").alias("t"),
        F.sum("cents")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("cum"),
    )
    dec = "decimal(38,0)"
    cusum = (
        F.col("n").cast(dec) * F.col("cum").cast(dec)
        - F.col("t").cast(dec) * F.col("total").cast(dec)
    ).cast("double")
    return (
        cur.crossJoin(F.broadcast(tot))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day_str"),
            "t",
            cusum.alias("cusum_scaled"),
        )
        .orderBy(F.abs(F.col("cusum_scaled")).desc(), "day_str")
        .limit(5)
    )


@query(
    "q_dow_seasonality",
    oracle="""
    WITH d AS (
      SELECT DAYOFWEEK(CAST(o_orderdate AS DATE)) + 1 AS dow,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), agg AS (
      SELECT CAST(dow AS INT) AS dow,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(cents) AS BIGINT) AS cents
      FROM d GROUP BY 1
    ), tot AS (
      SELECT CAST(SUM(cents) AS BIGINT) AS total FROM agg
    )
    SELECT dow, n_orders, cents,
           CAST(cents AS DOUBLE) / CAST(total AS DOUBLE) AS share,
           7.0 * (CAST(cents AS DOUBLE) / CAST(total AS DOUBLE))
             AS seasonal_index
    FROM agg, tot ORDER BY dow
    """,
)
def q_dow_seasonality(spark, sf_dir):
    """Day-of-week SEASONALITY decomposition of order revenue: per
    weekday, exact order count and cents plus the seasonal index
    (share × 7 — 1.0 means "an average day") — the first question
    asked of any operational time series, and the denominator for
    seasonally-adjusted anomaly thresholds.

    Determinism: Spark's ``dayofweek`` is 1-based Sunday=1, DuckDB's
    ``DAYOFWEEK`` is 0-based Sunday=0 — the oracle adds 1. Masses are
    exact cents; the ONE division (and the ×7.0) happens on the final
    7-row frame in mirrored operand order.

    Scale shape: a single scan collapsing map-side-partial to a 7-row
    grid; the 1-row total broadcasts back. Nothing here grows with
    data volume."""
    o = read_table(spark, sf_dir, "orders")
    agg = (
        o.select(
            F.dayofweek("o_orderdate").cast("int").alias("dow"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("dow")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
    )
    tot = agg.agg(F.sum("cents").cast("bigint").alias("total"))
    share = F.col("cents").cast("double") / F.col("total").cast("double")
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "n_orders",
            "cents",
            share.alias("share"),
            (F.lit(7.0) * share).alias("seasonal_index"),
        )
        .orderBy("dow")
    )


@query(
    "q_skew_report",
    oracle="""
    WITH kc AS (
      SELECT l_suppkey AS suppkey, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1
    ), st AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(cnt) AS BIGINT) AS total
      FROM kc
    )
    SELECT suppkey, cnt, n_keys,
           CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS share,
           CAST(cnt * n_keys AS DOUBLE) / CAST(total AS DOUBLE) AS skew_x_avg
    FROM kc, st ORDER BY cnt DESC, suppkey LIMIT 10
    """,
)
def q_skew_report(spark, sf_dir):
    """Join-key SKEW report for ``lineitem.l_suppkey``: the 10 heaviest
    keys with their row share and skew multiple vs the average key
    (``cnt · n_keys / total`` — 1.0 means perfectly uniform) — the
    diagnostic a 100 TB operator runs BEFORE a big join to decide
    whether salting / AQE skew-join handling is needed; companion to
    the salted-join ops that consume its answer.

    Determinism: counts and the ``cnt·n_keys`` numerator are exact
    BIGINT; each ratio is one IEEE divide in mirrored operand order on
    the final 10-row frame.

    Scale shape: key-grain groupBy with map-side partial aggregation
    (shuffles (key, count) only), a 1-row stats frame that broadcasts,
    and a TakeOrderedAndProject top-10 — no global sort."""
    li = read_table(spark, sf_dir, "lineitem")
    kc = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    st = kc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("cnt").cast("bigint").alias("total"),
    )
    return (
        kc.crossJoin(F.broadcast(st))
        .select(
            "suppkey",
            "cnt",
            "n_keys",
            (F.col("cnt").cast("double") / F.col("total").cast("double"))
            .alias("share"),
            (
                (F.col("cnt") * F.col("n_keys")).cast("double")
                / F.col("total").cast("double")
            ).alias("skew_x_avg"),
        )
        .orderBy(F.col("cnt").desc(), "suppkey")
        .limit(10)
    )
