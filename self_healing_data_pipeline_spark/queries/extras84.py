"""Round-9 batch 67 (SURVEY.md §2 surface-parity closers, round-8
verdict task #8): the last §2-adjacent SQL features of the reference's
delegated Postgres surface (`APP/services/pgliteService.ts:36-49` —
PGlite executes arbitrary SQL, so LATERAL, TABLESAMPLE and
QUALIFY-style filtered windows are all part of the capability the
reference exposes) still unexercised by a registered key:

- **q_join_lateral** — correlated LATERAL subqueries, chained: a
  per-nation aggregate lateral (decorrelates to a partial-aggregated
  equi-join — no nested-loop re-execution per outer row) feeding a
  second lateral that derives expressions from the first's output
  (the "lateral column reuse" idiom). Same SQL text both engines.
- **q_tablesample_stable** — the TABLESAMPLE surface, made
  driver-checkable: Spark's native seeded Bernoulli sample
  (`df.sample(fraction, seed)` — the `TABLESAMPLE (10 PERCENT)
  REPEATABLE (42)` plan) is per-partition-seeded, so its exact row
  set is layout-dependent and can NEVER cross engines; the sample
  still RUNS inside the registered query (the surface is exercised
  on every bench/correctness pass), but its [1.5%, 25%] fraction
  band is asserted in tests/test_extras84_witnesses.py, NOT in the
  hash-gated columns — a ~1e-4-per-fresh-layout Binomial tail flip
  must never read as a correctness red (round-9 advisor item). The
  deterministic twin — the repo's md5-prefix hash filter (portable,
  partition-invariant, the form a reproducible 100 TB pipeline
  should actually use) — carries the exact oracle-matched stats.
- **q_window_qualify** — QUALIFY semantics (filter on a window
  function in the same SELECT): Spark has no QUALIFY keyword, so the
  engine side is the canonical window + rank-filter rewrite — which
  Catalyst turns into WindowGroupLimit (map-side per-group top-k
  BEFORE the shuffle, plan-asserted in tests/test_scale_shapes.py),
  the exact shape that survives 100 TB; the oracle is DuckDB's
  native QUALIFY, proving semantic equivalence of the rewrite.

Exactness: money in ROUND(x*100) BIGINT cents, one double division at
the end with identical operand order (repo rule); ranks tie-broken by
c_custkey; md5-prefix thresholds compare lowercase hex lexically on
both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

_LATERAL_SQL = """
SELECT n.n_name, s.n_cust, s.bal_cents, d.avg_bal
FROM nation n,
LATERAL (SELECT COUNT(*) AS n_cust,
                CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT))
                     AS BIGINT) AS bal_cents
         FROM customer c WHERE c.c_nationkey = n.n_nationkey) s,
LATERAL (SELECT CASE WHEN s.n_cust > 0
                THEN CAST(s.bal_cents AS DOUBLE) / s.n_cust END AS avg_bal) d
ORDER BY n.n_name
"""


@query("q_join_lateral", oracle=_LATERAL_SQL)
def q_join_lateral(spark, sf_dir):
    """Chained correlated LATERAL subqueries (same SQL text as the
    oracle): per-nation customer aggregate in the first lateral, a
    derived-expression lateral consuming it. Catalyst decorrelates the
    aggregate lateral into groupBy(c_nationkey) ⋈ nation — one partial-
    aggregated shuffle on the key, no per-row re-execution — and folds
    the expression lateral into the projection; at 100 TB this is the
    same plan as the hand-written aggregate-join."""
    for t in ("nation", "customer"):
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_LATERAL_SQL)


@query(
    "q_tablesample_stable",
    oracle="""
    WITH hs AS (
      SELECT CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer
      WHERE SUBSTR(MD5(CAST(c_custkey AS VARCHAR)), 1, 2) < '1a'
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_total,
           CAST(COUNT(*) AS BIGINT) AS n_hash_sample,
           CAST(SUM(bal_cents) AS BIGINT) AS hash_bal_cents,
           CAST(COUNT(*) * 1000 //
                (SELECT COUNT(*) FROM customer) AS BIGINT) AS hash_frac_pm
    FROM hs
    """,
)
def q_tablesample_stable(spark, sf_dir):
    """TABLESAMPLE surface + the deterministic sampling twin.

    The native path runs Spark's seeded Bernoulli sampler
    (``df.sample(0.10, seed=42)`` — the plan of ``TABLESAMPLE (10
    PERCENT) REPEATABLE (42)``) on every invocation, so the surface is
    exercised in the verified/benched path. Its seed derives per
    PARTITION, so the exact row set depends on file-split layout —
    reproducible within a session but not across engines or layouts.
    Round-9 advisor item: its [1.5%, 25%] fraction band used to ride in
    the hash-gated output with the oracle hard-coding TRUE; a Binomial
    tail flip (~1e-4 per fresh layout at sf0.001's n=150) would then
    read as a correctness red with no plan bug. The band now lives in
    ``tests/test_extras84_witnesses.py::test_native_sample_band`` (same
    [1.5%, 25%] bound, documented σ margins) and the hash gate carries
    only layout-invariant columns.

    The exact columns come from the md5-prefix hash sample (first two
    hex digits < '1a' ≈ 10.2%) — partition-invariant, layout-invariant,
    engine-portable, and O(1) per row with no shuffle: the form a
    reproducible 100 TB sampling stage should use (same convention as
    q_sample_hash). Both sampling plans are single narrow scans."""
    c = read_table(spark, sf_dir, "customer")
    n_total = c.count()
    # Exercise the native TABLESAMPLE plan (layout-dependent count —
    # band-asserted in tests, deliberately NOT in the hash-gated output).
    c.sample(fraction=0.10, seed=42).count()
    hs = c.filter(
        F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 2)
        < F.lit("1a")
    ).select(
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_cents")
    )
    return hs.agg(
        F.lit(int(n_total)).cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_hash_sample"),
        F.sum("bal_cents").cast("bigint").alias("hash_bal_cents"),
        F.expr(f"CAST(COUNT(1) * 1000 DIV {int(n_total)} AS BIGINT)").alias(
            "hash_frac_pm"
        ),
    )


@query(
    "q_window_qualify",
    oracle="""
    SELECT c_mktsegment, c_custkey,
           CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY c_mktsegment
               ORDER BY CAST(ROUND(c_acctbal * 100) AS BIGINT) DESC,
                        c_custkey) AS BIGINT) AS rn
    FROM customer
    QUALIFY rn <= 3
    ORDER BY c_mktsegment, rn
    """,
)
def q_window_qualify(spark, sf_dir):
    """QUALIFY-style filtered window — top-3 customers by balance per
    market segment. The oracle uses DuckDB's native QUALIFY; Spark has
    no QUALIFY keyword, so the engine side is the canonical rewrite
    (window then rank filter), which Catalyst compiles to
    WindowGroupLimit: each map task keeps only its local top-3 per
    segment BEFORE the shuffle, so the exchange carries
    O(partitions × segments × k) rows regardless of table size — the
    rank-filter window is one of the few window shapes that gets
    CHEAPER than a full window at 100 TB (plan-asserted)."""
    from pyspark.sql import Window

    c = read_table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("bal_cents"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("bal_cents").desc(), F.col("c_custkey")
    )
    return (
        c.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    )
