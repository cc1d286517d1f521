"""Round-6 batch 54 (SURVEY.md §2.10 ML prep / §2.11 DQ): FEATURE
SCREEN (per-column NDV / top-value-share verdicts — constant-like,
id-like, ok — the caret::nearZeroVar-style preflight that drops
useless columns before encoding) and the DOUBLE-PAYMENT SUSPECT QUEUE
(same-customer orders within ±7 days ranked by exact amount delta —
the classic fintech duplicate-transaction triage, a structured-data
dedup op next to the text dedup family).

Exactness: all verdicts are integer cross-multiplications; pair
deltas are exact integer cents/days."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# Screened columns (orders table) — heterogeneous cardinality on
# purpose: status (3 values), priority (5), totalprice (~unique
# doubles -> id_like), custkey (~n/10), orderkey (unique).
_SCREEN_COLS = (
    "o_orderstatus",
    "o_orderpriority",
    "o_totalprice",
    "o_custkey",
    "o_orderkey",
)
_WINDOW_DAYS = 7


def _screen_oracle() -> str:
    branches = []
    for c in _SCREEN_COLS:
        branches.append(
            f"""
    SELECT '{c}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv,
           CAST(MAX(vc) AS BIGINT) AS top_value_rows,
           CASE WHEN 10 * MAX(vc) > 9 * COUNT(*) THEN 'constant_like'
                WHEN 10 * COUNT(DISTINCT {c}) > 9 * COUNT(*) THEN 'id_like'
                ELSE 'ok' END AS verdict
    FROM (
      SELECT {c}, COUNT(*) OVER (PARTITION BY {c}) AS vc FROM orders
    )"""
        )
    return " UNION ALL ".join(branches) + " ORDER BY column_name"


@query("q_feature_screen", oracle=_screen_oracle())
def q_feature_screen(spark, sf_dir):
    """FEATURE SCREEN: for each candidate column, row count, NDV, and
    the heaviest single value's row count, with an exact-integer
    verdict — `constant_like` when the top value covers >90% of rows
    (near-zero variance: the column carries almost no signal),
    `id_like` when NDV >90% of rows (a key in disguise: encoding it
    memorizes rows), else `ok`. The preflight an ML feature pipeline
    runs before one-hot/target encoding, complementing
    q_profile_topk_values (which lists values, not verdicts) and
    q_feature_hash_audit (which sizes the hash space of the
    survivors).

    Scale shape: one value-grain count + one scalar collapse per
    column (columns widen the union, not the data path); thresholds
    are 10·x > 9·n integer cross-multiplications, so verdicts are
    engine-exact."""
    o = read_table(spark, sf_dir, "orders")
    outs = []
    for c in _SCREEN_COLS:
        vc = o.groupBy(c).agg(F.count(F.lit(1)).cast("bigint").alias("vc"))
        # NULL convention matches the oracle: n_rows and top_value_rows
        # include the NULL group (COUNT(*) / MAX over all partitions),
        # but ndv is COUNT(DISTINCT c) which EXCLUDES NULLs — counting
        # non-null c at the value grain (one row per distinct value,
        # count(c) skips the NULL group's row) reproduces that exactly.
        stats = vc.agg(
            F.sum("vc").cast("bigint").alias("n_rows"),
            F.count(F.col(c)).cast("bigint").alias("ndv"),
            F.max("vc").cast("bigint").alias("top_value_rows"),
        )
        outs.append(
            stats.select(
                F.lit(c).alias("column_name"),
                "n_rows",
                "ndv",
                "top_value_rows",
                F.when(
                    10 * F.col("top_value_rows") > 9 * F.col("n_rows"),
                    "constant_like",
                )
                .when(10 * F.col("ndv") > 9 * F.col("n_rows"), "id_like")
                .otherwise("ok")
                .alias("verdict"),
            )
        )
    out = outs[0]
    for x in outs[1:]:
        out = out.unionAll(x)
    return out.orderBy("column_name")


@query(
    "q_double_payment",
    oracle=f"""
    WITH o AS (
      SELECT o_orderkey, o_custkey, o_orderdate,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    SELECT a.o_custkey AS custkey,
           a.o_orderkey AS first_orderkey,
           b.o_orderkey AS second_orderkey,
           CAST(CAST(b.o_orderdate AS DATE) - CAST(a.o_orderdate AS DATE)
                AS BIGINT) AS days_apart,
           CAST(ABS(b.cents - a.cents) AS BIGINT) AS cents_delta,
           CASE WHEN b.cents = a.cents THEN TRUE ELSE FALSE END
             AS is_exact_dup,
           CAST(ABS(b.cents - a.cents) AS DOUBLE)
             / CAST(GREATEST(a.cents, b.cents) AS DOUBLE) AS rel_delta
    FROM o a JOIN o b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND CAST(b.o_orderdate AS DATE) - CAST(a.o_orderdate AS DATE)
         BETWEEN -{_WINDOW_DAYS} AND {_WINDOW_DAYS}
    ORDER BY cents_delta, custkey, first_orderkey, second_orderkey
    LIMIT 25
    """,
)
def q_double_payment(spark, sf_dir):
    """DOUBLE-PAYMENT SUSPECT QUEUE: same-customer order pairs within
    ±7 days, ranked by exact cents delta ascending — the review queue
    a billing/AP audit triages (delta 0 = textbook duplicate payment;
    near-zero deltas are retry-with-fee / partial-capture patterns).
    On this fixture no pair ties exactly (is_exact_dup all false —
    itself a finding), so the queue surfaces the nearest-amount
    pairs a reviewer would check first. Structured-data dedup beside
    the text family (q_dedup_*, q_media_dedup).

    Scale shape: the self-join is EQUI on custkey (co-partitionable;
    candidates bounded by each customer's orders within the ±7-day
    band, enforced as a residual), exact integer cents/day deltas,
    and a top-25 TakeOrderedAndProject with a full unique tie-break.
    At warehouse scale the blocking key extends to (custkey,
    week-bucket) to bound per-task candidates; the fixture's ~500
    in-window pairs don't need it."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    b = o.select(
        F.col("o_orderkey").alias("k2"),
        F.col("o_custkey").alias("c2"),
        F.col("o_orderdate").alias("d2"),
        F.col("cents").alias("cents2"),
    )
    days = F.datediff(F.col("d2").cast("date"), F.col("o_orderdate").cast("date"))
    delta = F.abs(F.col("cents2") - F.col("cents"))
    return (
        o.join(b, (o.o_custkey == b.c2) & (o.o_orderkey < b.k2))
        .where(days.between(-_WINDOW_DAYS, _WINDOW_DAYS))
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("first_orderkey"),
            F.col("k2").alias("second_orderkey"),
            days.cast("bigint").alias("days_apart"),
            delta.cast("bigint").alias("cents_delta"),
            (F.col("cents2") == F.col("cents")).alias("is_exact_dup"),
            (
                delta.cast("double")
                / F.greatest(F.col("cents"), F.col("cents2")).cast("double")
            ).alias("rel_delta"),
        )
        .orderBy("cents_delta", "custkey", "first_orderkey", "second_orderkey")
        .limit(25)
    )
