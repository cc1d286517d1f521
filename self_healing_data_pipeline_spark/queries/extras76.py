"""Round-7 batch 59 (SURVEY.md §2.11 storage ops): DATA-RETENTION
PLAN (per-month age vs a hot/archive/expire policy with row and exact
cents mass — the lifecycle table a lakehouse VACUUM/retention job
executes from) and the BUCKET ADVISOR (per join key: exact NDV, the
power-of-two bucket count that hits a target rows-per-bucket, and an
integer skew/cardinality verdict — the table a bucketed-write planner
reads before committing a layout). Completes the storage-planning
suite next to q_partition_advisor / q_compaction_bins /
q_encoding_advisor / q_sort_key_whatif.

Exactness: ages are integer month arithmetic anchored at the corpus
max date; all verdicts are integer cross-multiplications; the
power-of-two choice is a bounded CASE over exact integers (never a
float log2, which differs in the last ulp across libm builds)."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

_HOT_MONTHS = 24
_ARCHIVE_MONTHS = 60

_TARGET_ROWS_PER_BUCKET = 65536
_BUCKET_KEYS = ("l_orderkey", "l_partkey", "l_suppkey")
_MAX_BUCKET_POW = 20


def _pow2_case_sql(need_expr: str) -> str:
    whens = "\n             ".join(
        f"WHEN {need_expr} <= {1 << k} THEN {1 << k}"
        for k in range(_MAX_BUCKET_POW + 1)
    )
    return f"CASE {whens} ELSE {1 << _MAX_BUCKET_POW} END"


@query(
    "q_retention_plan",
    oracle=f"""
    WITH base AS (
      SELECT STRFTIME(o_orderdate, '%Y-%m') AS month_s,
             (EXTRACT(YEAR FROM o_orderdate) * 12
              + EXTRACT(MONTH FROM o_orderdate)) AS mix,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), mx AS (SELECT MAX(mix) AS mmax FROM base)
    SELECT month_s,
           CAST(mmax - mix AS BIGINT) AS age_months,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS cents,
           CASE WHEN mmax - mix <= {_HOT_MONTHS} THEN 'hot'
                WHEN mmax - mix <= {_ARCHIVE_MONTHS} THEN 'archive'
                ELSE 'expire' END AS policy
    FROM base, mx
    GROUP BY month_s, mix, mmax
    ORDER BY month_s
    """,
)
def q_retention_plan(spark, sf_dir):
    """DATA-RETENTION PLAN: each order month bucketed by age against
    the corpus max month — 'hot' (≤24 months: stays on fast storage),
    'archive' (≤60: moves to cold tier), 'expire' (beyond policy:
    the VACUUM candidate set) — with exact row counts and cents mass
    per month. The table the nightly lifecycle job executes from, and
    the complement of q_time_travel (which proves old state is
    reconstructible before anyone deletes it).

    Exactness: age is pure integer month arithmetic (year·12 + month,
    anchored at the broadcast max — never engine date-diff month
    conventions); verdicts are integer comparisons.

    Scale shape: one scalar max (broadcast) + one month-grain partial
    aggregate — at 100 TB the month grain is bounded by the calendar,
    and a partition-pruned layout answers the expire set without
    scanning hot data."""
    o = read_table(spark, sf_dir, "orders")
    mix = (
        F.year(F.col("o_orderdate")) * 12 + F.month(F.col("o_orderdate"))
    ).alias("mix")
    base = o.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month_s"),
        mix,
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    mx = base.agg(F.max("mix").alias("mmax"))
    age = F.col("mmax") - F.col("mix")
    return (
        base.crossJoin(F.broadcast(mx))
        .groupBy("month_s", "mix", "mmax")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
        .select(
            "month_s",
            age.cast("bigint").alias("age_months"),
            "n_rows",
            "cents",
            F.when(age <= _HOT_MONTHS, "hot")
            .when(age <= _ARCHIVE_MONTHS, "archive")
            .otherwise("expire")
            .alias("policy"),
        )
        .orderBy("month_s")
    )


@query(
    "q_bucket_advisor",
    oracle=f"""
    WITH kv AS (
      {" UNION ALL ".join(
        f"SELECT '{k}' AS key_col, {k} AS v FROM lineitem"
        for k in _BUCKET_KEYS
      )}
    ), stats AS (
      SELECT key_col,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT v) AS BIGINT) AS ndv
      FROM kv GROUP BY key_col
    ), heavy AS (
      SELECT key_col, CAST(MAX(c) AS BIGINT) AS max_key_rows
      FROM (SELECT key_col, v, COUNT(*) AS c FROM kv GROUP BY key_col, v)
      GROUP BY key_col
    ), sized AS (
      SELECT s.key_col, s.n_rows, s.ndv, h.max_key_rows,
             {_pow2_case_sql(
               f"(s.n_rows + {_TARGET_ROWS_PER_BUCKET - 1})"
               f" // {_TARGET_ROWS_PER_BUCKET}")} AS n_buckets
      FROM stats s JOIN heavy h ON s.key_col = h.key_col
    )
    SELECT key_col, n_rows, ndv, max_key_rows,
           CAST(n_buckets AS BIGINT) AS n_buckets,
           CASE WHEN ndv < 4 * n_buckets THEN 'low_cardinality'
                WHEN 4 * max_key_rows * n_buckets > 3 * n_rows
                  THEN 'skewed'
                ELSE 'ok' END AS verdict
    FROM sized ORDER BY key_col
    """,
)
def q_bucket_advisor(spark, sf_dir):
    """BUCKET ADVISOR for co-located joins: per candidate join key,
    exact row count and NDV, the heaviest key's row count, the
    power-of-two bucket count targeting ≤65,536 rows per bucket, and
    an integer verdict — `low_cardinality` when NDV < 4·buckets (keys
    can't spread across buckets: hash collisions leave buckets empty
    or paired), `skewed` when the heaviest single key alone would fill
    >75% of an average bucket's fair share (4·max·buckets > 3·n), else
    `ok`. The preflight before `sources/writers`' bucketed write
    commits a layout that q_join_bucketed then exploits shuffle-free.

    Exactness: the bucket count is a bounded CASE over exact integers
    (never float log2 — libm last-ulp differences would flip the
    power at exact boundaries); verdicts are cross-multiplications.

    Scale shape: ONE scan per key unions into a (key_col, value)
    frame; NDV and the heavy-key count are value-grain partial
    aggregates (shuffle carries distinct key values only); the final
    frame is |candidate keys| rows."""
    frames = []
    for k in _BUCKET_KEYS:
        frames.append(
            read_table(spark, sf_dir, "lineitem").select(
                F.lit(k).alias("key_col"), F.col(k).alias("v")
            )
        )
    kv = frames[0]
    for fr in frames[1:]:
        kv = kv.unionByName(fr)
    vc = kv.groupBy("key_col", "v").agg(
        F.count(F.lit(1)).alias("c")
    )
    # NULL convention matches the oracle: n_rows and max_key_rows see
    # the NULL group, ndv is COUNT(DISTINCT v) which excludes NULLs —
    # count(v) at the value grain skips the NULL group's row (same fix
    # class as q_feature_screen's round-7 ADVICE item).
    stats = vc.groupBy("key_col").agg(
        F.sum("c").cast("bigint").alias("n_rows"),
        F.count(F.col("v")).cast("bigint").alias("ndv"),
        F.max("c").cast("bigint").alias("max_key_rows"),
    )
    need = F.expr(
        f"(n_rows + {_TARGET_ROWS_PER_BUCKET - 1})"
        f" DIV {_TARGET_ROWS_PER_BUCKET}"
    )
    n_buckets = F.lit(1 << _MAX_BUCKET_POW)
    for k in reversed(range(_MAX_BUCKET_POW + 1)):
        n_buckets = F.when(need <= (1 << k), F.lit(1 << k)).otherwise(
            n_buckets
        )
    return (
        stats.withColumn("n_buckets", n_buckets.cast("bigint"))
        .select(
            "key_col",
            "n_rows",
            "ndv",
            "max_key_rows",
            "n_buckets",
            F.when(
                F.col("ndv") < 4 * F.col("n_buckets"), "low_cardinality"
            )
            .when(
                4 * F.col("max_key_rows") * F.col("n_buckets")
                > 3 * F.col("n_rows"),
                "skewed",
            )
            .otherwise("ok")
            .alias("verdict"),
        )
        .orderBy("key_col")
    )
