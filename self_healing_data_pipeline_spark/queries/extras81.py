"""Round-8 batch 64 (SURVEY.md §2.9 / §2.5 / §2.4): CHUNKED TWO-PHASE
SESSIONIZATION — the skew-safe form of gaps-and-islands promised as
the mitigation path in SCALE.md's skew-tier row (a user holding 20% of
the stream serializes the plain per-user window; bucketing the
timeline caps any window partition at (user, day) grain) — plus
IGNORE-NULLS analytic windows (LOCF forward fill, the §2.5 member the
attribution query uses implicitly but no dedicated key pinned) and an
equal-width histogram in pure integer arithmetic.

Exactness: the two-phase sessionizer is proven against the IDENTICAL
oracle as q_sessionize (same output, different plan); LOCF copies
column values untouched; histogram bins are exact integer cents math.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

_T_US = 1_800_000_000  # 30-minute inactivity timeout, µs
_DAY_US = 86_400_000_000

_SESSIONIZE_ORACLE = """
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id))
                  > 1800000000 OR LAG(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ), sess AS (
      SELECT user_id, ts, event_type,
             SUM(is_start) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_no
      FROM ordered
    ), per AS (
      SELECT user_id, session_no,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(FLOOR((EPOCH_US(MAX(ts)) - EPOCH_US(MIN(ts))) / 60000000.0)
                  AS BIGINT) AS duration_min,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_purchases
      FROM sess GROUP BY user_id, session_no
    )
    SELECT CAST(n_events AS BIGINT) AS session_size,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(duration_min) AS BIGINT) AS total_minutes,
           CAST(SUM(n_purchases) AS BIGINT) AS total_purchases
    FROM per GROUP BY n_events ORDER BY session_size
"""


@query("q_sessionize_twophase", oracle=_SESSIONIZE_ORACLE)
def q_sessionize_twophase(spark, sf_dir):
    """CHUNKED TWO-PHASE SESSIONIZATION — result-identical to
    q_sessionize (the oracle IS q_sessionize's oracle, so the hash
    gate proves plan equivalence), but no window partition ever holds
    more than one (user, DAY) of events, so a user owning 20% of the
    stream costs its largest day, not its whole timeline (the skew
    mitigation measured as needed by the sf1-skew tier):

    1. within (user, day-bucket): the usual LAG-gap session starts and
       a local running session number;
    2. per (user, bucket) summary (n_starts, first/last µs) — a frame
       at user×active-day grain, orders of magnitude below events;
    3. boundary stitch on that SUMMARY frame: a bucket's first session
       merges backward iff the gap to the previous non-empty bucket's
       last event ≤ timeout; a prefix sum of (n_starts − merge) gives
       each bucket its global session offset, and
       global_no = offset_prev + local_no − merge — consistent across
       any chain of all-day sessions because the merged bucket's first
       session number equals exactly the previous bucket's last;
    4. per-session aggregates merge across bucket parts (count/min/
       max/sum are mergeable), then the same histogram rollup.

    Every events-grain window is (user, bucket)-partitioned; the only
    per-user ordered pass runs on the bucket-grain summary."""
    ev = read_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    e = ev.select(
        "user_id", "ts", "event_id", "event_type", us.alias("us"),
        (us - us % _DAY_US).alias("bucket"),
    )
    wb = Window.partitionBy("user_id", "bucket").orderBy("ts", "event_id")
    prev_us = F.lag("us").over(wb)
    is_start = (
        F.when(prev_us.isNull() | (F.col("us") - prev_us > _T_US), 1)
        .otherwise(0)
    )
    local = e.select(
        "user_id", "bucket", "ts", "event_id", "event_type", "us",
        is_start.alias("is_start"),
    ).withColumn(
        "local_no",
        F.sum("is_start").over(wb.rowsBetween(Window.unboundedPreceding, 0)),
    )
    bsum = local.groupBy("user_id", "bucket").agg(
        F.sum("is_start").alias("n_starts"),
        F.min("us").alias("first_us"),
        F.max("us").alias("last_us"),
    )
    wub = Window.partitionBy("user_id").orderBy("bucket")
    prev_last = F.lag("last_us").over(wub)
    merged = bsum.withColumn(
        "merge",
        F.when(
            prev_last.isNotNull()
            & (F.col("first_us") - prev_last <= _T_US),
            1,
        ).otherwise(0),
    ).withColumn(
        "offset_prev",
        F.coalesce(
            F.sum(F.col("n_starts") - F.col("merge")).over(
                wub.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    sess = local.join(
        merged.select("user_id", "bucket", "merge", "offset_prev"),
        ["user_id", "bucket"],
    ).withColumn(
        "session_no",
        F.col("offset_prev") + F.col("local_no") - F.col("merge"),
    )
    per = sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.floor((F.max("us") - F.min("us")) / 60_000_000.0)
        .cast("bigint")
        .alias("duration_min"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.lit(1)).otherwise(0)
        )
        .cast("bigint")
        .alias("n_purchases"),
    )
    return (
        per.groupBy(F.col("n_events").alias("session_size"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum("duration_min").cast("bigint").alias("total_minutes"),
            F.sum("n_purchases").cast("bigint").alias("total_purchases"),
        )
        .orderBy("session_size")
    )


@query(
    "q_window_ignore_nulls",
    oracle="""
    WITH sparse AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'purchase' THEN value END AS purchase_value
      FROM events WHERE user_id % 97 = 0
    )
    SELECT user_id, event_id,
           LAST_VALUE(purchase_value IGNORE NULLS) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_value
    FROM sparse
    ORDER BY user_id, event_id
    """,
)
def q_window_ignore_nulls(spark, sf_dir):
    """IGNORE NULLS analytic window — LOCF forward fill of the last
    purchase value over each user's timeline (§2.5's last unpinned
    member: attribution uses the pattern implicitly; this key pins the
    IGNORE NULLS semantics themselves, incl. the all-NULL prefix
    staying NULL). Values pass through untouched, so the doubles are
    bit-exact by construction."""
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 97 == 0
    )
    sparse = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", F.col("value")).alias(
            "purchase_value"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        sparse.select(
            "user_id",
            "event_id",
            F.last("purchase_value", ignorenulls=True)
            .over(w)
            .alias("last_purchase_value"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "q_histogram_bins",
    oracle="""
    WITH c AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders
    ), b AS (
      SELECT CAST(MIN(cents) AS BIGINT) AS lo,
             CAST(MAX(cents) AS BIGINT) AS hi FROM c
    )
    SELECT CAST((c.cents - b.lo) * 20 // (b.hi - b.lo + 1) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(c.cents) AS BIGINT) AS min_cents,
           CAST(MAX(c.cents) AS BIGINT) AS max_cents
    FROM c, b
    GROUP BY 1 ORDER BY bin
    """,
)
def q_histogram_bins(spark, sf_dir):
    """Equal-width 20-bin histogram of order totals in PURE INTEGER
    arithmetic: bin = (cents − lo)·20 div (hi − lo + 1) — the portable
    spelling of width_bucket, whose built-in edge semantics differ
    across engines. The global min/max are one broadcast scalar row;
    the histogram is a bounded-domain aggregate with map-side
    partials."""
    o = read_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    c = o.select(cents.alias("cents"))
    b = c.agg(
        F.min("cents").alias("lo"), F.max("cents").alias("hi")
    )
    return (
        c.crossJoin(F.broadcast(b))
        .select(
            F.expr("(cents - lo) * 20 div (hi - lo + 1)").alias("bin"),
            "cents",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
        .orderBy("bin")
    )
