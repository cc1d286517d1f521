"""Round-5 batch 10 (SURVEY.md §2.9): experimentation analytics — a
deterministic A/B test readout (hash-assigned cohorts, conversion
rates, pooled two-proportion z statistic) and batch sessionization with
per-session statistics (30-minute inactivity rule).

Scale discipline: cohort assignment is a pure hash projection (no
assignment table to join), the z statistic reduces to exact integer
masses with mirrored IEEE steps, and sessionization is the gaps-and-
islands pattern — one LAG window per user, never a global stage."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_ab_test",
    oracle="""
    WITH assigned AS (
      SELECT user_id,
             CASE WHEN SUBSTRING(MD5(CAST(user_id AS VARCHAR)), 1, 1)
                       < '8' THEN 'A' ELSE 'B' END AS cohort,
             MAX(CASE WHEN event_type = 'purchase' AND value >= 150.0
                      THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY 1, 2
    ), g AS (
      SELECT cohort,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_converted
      FROM assigned GROUP BY cohort
    ), wide AS (
      SELECT
        (SELECT n_users FROM g WHERE cohort = 'A') AS na,
        (SELECT n_converted FROM g WHERE cohort = 'A') AS ca,
        (SELECT n_users FROM g WHERE cohort = 'B') AS nb,
        (SELECT n_converted FROM g WHERE cohort = 'B') AS cb
    )
    SELECT na AS n_users_a, ca AS n_conv_a,
           nb AS n_users_b, cb AS n_conv_b,
           CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) AS rate_a,
           CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) AS rate_b,
           CASE WHEN SQRT(
               (CAST(ca + cb AS DOUBLE) / CAST(na + nb AS DOUBLE))
               * (1.0 - CAST(ca + cb AS DOUBLE) / CAST(na + nb AS DOUBLE))
               * (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE))) > 0
           THEN (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
                 - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
                / SQRT(
                    (CAST(ca + cb AS DOUBLE) / CAST(na + nb AS DOUBLE))
                    * (1.0 - CAST(ca + cb AS DOUBLE) / CAST(na + nb AS DOUBLE))
                    * (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE)))
           END AS z_stat
    FROM wide
    """,
)
def q_ab_test(spark, sf_dir):
    """A/B experiment readout: users assign to cohorts by an md5 hash
    of their id (the deterministic traffic split every experimentation
    platform uses — no assignment table, rebuild-stable), convert if
    they ever make a premium purchase (value >= 150 — the rare event an
    experiment actually moves; plain purchase saturates at 100% in the
    fixtures, a degenerate experiment), and the readout is per-cohort conversion rates
    plus the pooled two-proportion z statistic.

    Plan: one per-user aggregate (assignment is a pure projection
    inside it), one 2-row cohort rollup, and the z statistic computed
    on the single assembled row — exact integer masses end-to-end with
    the divide/sqrt steps in oracle-identical operand order (IEEE sqrt
    is correctly rounded, so the statistic is bit-exact)."""
    ev = read_table(spark, sf_dir, "events")
    assigned = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 150.0),
                F.lit(1),
            ).otherwise(0)
        ).alias("converted")
    ).select(
        F.when(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 1) < "8",
            F.lit("A"),
        )
        .otherwise(F.lit("B"))
        .alias("cohort"),
        "converted",
    )
    g = assigned.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
    )
    # pivot the 2-row rollup to one row via conditional aggregation —
    # branch-and-join would re-derive the per-user aggregate twice
    wide = g.agg(
        F.max(F.when(F.col("cohort") == "A", F.col("n_users"))).alias("n_users_a"),
        F.max(F.when(F.col("cohort") == "A", F.col("n_converted"))).alias("n_conv_a"),
        F.max(F.when(F.col("cohort") == "B", F.col("n_users"))).alias("n_users_b"),
        F.max(F.when(F.col("cohort") == "B", F.col("n_converted"))).alias("n_conv_b"),
    )
    ra = F.col("n_conv_a").cast("double") / F.col("n_users_a").cast("double")
    rb = F.col("n_conv_b").cast("double") / F.col("n_users_b").cast("double")
    pooled = (F.col("n_conv_a") + F.col("n_conv_b")).cast("double") / (
        F.col("n_users_a") + F.col("n_users_b")
    ).cast("double")
    se = F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (
            F.lit(1.0) / F.col("n_users_a").cast("double")
            + F.lit(1.0) / F.col("n_users_b").cast("double")
        )
    )
    # degenerate experiment (0% or 100% pooled conversion) -> NULL, and
    # the guard keeps ANSI mode from erroring on the 0/0
    z = F.when(se > 0, (ra - rb) / se)
    return wide.select(
        "n_users_a",
        "n_conv_a",
        "n_users_b",
        "n_conv_b",
        ra.alias("rate_a"),
        rb.alias("rate_b"),
        z.alias("z_stat"),
    )


@query(
    "q_sessionize",
    oracle="""
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
    """,
)
def q_sessionize(spark, sf_dir):
    """Batch SESSIONIZATION by the 30-minute inactivity rule: per-user
    LAG gap marks session starts, a running sum numbers the sessions
    (gaps-and-islands), and per-session stats roll up into a
    session-size histogram (sessions, total minutes, purchases per
    size) — the batch twin of the streaming session window
    (`q_stream_session`), sharing its 30-minute timeout.

    Plan: two windows per user partition (LAG + running sum — same
    hash(user_id) exchange, AQE-coalesced), then two partial-aggregated
    rollups. Exact integer µs arithmetic end-to-end; the histogram
    grain is bounded by max session length."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    gap_us = F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(
        prev.cast("timestamp")
    )
    ordered = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(prev.isNull() | (gap_us > 1_800_000_000), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_start"),
    )
    # same (ts, event_id) total order as the gap window — ts alone
    # would make session numbering nondeterministic on timestamp ties
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = ordered.withColumn("session_no", F.sum("is_start").over(wrun))
    per = sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.floor(
            (
                F.unix_micros(F.max("ts").cast("timestamp"))
                - F.unix_micros(F.min("ts").cast("timestamp"))
            )
            / 60_000_000.0
        )
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
