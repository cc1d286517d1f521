"""Round-6 batch 7 (SURVEY.md §2.9/§2.11): LINEAR MULTI-TOUCH
ATTRIBUTION (equal-credit conversion paths in exact integer micros —
the fair-share complement of q_events_attribution's last-touch) and
ENTITY RESOLUTION (record linkage of a deterministically dirtied
customer twin back to the master table: blocking → candidate scoring →
best-match selection).

Reference scope: the catalog app's relationship-discovery vision
(`README.md:7`, `APP/services/geminiService.ts:64` column analysis)
covers cross-dataset identity; these are the warehouse-grade batch
forms."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_attribution_linear",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(ROUND(COALESCE(value, 0) * 100) AS BIGINT) AS cents,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_p
      FROM events
    ), touches AS (
      SELECT user_id, event_type AS channel, cum_p AS grp,
             ROW_NUMBER() OVER (PARTITION BY user_id, cum_p
                                ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id, cum_p) AS n
      FROM e WHERE event_type NOT IN ('purchase', 'error')
    ), purch AS (
      SELECT user_id, cum_p - 1 AS grp, cents FROM e
      WHERE event_type = 'purchase'
    ), credits AS (
      SELECT COALESCE(t.channel, 'direct') AS channel,
             CASE WHEN t.user_id IS NULL THEN p.cents * 1000000
                  ELSE (p.cents * 1000000) // t.n
                       + CASE WHEN t.rn = t.n
                              THEN (p.cents * 1000000) % t.n ELSE 0 END
             END AS credit_micros
      FROM purch p LEFT JOIN touches t
        ON p.user_id = t.user_id AND p.grp = t.grp
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_credits,
           CAST(SUM(credit_micros) AS BIGINT) AS credit_micros
    FROM credits GROUP BY 1 ORDER BY 1
    """,
)
def q_attribution_linear(spark, sf_dir):
    """LINEAR MULTI-TOUCH ATTRIBUTION: every purchase's revenue splits
    EQUALLY across the touches (view/click/signup — errors excluded)
    since the user's previous purchase; a touchless purchase is
    'direct'. The fair-share complement of q_events_attribution's
    last-touch rule — together they bracket channel ROI.

    Exactness is the hard part cross-engine: equal shares of cents are
    not integers, so credit is EXACT INTEGER MICROS — floor division
    of cents·10⁶ by the path length with the remainder assigned to the
    LAST touch (deterministic, and conservation holds by construction:
    per-purchase credits sum to exactly cents·10⁶; the quotient is
    computed as (a − a mod n)/n, an exactly-representable division, so
    no float-floor off-by-one can bite).

    Scale shape: conversion paths resolve with ONE running-count
    window per user (no self-join, no per-purchase lookback); the
    purchase⋈touch join is keyed on (user, path#); everything
    partial-aggregates to the bounded channel rollup. No
    SinglePartition stage."""
    e = read_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.round(F.coalesce(F.col("value"), F.lit(0)) * 100)
        .cast("bigint")
        .alias("cents"),
    )
    cum = F.sum(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    ).over(
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    e = e.withColumn("cum_p", cum)

    wg = Window.partitionBy("user_id", "cum_p")
    touches = (
        e.filter(~F.col("event_type").isin("purchase", "error"))
        .select(
            "user_id",
            F.col("event_type").alias("channel"),
            F.col("cum_p").alias("grp"),
            F.row_number().over(wg.orderBy("ts", "event_id")).alias("rn"),
            F.count(F.lit(1)).over(wg).alias("n"),
        )
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id", (F.col("cum_p") - 1).alias("grp"), "cents"
    )
    j = purch.join(touches, ["user_id", "grp"], "left")
    micros = F.col("cents") * F.lit(1000000)
    rem = F.pmod(micros, F.col("n"))
    # (a - a mod n) is exactly divisible by n and < 2^53: the double
    # division below is exact, so the cast is a true integer quotient.
    quot = ((micros - rem) / F.col("n")).cast("bigint")
    credit = F.when(F.col("n").isNull(), micros).otherwise(
        quot + F.when(F.col("rn") == F.col("n"), rem).otherwise(F.lit(0))
    )
    return (
        j.select(
            F.coalesce(F.col("channel"), F.lit("direct")).alias("channel"),
            credit.alias("credit_micros"),
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_credits"),
            F.sum("credit_micros").cast("bigint").alias("credit_micros"),
        )
        .orderBy("channel")
    )


@query(
    "q_entity_resolution",
    oracle="""
    WITH dirty AS (
      -- deterministic dirty twin: ~6% of customers re-enter the
      -- pipeline with a typo'd name (md5-threshold selection, same on
      -- both engines); a quarter of those are scrambled beyond repair
      SELECT c_custkey + 10000000 AS dirty_key,
             c_custkey AS true_key,
             c_nationkey,
             CASE WHEN SUBSTR(MD5(CAST(c_custkey AS VARCHAR)), 3, 1) < '4'
                  THEN REVERSE(c_name)
                  ELSE SUBSTR(c_name, 1, 4) || SUBSTR(c_name, 6)
             END AS name
      FROM customer
      WHERE SUBSTR(MD5(CAST(c_custkey AS VARCHAR)), 1, 2) < '10'
    ), cand AS (
      SELECT d.dirty_key, d.true_key, d.c_nationkey AS d_nation,
             a.c_custkey AS a_key, a.c_nationkey AS a_nation,
             CAST(levenshtein(d.name, a.c_name) AS BIGINT) AS dist
      FROM dirty d
      JOIN customer a
        ON SUBSTR(d.name, LENGTH(d.name) - 3, 4)
           = SUBSTR(a.c_name, LENGTH(a.c_name) - 3, 4)
       AND d.c_nationkey = a.c_nationkey
      WHERE levenshtein(d.name, a.c_name) <= 2
    ), best AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY dirty_key
                 ORDER BY dist, a_key) AS rk
      FROM cand
    )
    SELECT d.dirty_key,
           b.a_key AS matched_key,
           b.dist,
           CAST(b.a_key IS NOT NULL AND b.a_key = d.true_key AS BOOLEAN)
             AS is_correct
    FROM dirty d LEFT JOIN best b
      ON d.dirty_key = b.dirty_key AND b.rk = 1
    ORDER BY d.dirty_key
    """,
)
def q_entity_resolution(spark, sf_dir):
    """ENTITY RESOLUTION (record linkage): a deterministically dirtied
    customer twin — ~6% of customers re-entering with a typo'd name,
    a quarter of those scrambled beyond repair — resolves back to the
    master table via the classic pipeline: BLOCKING (nation × last-4
    name chars, which survive the typo), candidate scoring (Levenshtein
    <= 2), and BEST-MATCH selection (distance, then key, per probe).
    Scrambled probes correctly emit an unmatched verdict row.

    The in-row `is_correct` witness (matched key equals the probe's
    true origin) is oracle-checked — fixtures resolve every typo'd
    probe correctly and never false-match a scrambled one.

    Scale shape: probes are a small md5-selected fraction, so the
    block join is probe-side-bounded; blocks are (nation × name-tail)
    keyed — block population grows only linearly with customers and
    the tail widens (right-6, right-8) as the corpus grows, the
    standard ER blocking-key knob. Scoring runs inside blocks only
    (never all-pairs), best-match is a per-probe rank window. The same
    discipline as q_fuzzy_match, applied to structured identities with
    a probe-vs-master asymmetry."""
    cust = read_table(spark, sf_dir, "customer")
    h = F.md5(F.col("c_custkey").cast("string"))
    dirty = (
        cust.filter(F.substring(h, 1, 2) < "10")
        .select(
            (F.col("c_custkey") + 10000000).alias("dirty_key"),
            F.col("c_custkey").alias("true_key"),
            "c_nationkey",
            F.when(
                F.substring(h, 3, 1) < "4", F.reverse(F.col("c_name"))
            )
            .otherwise(
                F.concat(
                    F.substring(F.col("c_name"), 1, 4),
                    F.col("c_name").substr(F.lit(6), F.length("c_name")),
                )
            )
            .alias("name"),
        )
    )
    tail = lambda c: F.col(c).substr(F.length(c) - 3, F.lit(4))  # noqa: E731
    cand = (
        dirty.alias("d")
        .join(
            cust.alias("a"),
            (tail("d.name") == tail("a.c_name"))
            & (F.col("d.c_nationkey") == F.col("a.c_nationkey")),
        )
        .withColumn(
            "dist",
            F.levenshtein(F.col("d.name"), F.col("a.c_name")).cast("bigint"),
        )
        .filter(F.col("dist") <= 2)
        .select(
            F.col("d.dirty_key").alias("dirty_key"),
            F.col("d.true_key").alias("true_key_c"),
            F.col("a.c_custkey").alias("a_key"),
            "dist",
        )
    )
    best = cand.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("dirty_key").orderBy("dist", "a_key")
        ),
    ).filter(F.col("rk") == 1)
    return (
        dirty.join(best, "dirty_key", "left")
        .select(
            "dirty_key",
            F.col("a_key").alias("matched_key"),
            "dist",
            (
                F.col("a_key").isNotNull()
                & (F.col("a_key") == F.col("true_key"))
            ).alias("is_correct"),
        )
        .orderBy("dirty_key")
    )
