"""Advanced event/text analytics shapes (SURVEY.md §2.5/§2.9/§2.11):
time-weighted averages, behavioral path mining, gaps-and-islands streak
detection, and per-document TF-IDF ranking — the time-series/product
analytics operators (reference `README.md:7` analysis vision) a warehouse
engine layers over the raw event and document tables.

Scale notes: every query is window-plus-aggregate over a per-key
partition (no SinglePartition window anywhere), exact integer/decimal
arithmetic where sums feed comparisons, and only single IEEE divisions
for ratios — never transcendental functions whose libm builds differ
across engines (the `q_text_docfreq` linearized-IDF convention).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.operators.windows import sessionize
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_time_weighted_avg",
    oracle="""
    WITH spans AS (
      SELECT user_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents,
             EPOCH_US(LEAD(ts) OVER w) - EPOCH_US(ts) AS dur_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           COUNT(dur_us) AS n_spans,
           CAST(SUM(dur_us) AS BIGINT) AS total_us,
           CAST(SUM(CAST(cents AS DECIMAL(20,0)) * dur_us) AS DOUBLE)
             / CAST(SUM(dur_us) AS DOUBLE) / 100.0 AS twa_value
    FROM spans
    WHERE dur_us IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_time_weighted_avg(spark, sf_dir):
    """Time-weighted average (the TimescaleDB ``time_weight`` shape): each
    event's value holds until the user's next event, so the average weights
    values by how long they were current — last-observation-carried-forward
    over irregular samples. LEAD gives the span; the weighted sum runs in
    exact integers (cents × microseconds, summed as DECIMAL(38,0) so no
    bigint overflow at any scale) and only the final twa is one IEEE
    division — order-independent, cross-engine bit-stable. One window + one
    aggregate, both partitioned by user_id: shuffles once on the key."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    spans = ev.select(
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        (
            F.unix_micros(F.lead("ts").over(w).cast("timestamp"))
            - F.unix_micros(F.col("ts").cast("timestamp"))
        ).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    return (
        spans.groupBy("user_id")
        .agg(
            F.count("dur_us").alias("n_spans"),
            F.sum("dur_us").alias("total_us"),
            (
                F.sum(F.col("cents").cast("decimal(20,0)") * F.col("dur_us"))
                .cast("double")
                / F.sum("dur_us").cast("double")
                / 100.0
            ).alias("twa_value"),
        )
        .orderBy("user_id")
    )


@query(
    "q_events_top_paths",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS session_id
      FROM flagged
    ), paths AS (
      SELECT user_id, session_id,
             STRING_AGG(event_type, '>' ORDER BY ts, event_id) AS path
      FROM sessions GROUP BY user_id, session_id
    )
    SELECT path, COUNT(*) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 15
    """,
)
def q_events_top_paths(spark, sf_dir):
    """Behavioral path mining: the most common within-session event-type
    sequences (funnel discovery — which journeys actually happen). Reuses
    the gap-based sessionizer, then builds each session's path with an
    order-deterministic collect: sort_array over (ts, event_id, type)
    structs fixes the sequence before join — collect_list alone has no
    ordering contract under shuffle. Path strings shuffle once (grouped by
    session first, so the big shuffle carries session-grouped rows, not the
    corpus); the final top-15 is TakeOrderedAndProject, no global sort."""
    ev = read_table(spark, sf_dir, "events")
    sess = sessionize(ev, key="user_id", ts="ts", tie_break="event_id", gap_minutes=30)
    paths = (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(15)
    )


@query(
    "q_gaps_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), grouped AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS grp
      FROM days
    ), islands AS (
      SELECT user_id, grp, COUNT(*) AS streak_len
      FROM grouped GROUP BY user_id, grp
    )
    SELECT user_id,
           COUNT(*) AS n_islands,
           CAST(MAX(streak_len) AS BIGINT) AS longest_streak,
           CAST(SUM(streak_len) AS BIGINT) AS active_days
    FROM islands
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_gaps_islands(spark, sf_dir):
    """Gaps-and-islands (activity streaks): consecutive-day runs per user
    via the classic date-minus-row_number grouping — consecutive dates map
    to one constant group key, so islands fall out of a plain aggregate
    with no self-join or iterative logic. Three stages, all partitioned by
    user_id: distinct days, one window, two aggregates — a single shuffle
    key end-to-end, no SinglePartition window."""
    ev = read_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grouped = days.select(
        "user_id",
        "d",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("grp"),
    )
    islands = grouped.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.max("streak_len").alias("longest_streak"),
            F.sum("streak_len").alias("active_days"),
        )
        .orderBy("user_id")
    )


@query(
    "q_text_tfidf_top",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS tok
      FROM documents
    ), tf AS (
      SELECT doc_id, tok, COUNT(*) AS term_freq
      FROM toks WHERE tok <> '' GROUP BY doc_id, tok
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    with_df AS (
      SELECT doc_id, tok, term_freq,
             COUNT(*) OVER (PARTITION BY tok) AS doc_freq
      FROM tf
    ),
    scored AS (
      SELECT doc_id, tok, term_freq, doc_freq,
             CAST(term_freq * (SELECT n_docs FROM n) AS DOUBLE)
               / CAST(doc_freq AS DOUBLE) AS score,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id
               ORDER BY CAST(term_freq * (SELECT n_docs FROM n) AS DOUBLE)
                          / CAST(doc_freq AS DOUBLE) DESC, tok
             ) AS rn
      FROM with_df
    )
    SELECT doc_id, tok, term_freq, doc_freq, score
    FROM scored WHERE rn <= 3
    ORDER BY doc_id, score DESC, tok
    """,
)
def q_text_tfidf_top(spark, sf_dir):
    """Per-document top-3 TF-IDF terms (keyword extraction / topic
    labeling for corpus curation). IDF is linearized (tf × N / df — one
    IEEE division, the q_text_docfreq convention) so ranks are bit-stable
    across engines. Document frequency is a COUNT window over the tf
    aggregate rather than a re-aggregate + self-join: the self-join
    variant plans the tokenize subtree TWICE (column pruning makes the
    two subtrees non-identical, so exchange reuse never fires —
    plan-verified), i.e. the full corpus would be read and exploded
    twice at 100 TB. The window costs one extra shuffle on the token and
    per-token buffering (spills for stopword-grade tokens) but
    tokenizes exactly once; the corpus size stays in-plan as a broadcast
    1-row aggregate; the per-doc rank windows on doc_id. Shuffle keys
    are (doc_id, token) then token — the text column itself never
    shuffles."""
    d = read_table(spark, sf_dir, "documents")
    n_docs = d.agg(F.count(F.lit(1)).alias("_n_docs"))
    tf = (
        d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("term_freq"))
    )
    scored = (
        tf.withColumn(
            "doc_freq", F.count(F.lit(1)).over(Window.partitionBy("tok"))
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            "term_freq",
            "doc_freq",
            (
                (F.col("term_freq") * F.col("_n_docs")).cast("double")
                / F.col("doc_freq").cast("double")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .drop("rn")
        .orderBy(F.asc("doc_id"), F.desc("score"), F.asc("tok"))
    )


@query(
    "q_rollup_partials",
    oracle="""
    SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) / 100.0 AS avg_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_rollup_partials(spark, sf_dir):
    """Continuous-aggregate state as a query: the exact (bucket, key) →
    (n, exact-cents sum) partials `streaming.rollup` maintains
    incrementally, with the derived average — so the maintenance
    operator's target state is itself oracle-checked, not just
    unit-tested. Partials are a commutative monoid; this batch form and
    the incremental form converge to identical rows by construction
    (asserted against each other in tests/test_rollup.py). One scan, one
    map-side-partial aggregate; shuffle ∝ buckets × keys."""
    from self_healing_data_pipeline_spark.functions.scalar import ts_str
    from self_healing_data_pipeline_spark.streaming.rollup import aggregate_batch

    ev = read_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    partials = aggregate_batch(
        ev, F.date_trunc("hour", "ts"), ["event_type"], "value"
    )
    return partials.select(
        ts_str("bucket").alias("bucket"),
        "event_type",
        "n",
        "sum_cents",
        (
            F.col("sum_cents").cast("double")
            / F.col("n").cast("double")
            / 100.0
        ).alias("avg_value"),
    ).orderBy("bucket", "event_type")
