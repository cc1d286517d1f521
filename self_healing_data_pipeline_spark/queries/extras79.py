"""Round-8 batch 62 (SURVEY.md §2.9 / §2.11 stream + corpus
analytics): trailing-window distinct actives (the rolling-DAU shape
every event warehouse serves), audience overlap between event types
(exact Jaccard at user grain), hashing-trick token features (the
fixed-width featurizer training pipelines use when vocabularies are
unbounded), and burst-minute detection (rate anomaly vs an exact
median baseline).

Exactness: all counts are exact integers; day/minute grains are
integer µs division (`EPOCH_US // k` ↔ `unix_micros div k` — the
fixture's nanos→µs convention); shares/ratios are ONE final IEEE
division of exact longs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

_DAY_US = 86_400_000_000
_MIN_US = 60_000_000


def _day(col):
    return F.expr(f"unix_micros(cast({col} as timestamp)) div {_DAY_US}")


@query(
    "q_rolling_active_users",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT EPOCH_US(ts) // {_DAY_US} AS day, user_id FROM events
    ), days AS (
      SELECT UNNEST(generate_series((SELECT MIN(day) FROM ud),
                                    (SELECT MAX(day) FROM ud))) AS day
    )
    SELECT d.day AS day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS active_7d
    FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day ORDER BY d.day
    """,
)
def q_rolling_active_users(spark, sf_dir):
    """Trailing-7-day distinct active users per day (rolling DAU/WAU —
    the metric every event warehouse serves). Distinct counts don't
    merge across windows, so the naive form rescans the stream per
    day; the scale-safe decomposition here is: dedup to (day, user)
    grain ONCE, fan each user-day out to the ≤7 window days it
    contributes to (a bounded explode — shuffle is 7× user-days, tiny
    vs the event stream), then one exact COUNT(DISTINCT) per day. The
    report covers EVERY calendar day in [min_day, max_day] — a gap day
    still has a trailing-window count from the days before it (the
    convention the streaming twin shares, so finalized stream windows
    and batch rows are 1:1; only all-empty windows are absent from
    both).

    The oracle computes the same windows with a range join — at
    fixture scale DuckDB can; the explode form is what survives when
    user-days alone are billions."""
    ev = read_table(spark, sf_dir, "events")
    ud = ev.select(_day("ts").alias("day"), "user_id").distinct()
    bounds = ud.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    fanned = ud.select(
        F.explode(
            F.sequence(F.col("day"), F.col("day") + 6)
        ).alias("day"),
        "user_id",
    )
    return (
        fanned.crossJoin(F.broadcast(bounds))
        .filter(F.col("day") <= F.col("hi"))
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("active_7d"))
        .orderBy("day")
    )


@query(
    "q_type_user_overlap",
    oracle="""
    WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
    sizes AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM tu GROUP BY 1
    ), inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM tu a JOIN tu b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT i.type_a AS type_a, i.type_b AS type_b, i.n_both AS n_both,
           sa.n + sb.n - i.n_both AS n_union,
           CAST(i.n_both AS DOUBLE) / CAST(sa.n + sb.n - i.n_both AS DOUBLE)
             AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.event_type = i.type_a
    JOIN sizes sb ON sb.event_type = i.type_b
    ORDER BY type_a, type_b
    """,
)
def q_type_user_overlap(spark, sf_dir):
    """Audience overlap between event types: exact pairwise Jaccard of
    user populations (|A∩B| / |A∪B|) — the "do purchasers also
    search?" audience question, and the exact ground truth the MinHash
    machinery elsewhere estimates. Dedup to (type, user) grain first,
    self-join on user (the event-type domain is bounded, so fan-out
    per user is ≤ |types|²), intersection counts per ordered pair,
    union by inclusion–exclusion from broadcast per-type sizes —
    integers end-to-end, one final IEEE division."""
    ev = read_table(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    return (
        inter.join(
            F.broadcast(
                sizes.select(
                    F.col("event_type").alias("type_a"),
                    F.col("n").alias("na"),
                )
            ),
            "type_a",
        )
        .join(
            F.broadcast(
                sizes.select(
                    F.col("event_type").alias("type_b"),
                    F.col("n").alias("nb"),
                )
            ),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "n_both",
            (F.col("na") + F.col("nb") - F.col("n_both")).alias("n_union"),
            (
                F.col("n_both").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_both")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "q_text_hashing_features",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(str_split(text, ' ')) AS tok
      FROM documents WHERE doc_id % 100 = 0
    )
    SELECT doc_id,
           CAST(STRPOS('0123456789abcdef', SUBSTR(MD5(tok), 1, 1)) - 1
                AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM toks
    GROUP BY 1, 2
    ORDER BY doc_id, bucket
    """,
)
def q_text_hashing_features(spark, sf_dir):
    """HASHING-TRICK token features: each token maps to one of 16
    buckets by md5 (the fixed-width featurizer training pipelines use
    when the vocabulary is unbounded — no dictionary to build, ship,
    or grow), counts per (doc, bucket). The bucket is the first md5
    hex digit decoded POSITIONALLY ('0123456789abcdef' index
    arithmetic — the repo's portable-hash convention, since both
    engines agree on md5 text but not on hash-to-int casts).

    Scale shape: one tokenize explode (row-local), partial counts
    combine map-side into ≤16 buckets per doc before the shuffle."""
    d = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 100 == 0
    )
    tok = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    bucket = (
        F.instr(
            F.lit("0123456789abcdef"), F.substring(F.md5(F.col("tok")), 1, 1)
        )
        - 1
    ).cast("int")
    return (
        tok.groupBy("doc_id", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("doc_id", "bucket")
    )


@query(
    "q_events_burst_minutes",
    oracle=f"""
    WITH pm AS (
      SELECT EPOCH_US(ts) // {_MIN_US} AS minute,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1
    ), med AS (
      SELECT n AS median_n FROM (
        SELECT n, ROW_NUMBER() OVER (ORDER BY n, minute) AS r,
               COUNT(*) OVER () AS c
        FROM pm
      ) WHERE r = (c + 1) // 2
    )
    SELECT pm.minute AS minute, pm.n AS n, med.median_n AS median_n,
           pm.n > 3 * med.median_n AS is_burst
    FROM pm, med
    ORDER BY pm.n DESC, pm.minute
    LIMIT 5
    """,
)
def q_events_burst_minutes(spark, sf_dir):
    """Burst detection: the top-5 hottest minutes with their exact
    median baseline and an ``is_burst`` flag (count > 3× the median
    minute-count — median, not mean, so the baseline itself is
    burst-robust; the rate-anomaly gate a feed monitor runs). Emitting
    the ranked hot minutes rather than a bare filter keeps the key
    signal-bearing at every SF — a quiet stream reports its hottest
    minutes with is_burst=false instead of an empty frame. The minute
    grain bounds the aggregate frame by the time range, the median is
    an exact lower-median rank selection over that bounded frame, and
    the threshold broadcasts back — the event stream is scanned
    exactly once."""
    ev = read_table(spark, sf_dir, "events")
    pm = (
        ev.select(
            F.expr(f"unix_micros(cast(ts as timestamp)) div {_MIN_US}").alias(
                "minute"
            )
        )
        .groupBy("minute")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # global rank over the MINUTE frame only — bounded by the time
    # range (one month ≈ 44k rows at any corpus size), so the single
    # partition is metadata-grain, never data-grain
    w = Window.orderBy("n", "minute")
    med = (
        pm.select(
            "n",
            F.row_number().over(w).alias("r"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("c"),
        )
        .filter(F.col("r") == F.expr("(c + 1) div 2"))
        .select(F.col("n").alias("median_n"))
    )
    return (
        pm.crossJoin(F.broadcast(med))
        .select(
            "minute",
            "n",
            "median_n",
            (F.col("n") > 3 * F.col("median_n")).alias("is_burst"),
        )
        .orderBy(F.desc("n"), F.asc("minute"))
        .limit(5)
    )
