"""Round-5 batch 2 (SURVEY.md §2.9/§2.11): split-leakage auditing,
rolling-active stickiness, readability scoring, and order-backlog
tracking — the audit/engagement metrics that close out the BI and
corpus-hygiene surface.

Same scale discipline as the rest of the repo: exact integer masses
with at most one IEEE division per output row, calendar-bounded or
fingerprint-grain shuffles, no global ordered stage anywhere."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_split_leakage",
    oracle=r"""
    WITH tagged AS (
      SELECT CASE WHEN SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                  THEN 'train'
                  WHEN SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                  THEN 'val' ELSE 'test' END AS split,
             MD5(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g'))) AS fp
      FROM documents
    ), per_fp AS (
      SELECT fp,
             COUNT(*) FILTER (WHERE split = 'train') AS n_train,
             COUNT(*) FILTER (WHERE split = 'val') AS n_val,
             COUNT(*) FILTER (WHERE split = 'test') AS n_test
      FROM tagged GROUP BY fp
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_contents,
           CAST(COUNT(*) FILTER (
             WHERE (n_train > 0 AND (n_val > 0 OR n_test > 0))
                OR (n_val > 0 AND n_test > 0)
           ) AS BIGINT) AS n_leaking,
           CAST(COUNT(*) FILTER (WHERE n_train + n_val + n_test > 1)
                AS BIGINT) AS n_duplicated,
           CAST(SUM(CASE WHEN n_train > 0 AND n_test > 0
                         THEN n_test ELSE 0 END) AS BIGINT)
             AS test_docs_seen_in_train
    FROM per_fp
    """,
)
def q_split_leakage(spark, sf_dir):
    """Train/test split LEAKAGE AUDIT — the check behind
    ``q_split_assign``'s "leakage-stable" claim: identical CONTENT
    (normalized fingerprint, the ``q_dedup_normalized`` key) must not
    straddle split boundaries, because id-hash splitting only prevents
    the same DOCUMENT from moving — duplicated content with different
    ids still leaks evaluation data into training. Reports corpus-level
    counts: distinct contents, contents present in >1 split, duplicated
    contents, and the head count every eval paper cares about — test
    documents whose content also appears in train.

    Plan: one narrow map (split tag + fingerprint), one
    fingerprint-grain aggregate with conditional counters (map-side
    partial), one 1-row rollup. Shuffle carries 32-hex fingerprints
    only; no text, no joins, nothing ordered."""
    d = read_table(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = F.when(h < "cc", "train").when(h < "e6", "val").otherwise("test")
    fp = F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
    per_fp = (
        d.select(split.alias("split"), fp.alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.when(F.col("split") == "train", 1)).alias("n_train"),
            F.count(F.when(F.col("split") == "val", 1)).alias("n_val"),
            F.count(F.when(F.col("split") == "test", 1)).alias("n_test"),
        )
    )
    leak = (
        ((F.col("n_train") > 0) & ((F.col("n_val") > 0) | (F.col("n_test") > 0)))
        | ((F.col("n_val") > 0) & (F.col("n_test") > 0))
    )
    return per_fp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_contents"),
        F.count(F.when(leak, 1)).cast("bigint").alias("n_leaking"),
        F.count(
            F.when(F.col("n_train") + F.col("n_val") + F.col("n_test") > 1, 1)
        )
        .cast("bigint")
        .alias("n_duplicated"),
        F.sum(
            F.when(
                (F.col("n_train") > 0) & (F.col("n_test") > 0),
                F.col("n_test"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("test_docs_seen_in_train"),
    )


@query(
    "q_events_stickiness",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), dau AS (
      SELECT day, COUNT(*) AS dau FROM ud GROUP BY day
    ), coverage AS (
      SELECT user_id, d AS day
      FROM ud, UNNEST(generate_series(0, 6)) AS t(off),
           LATERAL (SELECT ud.day + CAST(off || ' days' AS INTERVAL) AS d)
      GROUP BY user_id, d
    ), wau AS (
      SELECT day, COUNT(*) AS wau FROM coverage GROUP BY day
    )
    SELECT CAST(dau.day AS VARCHAR) AS day,
           CAST(dau.dau AS BIGINT) AS dau,
           CAST(wau.wau AS BIGINT) AS wau,
           CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
    FROM dau JOIN wau ON dau.day = wau.day
    ORDER BY day
    """,
)
def q_events_stickiness(spark, sf_dir):
    """DAU / trailing-7-day WAU stickiness per day — the engagement
    ratio every growth dashboard tracks. Rolling DISTINCT doesn't
    decompose like a running sum, so the scale-safe exact form works on
    the (user, day) ACTIVE grain (already deduped — orders of magnitude
    below event grain): each active day projects onto the 7 calendar
    days it keeps the user active for (bounded ×7 explode), a distinct
    collapse per (user, covered-day), then per-day counts. Shuffles
    carry (user, day) pairs only; the ratio is one IEEE division of two
    exact counts. Days are reported only where a DAU exists (identical
    join semantics on both engines)."""
    e = read_table(spark, sf_dir, "events")
    ud = e.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    coverage = (
        ud.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
            ).alias("day"),
        )
        .distinct()
    )
    wau = coverage.groupBy("day").agg(F.count(F.lit(1)).alias("wau"))
    return (
        dau.join(wau, "day")
        .select(
            F.col("day").cast("string").alias("day"),
            F.col("dau").cast("bigint").alias("dau"),
            F.col("wau").cast("bigint").alias("wau"),
            (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


@query(
    "q_text_readability",
    oracle=r"""
    SELECT doc_id,
           CAST(LEN(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT)
             AS n_words,
           CAST(LEN(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
             AS n_vowel_groups,
           CAST(LEN(regexp_extract_all(text, '[.!?]')) + 1 AS BIGINT)
             AS n_sentences,
           CAST(LEN(regexp_extract_all(lower(text), '[a-z]+')) AS DOUBLE)
             / CAST(LEN(regexp_extract_all(text, '[.!?]')) + 1 AS DOUBLE)
             AS words_per_sentence
    FROM documents
    WHERE LEN(regexp_extract_all(lower(text), '[a-z]+')) > 0
    ORDER BY doc_id
    """,
)
def q_text_readability(spark, sf_dir):
    """Readability raw factors per document — the Flesch-style quality
    signal computed WITHOUT a tokenizer model: word count (letter
    runs), syllable proxy (vowel groups — the standard heuristic), and
    sentence count (terminal punctuation + 1), plus words-per-sentence
    as one IEEE division of exact counts. A corpus filter drops
    documents outside sane readability bands; this query emits the
    factors so the band is a downstream predicate, not baked in.

    Plan: three JVM ``regexp_count``-style projections in one narrow
    map — no explode, no shuffle before the (already tiny) ordered
    output. Counting via regexp_extract_all length keeps both engines
    on the identical regex semantics."""
    d = read_table(spark, sf_dir, "documents")
    words = F.size(F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
    vowels = F.size(F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)"))
    sents = F.size(F.expr("regexp_extract_all(text, '[.!?]', 0)")) + 1
    return (
        d.select(
            "doc_id",
            words.cast("bigint").alias("n_words"),
            vowels.cast("bigint").alias("n_vowel_groups"),
            sents.cast("bigint").alias("n_sentences"),
            (words.cast("double") / sents.cast("double")).alias(
                "words_per_sentence"
            ),
        )
        .filter(F.col("n_words") > 0)
        .orderBy("doc_id")
    )


@query(
    "q_orders_backlog",
    oracle="""
    WITH monthly AS (
      SELECT CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS month,
             COUNT(*) AS n_opened,
             COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished
      FROM orders GROUP BY 1
    )
    SELECT month,
           CAST(n_opened AS BIGINT) AS n_opened,
           CAST(n_finished AS BIGINT) AS n_finished,
           CAST(SUM(n_opened - n_finished) OVER (ORDER BY month
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS open_backlog
    FROM monthly ORDER BY month
    """,
)
def q_orders_backlog(spark, sf_dir):
    """Open-order backlog over time: per month, orders opened vs
    finished and the running balance of still-open orders — the
    operational-health curve behind fulfillment dashboards (TPC-H has
    no close date, so 'finished' is status F attributed to the opening
    month; the shape — paired counters + running balance — is the
    general backlog recipe). The running sum windows over per-MONTH
    rows: input bounded by the calendar regardless of order volume
    (the ``q_period_growth`` discipline; the single-partition pass
    touches ~100 rows, constant in data size)."""
    o = read_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_opened"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
    )
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return (
        monthly.select(
            "month",
            F.col("n_opened").cast("bigint").alias("n_opened"),
            F.col("n_finished").cast("bigint").alias("n_finished"),
            F.sum(F.col("n_opened") - F.col("n_finished"))
            .over(w)
            .cast("bigint")
            .alias("open_backlog"),
        )
        .orderBy("month")
    )
