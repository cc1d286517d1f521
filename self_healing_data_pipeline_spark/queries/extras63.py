"""Round-6 batch 46 (SURVEY.md §2.9 analytics / §2.11 corpus):
GROWTH ACCOUNTING (the weekly new / retained / resurrected / churned
user ledger — the canonical active-user decomposition every growth
team reports, at week grain because the fixture stream spans one
month) and VOCABULARY GROWTH CHECKPOINTS (types-vs-tokens at doc
prefixes — the measured Heaps' law curve that sizes tokenizer vocabs
and predicts BPE merge-table growth).

Exactness: both are pure integer counting; ratios are final mirrored
divisions of exact counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

_CHECKPOINTS = (50, 100, 200, 300, 400, 500)


@query(
    "q_growth_accounting",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id,
             (CAST(ts AS DATE) - DATE '1970-01-05') // 7 AS wk
      FROM events
    ), firsts AS (
      SELECT user_id, MIN(wk) AS first_wk FROM uw GROUP BY 1
    ), weeks AS (
      SELECT DISTINCT wk FROM uw
    ), cur AS (
      SELECT uw.wk, uw.user_id, f.first_wk,
             CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END AS prev_active
      FROM uw
      JOIN firsts f ON uw.user_id = f.user_id
      LEFT JOIN uw p ON p.user_id = uw.user_id AND p.wk = uw.wk - 1
    ), churn AS (
      SELECT uw.wk + 1 AS wk, CAST(COUNT(*) AS BIGINT) AS n_churned
      FROM uw
      LEFT JOIN uw nx ON nx.user_id = uw.user_id AND nx.wk = uw.wk + 1
      WHERE nx.user_id IS NULL
      GROUP BY 1
    )
    SELECT CAST(DATE '1970-01-05' + CAST(c.wk * 7 AS INTEGER) AS VARCHAR)
             AS week_start,
           CAST(SUM(CASE WHEN c.first_wk = c.wk THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new,
           CAST(SUM(CASE WHEN c.prev_active = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_retained,
           CAST(SUM(CASE WHEN c.first_wk <> c.wk AND c.prev_active = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
           CAST(COALESCE(MIN(ch.n_churned), 0) AS BIGINT) AS n_churned
    FROM cur c
    LEFT JOIN churn ch ON ch.wk = c.wk
    WHERE c.wk IN (SELECT wk FROM weeks)
    GROUP BY c.wk ORDER BY week_start
    """,
)
def q_growth_accounting(spark, sf_dir):
    """GROWTH ACCOUNTING at week grain: each week's active users
    split into NEW (first week ever), RETAINED (also active the
    previous week) and RESURRECTED (active, but last seen before the
    previous week), plus CHURNED (active the previous week, absent
    this week) — the growth-team ledger satisfying WAU(t) = new +
    retained + resurrected and WAU(t) − WAU(t−1) = new + resurrected
    − churned. Weeks are exact integers (days-since-Monday-epoch div
    7), sidestepping engine week-numbering conventions entirely; the
    fixture's one-month stream yields 5 weekly cohort rows.

    Scale shape: everything runs on the DISTINCT (user, week) grain —
    orders of magnitude below event grain; first-week is one MIN
    aggregate, previous/next-week presence are two same-key self-joins
    on (user, wk±1) integer arithmetic (co-partitioned on user), and
    the ledger collapses at week grain."""
    ev = read_table(spark, sf_dir, "events")
    wk = F.expr(
        "datediff(CAST(ts AS DATE), DATE '1970-01-05') div 7"
    )
    uw = ev.select("user_id", wk.alias("wk")).distinct()
    firsts = uw.groupBy("user_id").agg(F.min("wk").alias("first_wk"))
    p = uw.select(F.col("user_id").alias("pu"), F.col("wk").alias("pw"))
    cur = (
        uw.join(firsts, "user_id")
        .join(
            p,
            (F.col("user_id") == F.col("pu"))
            & (F.col("pw") == F.col("wk") - 1),
            "left",
        )
        .select(
            "wk",
            "first_wk",
            F.when(F.col("pu").isNotNull(), 1).otherwise(0).alias(
                "prev_active"
            ),
        )
    )
    nx = uw.select(F.col("user_id").alias("nu"), F.col("wk").alias("nw"))
    churn = (
        uw.join(
            nx,
            (F.col("user_id") == F.col("nu"))
            & (F.col("nw") == F.col("wk") + 1),
            "left",
        )
        .where(F.col("nu").isNull())
        .groupBy((F.col("wk") + 1).alias("cwk"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_churned"))
    )
    weeks = uw.select("wk").distinct()
    ledger = cur.groupBy("wk").agg(
        F.sum(F.when(F.col("first_wk") == F.col("wk"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_new"),
        F.sum(F.when(F.col("prev_active") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_retained"),
        F.sum(
            F.when(
                (F.col("first_wk") != F.col("wk")) & (F.col("prev_active") == 0),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_resurrected"),
    )
    week_start = F.date_add(
        F.lit("1970-01-05").cast("date"), (F.col("wk") * 7).cast("int")
    ).cast("string")
    return (
        ledger.join(F.broadcast(churn), ledger.wk == churn.cwk, "left")
        .join(
            F.broadcast(weeks.select(F.col("wk").alias("ww"))),
            ledger.wk == F.col("ww"),
        )
        .select(
            week_start.alias("week_start"),
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce(F.col("n_churned"), F.lit(0))
            .cast("bigint")
            .alias("n_churned"),
        )
        .orderBy("week_start")
    )


@query(
    "q_vocab_growth",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text),
                    '[^a-z0-9]+', ' ', 'g')), ' ')) AS w
      FROM documents
    ), first_seen AS (
      SELECT w, MIN(doc_id) AS fd FROM toks GROUP BY w
    ), cp AS (
      SELECT UNNEST(ARRAY{list(_CHECKPOINTS)}) AS c
    )
    SELECT CAST(cp.c AS BIGINT) AS checkpoint_docs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM toks
            WHERE doc_id < cp.c) AS n_tokens,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM first_seen
            WHERE fd < cp.c) AS n_types,
           (SELECT CAST(COUNT(*) AS DOUBLE) FROM first_seen
            WHERE fd < cp.c)
             / (SELECT CAST(COUNT(*) AS DOUBLE) FROM toks
                WHERE doc_id < cp.c) AS type_token_ratio
    FROM cp ORDER BY checkpoint_docs
    """,
)
def q_vocab_growth(spark, sf_dir):
    """VOCABULARY GROWTH (measured Heaps' law): at each doc-count
    checkpoint, the exact token count and DISTINCT-type count of the
    corpus prefix — the types-vs-tokens curve that sizes a tokenizer
    vocabulary, predicts BPE merge-table growth, and justifies the
    top-K cap on q_text_token_bpe training (VERDICT r4 item 6). A
    flattening curve says the vocab is closed (synthetic word-pool
    corpora flatten instantly; web corpora keep growing ~n^0.5).

    Scale shape: cumulative DISTINCT doesn't decompose, so the exact
    form works on the FIRST-SEEN grain — one MIN(doc_id) per type
    (type-grain aggregate), then each type/token row lands in the
    checkpoints at or after it via one bounded ×|checkpoints|
    broadcast range join (the q_events_stickiness coverage-projection
    trick). No per-prefix rescans, no window over the corpus."""
    docs = read_table(spark, sf_dir, "documents")
    from self_healing_data_pipeline_spark.operators.dedup import normalize_text

    toks = docs.select(
        "doc_id",
        F.explode(F.split(normalize_text("text"), " ")).alias("w"),
    )
    cps = [F.lit(c) for c in _CHECKPOINTS]
    cp = (
        toks.sparkSession.range(1)
        .select(F.explode(F.array(*cps)).alias("c"))
    )
    tok_counts = (
        toks.crossJoin(F.broadcast(cp))
        .where(F.col("doc_id") < F.col("c"))
        .groupBy("c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tokens"))
    )
    first_seen = toks.groupBy("w").agg(F.min("doc_id").alias("fd"))
    type_counts = (
        first_seen.crossJoin(F.broadcast(cp))
        .where(F.col("fd") < F.col("c"))
        .groupBy("c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_types"))
    )
    return (
        tok_counts.join(type_counts, "c")
        .select(
            F.col("c").cast("bigint").alias("checkpoint_docs"),
            "n_tokens",
            "n_types",
            (
                F.col("n_types").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("type_token_ratio"),
        )
        .orderBy("checkpoint_docs")
    )
