"""Round-8 batch 65 (SURVEY.md §2.8 / §2.11): OUTER explode (empty
collections keep their row), higher-order array predicates
(EXISTS / FORALL / FILTER — the §2.8 HOF members beyond transform),
error-safe TRY arithmetic (ANSI-mode surface: divide-by-zero → NULL,
not job failure), out-of-vocabulary rate against the corpus head
vocabulary (the tokenizer-coverage metric a training pipeline tracks
per source), and label-balance audit with a deterministic downsample
plan over the embeddings' label column.

Exactness: HOF predicates and counts are integers; OOV shares and
balance ratios are ONE IEEE division of exact longs; try_divide NULLs
are positional, not value-dependent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_explode_outer",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN []
                  ELSE str_split(text, ' ')[1:2] END AS toks
      FROM documents WHERE doc_id % 25 = 0
    )
    SELECT d.doc_id,
           CASE WHEN len(d.toks) = 0 THEN NULL ELSE u.tok END AS tok
    FROM d LEFT JOIN (
      SELECT doc_id, UNNEST(toks) AS tok FROM d
    ) u USING (doc_id)
    ORDER BY doc_id, tok NULLS FIRST
    """,
)
def q_explode_outer(spark, sf_dir):
    """EXPLODE_OUTER — the outer form that KEEPS rows whose collection
    is empty (plain explode silently drops them — the classic lost-
    document bug when a tokenizer yields nothing). Every 3rd sampled
    doc's token list is emptied to exercise the preserved-row path;
    the oracle spells the same semantics as a LEFT JOIN against the
    unnest. Row-local generate, no shuffle."""
    d = read_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 25 == 0
    )
    toks = F.when(
        F.col("doc_id") % 3 == 0, F.array().cast("array<string>")
    ).otherwise(F.slice(F.split(F.col("text"), " "), 1, 2))
    return (
        d.select("doc_id", toks.alias("toks"))
        .select("doc_id", F.explode_outer("toks").alias("tok"))
        .orderBy("doc_id", F.asc_nulls_first("tok"))
    )


@query(
    "q_array_hof_predicates",
    oracle="""
    WITH arr AS (
      SELECT l_orderkey,
             LIST(CAST(l_quantity AS BIGINT)
                  ORDER BY l_linenumber, CAST(l_quantity AS BIGINT)) AS qtys
      FROM lineitem WHERE l_orderkey % 101 = 0
      GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(len(qtys) AS INT) AS n_lines,
           len(list_filter(qtys, q -> q > 45)) > 0 AS any_heavy,
           len(list_filter(qtys, q -> q >= 10)) = len(qtys) AS all_at_least_10,
           CAST(len(list_filter(qtys, q -> q % 2 = 0)) AS INT) AS n_even
    FROM arr ORDER BY l_orderkey
    """,
)
def q_array_hof_predicates(spark, sf_dir):
    """Higher-order array PREDICATES — EXISTS / FORALL / size(FILTER)
    over each order's line-quantity array (§2.8 shipped transform/
    aggregate; the predicate members are what JSON-ish schemas lean
    on). Arrays are bounded (≤7 lines per order) and built under an
    explicit (line-number, quantity) sort — the struct sort_array here
    and the oracle's two-key LIST ORDER BY state the same total-enough
    order, since (l_orderkey, l_linenumber) is not unique in the
    fixture (round-12 queued tie-order batch; the predicate outputs are
    permutation-invariant, so this pins layout-independence rather
    than fixing a live divergence). All outputs are booleans/ints.

    Scale shape: one groupBy collect per order (bounded arrays), then
    row-local JVM higher-order functions — no UDF, no second
    shuffle."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 101 == 0
    )
    arr = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "l_linenumber",
                    F.col("l_quantity").cast("bigint").alias("l_quantity"),
                )
            )
        ).alias("pairs")
    ).select(
        "l_orderkey",
        F.transform(F.col("pairs"), lambda p: p["l_quantity"]).alias("qtys"),
    )
    return arr.select(
        "l_orderkey",
        F.size("qtys").alias("n_lines"),
        F.exists("qtys", lambda q: q > 45).alias("any_heavy"),
        F.forall("qtys", lambda q: q >= 10).alias("all_at_least_10"),
        F.size(F.filter("qtys", lambda q: q % 2 == 0)).alias("n_even"),
    ).orderBy("l_orderkey")


@query(
    "q_try_divide",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero_discount,
           CAST(SUM(CASE WHEN l_discount = 0 THEN NULL
                    ELSE CAST(ROUND(l_extendedprice * 100) AS BIGINT) END)
                AS BIGINT) AS divisible_cents
    FROM lineitem
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def q_try_divide(spark, sf_dir):
    """Error-safe TRY arithmetic (ANSI-mode surface): ``try_divide``
    turns division-by-zero into NULL instead of failing the job — the
    semantics a 100 TB pipeline needs when one poisoned row must not
    kill a stage. The query divides each row's price by its discount
    and aggregates the rows try_divide NULLed (exactly the zero-
    discount rows) against the cents that survived — the oracle states
    the same partition arithmetically, so the NULL behavior itself is
    hash-verified without comparing float quotients."""
    li = read_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    q = F.try_divide(F.lit(1.0), F.col("l_discount"))
    return (
        li.select(
            "l_linestatus",
            q.alias("q"),
            cents.alias("cents"),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(F.col("q").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_zero_discount"),
            F.sum(F.when(F.col("q").isNotNull(), F.col("cents")))
            .cast("bigint")
            .alias("divisible_cents"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q_oov_rate",
    oracle="""
    WITH toks AS (
      SELECT source, UNNEST(str_split(text, ' ')) AS tok
      FROM documents
    ), vocab AS (
      SELECT tok FROM (
        SELECT tok, ROW_NUMBER() OVER
          (ORDER BY COUNT(*) DESC, tok) AS r
        FROM toks GROUP BY tok
      ) WHERE r <= 1000
    )
    SELECT t.source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
    GROUP BY t.source ORDER BY t.source
    """,
)
def q_oov_rate(spark, sf_dir):
    """OUT-OF-VOCABULARY rate per source against the corpus head
    vocabulary (top-1000 tokens by frequency, deterministic tok
    tie-break) — the tokenizer-coverage metric a training pipeline
    tracks per feed: a source whose OOV rate spikes is drifting away
    from the tokenizer's training distribution.

    Scale shape: token counts aggregate at (token) grain (map-side
    partials), the head vocab is a DISTRIBUTED top-k
    (orderBy+limit → TakeOrderedAndProject — never a global
    row_number window, whose single partition would be vocab-sized),
    and the membership check is a broadcast LEFT join — the token
    stream shuffles once for the frequency count and once at source
    grain."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    vocab = (
        counts.orderBy(F.desc("n"), F.asc("tok"))
        .limit(1000)
        .select("tok", F.lit(True).alias("in_vocab"))
    )
    joined = toks.join(F.broadcast(vocab), "tok", "left")
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            "source",
            "n_tokens",
            "n_oov",
            (
                F.col("n_oov").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("oov_rate"),
        )
        .orderBy("source")
    )


@query(
    "q_label_balance",
    oracle="""
    WITH counts AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n
      FROM embeddings GROUP BY label
    ), m AS (SELECT MIN(n) AS min_n, MAX(n) AS max_n FROM counts)
    SELECT c.label, c.n,
           CAST(m.min_n AS BIGINT) AS downsample_to,
           c.n - m.min_n AS n_dropped,
           CAST(m.max_n AS DOUBLE) / CAST(m.min_n AS DOUBLE)
             AS imbalance_ratio
    FROM counts c, m
    ORDER BY c.label
    """,
)
def q_label_balance(spark, sf_dir):
    """LABEL-BALANCE audit + deterministic rebalancing plan over the
    embeddings' label column: per-class counts, the uniform downsample
    quota (= minority class size — the plan that makes every class
    equal without synthesis), rows each class would drop, and the
    max/min imbalance ratio every class sees (the alarm a training mix
    monitors). Counts are exact; the ratio is one IEEE division of
    exact longs broadcast from a one-row scalar frame."""
    emb = read_table(spark, sf_dir, "embeddings")
    counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    m = counts.agg(
        F.min("n").alias("min_n"), F.max("n").alias("max_n")
    )
    return (
        counts.crossJoin(F.broadcast(m))
        .select(
            "label",
            "n",
            F.col("min_n").alias("downsample_to"),
            (F.col("n") - F.col("min_n")).alias("n_dropped"),
            (
                F.col("max_n").cast("double")
                / F.col("min_n").cast("double")
            ).alias("imbalance_ratio"),
        )
        .orderBy("label")
    )
