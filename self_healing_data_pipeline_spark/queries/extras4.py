"""Scale-path queries with exact oracles: skew-salted aggregation/join
(SURVEY.md §4 tuning, `operators/skew.py`), equi-width histogram
profiling (§2.4), and bigram extraction via higher-order array functions
(§2.8, §2.11 text analysis).

The salted variants are oracle-checked against the PLAIN formulation:
salting must be a pure physical rewrite — same rows out, hot keys spread
over `salt` reducers. Locking that equivalence into the correctness gate
is what makes the skew path safe to reach for at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.functions.scalar import dsum
from self_healing_data_pipeline_spark.operators.skew import (
    salted_agg_count,
    salted_join,
)
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_skew_salted_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def q_skew_salted_agg(spark, sf_dir):
    """Two-phase salted count for skewed group keys (partial per
    (key, salt) → final per key). The oracle is the plain GROUP BY —
    salting is invisible in the result, only in the shuffle layout.
    Note lineitem's returnflag/linestatus IS a skewed key set (3×2 groups
    over all rows), exactly the shape where AQE can't help an aggregate."""
    li = read_table(spark, sf_dir, "lineitem")
    return salted_agg_count(li, ["l_returnflag", "l_linestatus"], salt=16)


@query(
    "q_skew_salted_join",
    oracle="""
    SELECT s.s_name,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    """,
)
def q_skew_salted_join(spark, sf_dir):
    """Salted fact-to-dimension join: lineitem rows get a deterministic
    hash salt, supplier is replicated ×salt, join on (key, salt). The
    oracle is the unsalted join — same result set, no straggler reducer.
    Shuffle trade: |lineitem| + salt·|supplier| for salt-way parallelism
    on hot supplier keys."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice"
    )
    sup = read_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    joined = salted_join(
        li, sup, key="l_suppkey", salt=8, fingerprint_cols=["l_extendedprice"]
    )
    return joined.groupBy("s_name").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum("l_extendedprice").alias("total_price"),
    )


@query(
    "q_profile_histogram",
    oracle="""
    WITH b AS (
      SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
    ), binned AS (
      SELECT LEAST(CAST(FLOOR((o_totalprice - b.lo) / ((b.hi - b.lo) / 10.0))
                        AS BIGINT), 9) AS bin
      FROM orders, b
    )
    SELECT bin, COUNT(*) AS n_rows FROM binned GROUP BY bin ORDER BY bin
    """,
)
def q_profile_histogram(spark, sf_dir):
    """Equi-width 10-bin histogram of a numeric column — the distribution
    profile backing the reference's 'Possible outliers detected' category
    (geminiService.ts:64) in deterministic form. min/max come from a
    broadcast 1-row aggregate; bin arithmetic is identical IEEE double ops
    on both engines, so bin edges agree bit-for-bit. One scan for bounds +
    one for binning; at 100 TB the bounds pass is a cheap column-pruned
    scan (or comes from catalog stats for free)."""
    o = read_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / 10.0
    return (
        o.crossJoin(F.broadcast(bounds))
        .select(
            F.least(
                F.floor((F.col("o_totalprice") - F.col("lo")) / width).cast(
                    "bigint"
                ),
                F.lit(9).cast("bigint"),
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("bin")
    )


@query(
    "q_text_ngrams",
    oracle="""
    WITH toks AS (
      SELECT string_split(lower(text), ' ') AS ts FROM documents
    ), grams AS (
      SELECT UNNEST(list_transform(range(1, len(ts)),
                                   i -> ts[i] || ' ' || ts[i + 1])) AS bigram
      FROM toks WHERE len(ts) >= 2
    )
    SELECT bigram, COUNT(*) AS n
    FROM grams GROUP BY bigram
    ORDER BY n DESC, bigram LIMIT 20
    """,
)
def q_text_ngrams(spark, sf_dir):
    """Top-20 word bigrams over the corpus, built with engine-side
    higher-order array functions (transform over an index sequence —
    no UDF, no Python in the hot path; the oracle mirrors it with
    DuckDB's list_transform). Tie-broken on the bigram string so top-k
    is total-ordered."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(F.split(F.lower("text"), " ").alias("ts")).filter(
        F.size("ts") >= 2
    )
    grams = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(ts) - 2),"
                " i -> concat(ts[i], ' ', ts[i + 1]))"
            )
        ).alias("bigram")
    )
    return (
        grams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )


@query(
    "q_agg_unpivot",
    oracle="""
    SELECT c_custkey, metric, val FROM (
      UNPIVOT (SELECT c_custkey, c_acctbal AS acctbal,
                      CAST(c_nationkey AS DOUBLE) AS nationkey
               FROM customer)
      ON acctbal, nationkey INTO NAME metric VALUE val
    )
    """,
)
def q_agg_unpivot(spark, sf_dir):
    """UNPIVOT / melt — wide→long reshaping (the inverse of q_agg_pivot).
    Spark's unpivot is a zero-shuffle narrow transform: each input row
    expands to one row per value column, so it streams at scan speed."""
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    )
    return c.unpivot(
        ids=["c_custkey"],
        values=["acctbal", "nationkey"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@query(
    "q_stratified_cap",
    oracle="""
    SELECT lang, source, doc_id FROM (
      SELECT lang, source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang, source
                                ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn <= 5
    """,
)
def q_stratified_cap(spark, sf_dir):
    """Per-stratum cap (keep ≤ N docs per (lang, source)) — the
    deterministic stratified-sampling shape training-data pipelines use
    for per-source quotas. One shuffle on the stratum key; at 100 TB the
    rank-and-filter prunes to N·|strata| rows before anything downstream."""
    from pyspark.sql import Window

    d = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("lang", "source", "doc_id")
    )


@query(
    "q_scan_orc",
    oracle="SELECT p_partkey, p_brand, p_size, p_retailprice FROM part",
)
def q_scan_orc(spark, sf_dir):
    """ORC scan (columnar alternative to parquet, same pushdown/pruning
    machinery in Spark). Round-trips the part fixture through ORC so the
    values under test are the driver's; the oracle reads the original
    parquet — format change must be value-invisible."""
    import os

    from self_healing_data_pipeline_spark.queries.core import _SCRATCH

    os.makedirs(_SCRATCH, exist_ok=True)
    out = os.path.join(_SCRATCH, "part_orc")
    read_table(spark, sf_dir, "part").write.mode("overwrite").orc(out)
    return spark.read.orc(out).select(
        "p_partkey", "p_brand", "p_size", "p_retailprice"
    )


@query(
    "q_join_bucketed",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_join_bucketed(spark, sf_dir):
    """Join over pre-bucketed tables: both sides bucketed+sorted on the
    join key at write time (sources.writers.write_bucketed_table), so the
    join itself plans with NO shuffle and no sort — the ingest-time
    layout investment every repeated large-large join at 100 TB should
    make. The oracle is the plain join (layout must be value-invisible).
    """
    import os

    from self_healing_data_pipeline_spark.queries.core import _SCRATCH
    from self_healing_data_pipeline_spark.sources.writers import (
        write_bucketed_table,
    )

    os.makedirs(_SCRATCH, exist_ok=True)
    n_buckets = 8
    for tbl, key, cols in (
        ("orders", "o_custkey", ["o_orderkey", "o_custkey", "o_totalprice"]),
        ("customer", "c_custkey", ["c_custkey", "c_name"]),
    ):
        name = f"{tbl}_bucketed"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        write_bucketed_table(
            read_table(spark, sf_dir, tbl).select(*cols),
            name,
            [key],
            n_buckets=n_buckets,
            sort_cols=[key],
            mode="overwrite",
            path=os.path.join(_SCRATCH, name),
        )
    o = spark.table("orders_bucketed")
    c = spark.table("customer_bucketed")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_name"
    )


@query(
    "q_basket_pairs",
    oracle="""
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           COUNT(*) AS n_co
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    ORDER BY n_co DESC, part_a, part_b LIMIT 50
    """,
)
def q_basket_pairs(spark, sf_dir):
    """Market-basket co-occurrence: part pairs bought in the same order,
    ranked by frequency — the 'discover relationships in the data'
    capability the reference's vision assigns to the engine
    (README.md:21).

    Round-13 plan rewrite (guide §1.2 step 1, §2.4): the basket-key
    self-join (two exchanges of the line grain plus two sorts) is now
    one partial-aggregated ``collect_list`` shuffle keyed on the order
    followed by a bounded in-array pair explode — the
    ``co_order_pairs`` basket discipline, MULTISET variant: the sorted
    list keeps duplicate (order, part) lines, positional pairs with a
    ``p1 <> p2`` filter are exactly the oracle's ``a.l_partkey <
    b.l_partkey`` pairs (the list is sorted, so a later element is
    value-greater unless equal), and multiplicities multiply as the
    self-join did. Pair volume is still Σ|basket|² (baskets ≤ ~7
    lines), output identical. Top-k via TakeOrderedAndProject with
    full tie-break."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pair_expr = (
        "flatten(transform(parts, (x, i) ->"
        " transform(slice(parts, i + 2, size(parts) - i - 1),"
        " y -> struct(x AS p1, y AS p2))))"
    )
    return (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_partkey")).alias("parts"))
        .select(F.explode(F.expr(pair_expr)).alias("pr"))
        .where(F.col("pr.p1") != F.col("pr.p2"))
        .groupBy(
            F.col("pr.p1").alias("part_a"),
            F.col("pr.p2").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_co"))
        .orderBy(F.col("n_co").desc(), "part_a", "part_b")
        .limit(50)
    )


@query(
    "q_scan_partition_pruned",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
    """,
)
def q_scan_partition_pruned(spark, sf_dir):
    """Directory-partitioned layout + partition pruning: orders written
    once partitioned by order year, then scanned with a partition filter —
    the scan touches ONLY the matching directory (PartitionFilters in the
    plan, asserted in tests). At 100 TB this is the difference between
    reading one year and reading the decade. The oracle filters the
    original table — layout must be value-invisible."""
    import os

    from self_healing_data_pipeline_spark.queries.core import _SCRATCH
    from self_healing_data_pipeline_spark.sources.writers import write_parquet

    out = os.path.join(_SCRATCH, f"orders_by_year_{os.path.basename(sf_dir)}")
    # Write once per SF, reuse across calls; gate on the _SUCCESS marker so
    # an interrupted earlier write re-runs instead of poisoning every call.
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        os.makedirs(_SCRATCH, exist_ok=True)
        write_parquet(
            read_table(spark, sf_dir, "orders").withColumn(
                "o_year", F.year("o_orderdate")
            ),
            out,
            mode="overwrite",
            partition_by=["o_year"],
        )
    return (
        spark.read.parquet(out)
        .filter(F.col("o_year") == 1997)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
    )


@query(
    "q_groupwise_argmax",
    oracle="""
    WITH spend AS (
      SELECT c.c_nationkey, c.c_custkey, c.c_name,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_spent
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2, 3
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                   ORDER BY total_spent DESC, c_custkey) AS rn
      FROM spend
    )
    SELECT c_nationkey, c_custkey, c_name, total_spent
    FROM ranked WHERE rn = 1
    """,
)
def q_groupwise_argmax(spark, sf_dir):
    """Group-wise argmax (top customer per nation by exact-decimal total
    spend): join → hash agg → window rank → filter. The aggregation
    reduces to |customers| rows BEFORE the window, so the rank pass
    shuffles the reduced set, not raw orders; tie-break on c_custkey
    keeps the winner total-ordered."""
    from pyspark.sql import Window

    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    spend = (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_nationkey", "c_custkey", "c_name")
        .agg(dsum("o_totalprice").alias("total_spent"))
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("total_spent").desc(), F.col("c_custkey")
    )
    return (
        spend.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_nationkey", "c_custkey", "c_name", "total_spent")
    )


@query(
    "q_events_anomaly",
    oracle="""
    WITH hourly AS (
      SELECT event_type, DATE_TRUNC('hour', ts) AS hour, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), m AS (
      SELECT event_type,
             CAST(COUNT(*) AS DOUBLE) AS cnt,
             CAST(SUM(n) AS DOUBLE) AS sx,
             CAST(SUM(n * n) AS DOUBLE) AS sxx
      FROM hourly GROUP BY event_type
    )
    SELECT h.event_type, STRFTIME(h.hour, '%Y-%m-%d %H:%M:%S') AS hour_s,
           h.n,
           (CAST(h.n AS DOUBLE) - sx / cnt)
             / SQRT(GREATEST((cnt * sxx - sx * sx)
                             / (cnt * (cnt - 1.0)), 1e-12)) AS z
    FROM hourly h JOIN m USING (event_type)
    WHERE ABS((CAST(h.n AS DOUBLE) - sx / cnt)
              / SQRT(GREATEST((cnt * sxx - sx * sx)
                              / (cnt * (cnt - 1.0)), 1e-12))) >= 2.5
    """,
)
def q_events_anomaly(spark, sf_dir):
    """Volume anomaly detection: hourly event counts per type, flag hours
    whose z-score ≥ 2.5 — the deterministic engine twin of the
    reference's LLM quality category 'Possible outliers detected'
    (geminiService.ts:64), applied to stream monitoring. Moments come
    from integer count sums (exact), so the z arithmetic is identical
    IEEE ops on both engines. Two cheap aggregations (events → hours →
    per-type moments) + a broadcast joinback of the tiny moment table —
    at 100 TB the hourly rollup is the only pass over raw data."""
    ev = read_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    m = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("cnt"),
        F.sum("n").cast("double").alias("sx"),
        F.sum(F.col("n") * F.col("n")).cast("double").alias("sxx"),
    )
    z = (F.col("n").cast("double") - F.col("sx") / F.col("cnt")) / F.sqrt(
        F.greatest(
            (F.col("cnt") * F.col("sxx") - F.col("sx") * F.col("sx"))
            / (F.col("cnt") * (F.col("cnt") - F.lit(1.0))),
            F.lit(1e-12),
        )
    )
    return (
        hourly.join(F.broadcast(m), "event_type")
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= 2.5)
        .select(
            "event_type",
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour_s"),
            "n",
            "z",
        )
    )


@query(
    "q_dedup_clusters",
    oracle="""
    WITH RECURSIVE e AS MATERIALIZED (
      SELECT a.doc_id AS x, b.doc_id AS y
      FROM documents a JOIN documents b
        ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) <= 4
    ), nodes AS MATERIALIZED (
      SELECT DISTINCT x AS n FROM e UNION SELECT DISTINCT y FROM e
    ), sym AS MATERIALIZED (
      SELECT x, y FROM e UNION SELECT y, x FROM e UNION SELECT n, n FROM nodes
    ), reach(a, b) AS (
      SELECT x, y FROM sym
      UNION
      SELECT r.a, s.y FROM reach r JOIN sym s ON r.b = s.x
    )
    SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a
    """,
)
def q_dedup_clusters(spark, sf_dir):
    """Dedup CLUSTER RESOLUTION: near-dup pairs (the oracle-checked fuzzy
    edges) resolved into connected components — every document labeled
    with its cluster's minimum doc_id. Pairwise dedup alone under-merges
    (A~B, B~C but A!~C must still be ONE group); transitivity is what a
    keep-one-per-cluster policy needs. Spark side: iterative min-label
    propagation (operators.dedup.connected_components); oracle: DuckDB
    recursive-CTE transitive closure — two very different evaluation
    strategies agreeing exactly."""
    from self_healing_data_pipeline_spark.operators.dedup import (
        connected_components,
    )
    from self_healing_data_pipeline_spark.queries.extras3 import q_fuzzy_match

    edges = q_fuzzy_match(spark, sf_dir).select("doc_a", "doc_b")
    cc = connected_components(edges, id_l="doc_a", id_r="doc_b")
    return cc.select(F.col("node").alias("doc_id"), "cluster_id")
