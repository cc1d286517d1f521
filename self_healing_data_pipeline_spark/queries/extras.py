"""Additional SURVEY.md §2 surface: cube, cross join, subqueries, listagg,
row-distinct, simhash, n-gram-Jaccard verification."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.functions.scalar import dsum
from self_healing_data_pipeline_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_udf,
    simhash_md5_sql,
    simhash_signatures_md5,
)
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_agg_cube(spark, sf_dir):
    """CUBE: all 4 grouping-set combinations in one pass (Expand operator —
    rows are replicated per grouping set map-side, one shuffle total)."""
    return (
        read_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
            F.grouping("o_orderpriority").cast("bigint").alias("g_prio"),
        )
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT r.r_name, p.o_orderpriority, COUNT(*) AS n
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
    CROSS JOIN nation n
    WHERE n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, p.o_orderpriority
    """,
)
def q_join_cross(spark, sf_dir):
    """Cartesian product of small dims (broadcast nested loop) + filter."""
    r = read_table(spark, sf_dir, "region")
    p = read_table(spark, sf_dir, "orders").select("o_orderpriority").distinct()
    n = read_table(spark, sf_dir, "nation")
    return (
        r.crossJoin(p)
        .crossJoin(n)
        .filter(F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q_subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           o_totalprice - (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                                       AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                           FROM orders) AS diff_from_mean
    FROM orders
    """,
)
def q_subquery_scalar(spark, sf_dir):
    """Scalar subquery (global mean) — planned as a broadcast of the 1-row
    aggregate, not a per-row subquery."""
    o = read_table(spark, sf_dir, "orders")
    mean = o.agg(
        (dsum("o_totalprice") / F.count(F.lit(1)).cast("double")).alias("__mean")
    )
    return o.crossJoin(F.broadcast(mean)).select(
        "o_orderkey",
        "o_totalprice",
        (F.col("o_totalprice") - F.col("__mean")).alias("diff_from_mean"),
    )


@query(
    "q_agg_listagg",
    oracle="""
    SELECT n_regionkey,
           STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def q_agg_listagg(spark, sf_dir):
    """Ordered string aggregation: collect_list → array_sort → join
    (deterministic — never rely on collect_list order alone)."""
    return (
        read_table(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            )
        )
        .orderBy("n_regionkey")
    )


@query(
    "q_distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q_distinct_rows(spark, sf_dir):
    """Whole-row DISTINCT (hash aggregate on all columns)."""
    return (
        read_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
    )


@query(
    "q_profile_median",
    oracle="""
    WITH ranked AS (
      SELECT c_mktsegment, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal, c_custkey) AS rn,
             COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM customer
    )
    SELECT c_mktsegment, c_acctbal AS median_low
    FROM ranked WHERE rn = (n + 1) // 2
    ORDER BY c_mktsegment
    """,
)
def q_profile_median(spark, sf_dir):
    """Exact rank-based median (lower median) — deterministic across
    engines, unlike interpolated percentile arithmetic; the profiling
    primitive for outlier bounds. One window pass per group."""
    from pyspark.sql import Window

    c = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    wn = Window.partitionBy("c_mktsegment")
    return (
        c.select(
            "c_mktsegment",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("c_mktsegment", F.col("c_acctbal").alias("median_low"))
        .orderBy("c_mktsegment")
    )


@query(
    "q_profile_catalog",
    oracle="""
    SELECT column_name, sql_type, null_count, distinct_count FROM (
      SELECT 'o_orderkey' AS column_name, 'INTEGER' AS sql_type,
             CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count,
             COUNT(DISTINCT o_orderkey) AS distinct_count FROM orders
      UNION ALL
      SELECT 'o_orderstatus', 'TEXT',
             CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(DISTINCT o_orderstatus) FROM orders
      UNION ALL
      SELECT 'o_totalprice', 'REAL',
             CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(DISTINCT o_totalprice) FROM orders
    ) ORDER BY column_name
    """,
)
def q_profile_catalog(spark, sf_dir):
    """The catalog as a query: per-column type/null/cardinality rows — the
    deterministic ColumnAnalysis core (reference types.ts:2-9) over orders,
    with the reference's type-lattice names (geminiService.ts:61)."""
    from self_healing_data_pipeline_spark.plans.catalog import sql_type_of

    o = read_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    kinds = {f.name: sql_type_of(f.dataType.simpleString())
             for f in o.schema.fields}
    agg = o.agg(
        *[F.sum(F.col(c).isNull().cast("bigint")).alias(f"n__{c}") for c in cols],
        *[F.countDistinct(c).alias(f"d__{c}") for c in cols],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.lit(kinds[c]).alias("sql_type"),
                F.col(f"n__{c}").alias("null_count"),
                F.col(f"d__{c}").alias("distinct_count"),
            )
            for c in cols
        ]
    )
    return (
        agg.select(F.explode(rows).alias("r"))
        .select("r.column_name", "r.sql_type", "r.null_count", "r.distinct_count")
        .orderBy("column_name")
    )


# ONE dialect-neutral ANSI string, executed verbatim by BOTH engines —
# the direct twin of the reference's executeSql choke point
# (pgliteService.ts:36-49): whatever SQL the (LLM) layer emits, the engine
# runs it through the same single entry.
_PASSTHROUGH_SQL = """
    SELECT o.o_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY o.o_orderkey
    ORDER BY revenue DESC, o.o_orderkey ASC
    LIMIT 10
"""


@query("q_sql_passthrough", oracle=_PASSTHROUGH_SQL)
def q_sql_passthrough(spark, sf_dir):
    """TPC-H-Q3-shaped revenue query executed as a raw SQL string — the
    reference's arbitrary-SQL surface (§2.1). The oracle is the SAME
    string: one dialect-neutral statement, two engines."""
    from self_healing_data_pipeline_spark.sql import (
        execute_sql,
        register_fixture_views,
    )

    register_fixture_views(
        spark, sf_dir, tables=("orders", "customer", "lineitem")
    )
    return execute_sql(spark, _PASSTHROUGH_SQL)


@query(
    "q_map_funcs",
    oracle="""
    SELECT event_id,
           ARRAY_TO_STRING(json_keys(props), ',') AS prop_keys,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def q_map_funcs(spark, sf_dir):
    """Map-typed semi-structured access: JSON string → MapType →
    map_keys / element lookup (§2.8 map family)."""
    ev = read_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("prop_keys"),
        m.getItem("k").alias("k_val"),
    )


@query("q_dedup_simhash", oracle=simhash_md5_sql("documents", ngram=3))
def q_dedup_simhash(spark, sf_dir):
    """64-bit SimHash fingerprints over 3-gram shingles; near-dups differ
    in few bits (banded Hamming join is the scale path). PROMOTED to
    oracle-backed (round-10): the term hash is md5-derived (two 32-bit
    halves — integer arithmetic both engines share bit-for-bit), so
    DuckDB replays the whole sign-sum pipeline and the driver hash gate
    checks every one of the 64 bits of every signature. The Arrow
    SipHash kernel (``simhash_signatures``) remains the engine-internal
    fast path used by ``q_dedup_simhash_pairs``."""
    docs = read_table(spark, sf_dir, "documents")
    return simhash_signatures_md5(docs, "doc_id", "text", ngram=3)


@query(
    "q_dedup_simhash_pairs",
    oracle=f"""
    WITH sig AS ({simhash_md5_sql("documents", ngram=3)})
    SELECT l.doc_id AS id_l, r.doc_id AS id_r,
           CAST(BIT_COUNT(XOR(l.simhash, r.simhash)) AS INT) AS hamming
    FROM sig l JOIN sig r ON l.doc_id < r.doc_id
    WHERE BIT_COUNT(XOR(l.simhash, r.simhash)) <= 8
    """,
)
def q_dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs via pigeonhole banding (Hamming ≤ 8 over
    3-gram shingles) — one banded shuffle + exact popcount verify, no
    O(n²) compare on the engine side.

    PROMOTED to oracle-backed (round-10): unlike MinHash-LSH banding,
    the 9-band pigeonhole is LOSSLESS at Hamming ≤ 8 (8 differing bits
    can break at most 8 of 9 bands, so every qualifying pair shares at
    least one full band), so a complete-pairs oracle asserts exactly
    what the algorithm promises — no probabilistic recall over-claim
    (contrast q_dedup_ngram_verify, deliberately rows-only). The
    signature is the md5-derived twin DuckDB replays bit-for-bit
    (`simhash_signatures_md5`); the oracle recomputes every signature
    and self-joins by exact popcount, while the engine side still runs
    the banded plan — so the hash gate proves banding ≡ exhaustive
    compare on real data. The SipHash kernel (`simhash_signatures`)
    remains the engine-internal fast path."""
    docs = read_table(spark, sf_dir, "documents")
    from self_healing_data_pipeline_spark.operators.dedup import simhash_pairs

    return simhash_pairs(docs, "doc_id", "text", max_hamming=8, use_md5=True)


@query("q_dedup_ngram_verify")  # candidate generation uses LSH → rows-only
def q_dedup_ngram_verify(spark, sf_dir):
    """The full near-dup pipeline: MinHash-LSH candidates → exact n-gram
    Jaccard verification ≥ 0.5. Candidates are O(collisions); the exact
    check touches only candidate pairs, never n².

    Deliberately rows-only (round-10 promotion triage): a "complete
    pairs ≥ 0.5" oracle would assert 100% LSH recall, which the 8×4
    banding does not promise at J=0.5 (collision prob ≈ 0.40 there) —
    and a measured sweep found exactly one true pair escaping the bands
    at sf0.1 (255/256 caught; 28/28 and 25/25 at sf0.001/sf0.01). The
    exact-verification arithmetic itself IS oracle-covered by
    q_dedup_jaccard_prefix, whose complete shared-shingle twin proves
    the same set arithmetic with a lossless candidate generator."""
    docs = read_table(spark, sf_dir, "documents")
    cand = minhash_lsh_pairs(docs, "doc_id", "text")
    l = docs.select(F.col("doc_id").alias("id_l"), F.col("text").alias("text_l"))
    r = docs.select(F.col("doc_id").alias("id_r"), F.col("text").alias("text_r"))
    return (
        cand.join(l, "id_l")
        .join(r, "id_r")
        .select(
            "id_l",
            "id_r",
            F.round(
                ngram_jaccard_udf(5)(F.col("text_l"), F.col("text_r")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.5)
    )


@query(
    "q_profile_quartiles",
    oracle="""
    WITH r AS (
      SELECT c_mktsegment, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal, c_custkey) AS rn,
             COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
      FROM customer
    )
    SELECT c_mktsegment,
           MAX(CASE WHEN rn = CAST(CEIL(0.25 * n) AS BIGINT)
                    THEN c_acctbal END) AS q1,
           MAX(CASE WHEN rn = CAST(CEIL(0.50 * n) AS BIGINT)
                    THEN c_acctbal END) AS median,
           MAX(CASE WHEN rn = CAST(CEIL(0.75 * n) AS BIGINT)
                    THEN c_acctbal END) AS q3
    FROM r GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q_profile_quartiles(spark, sf_dir):
    """Exact rank-based quartiles per group (value at rank ceil(q*n) under
    a total order) — deterministic across engines, unlike interpolated
    percentile arithmetic, and the profiling basis for IQR outlier
    fences. One window shuffle on the group key, then a tiny conditional
    aggregate; at 100 TB the per-group sort is the cost, which is why the
    sketch twin (q_agg_approx_percentile) exists for wide profiling."""
    from pyspark.sql import Window

    c = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    wn = Window.partitionBy("c_mktsegment")
    r = c.select(
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    def at(q):
        return F.max(
            F.when(
                F.col("rn") == F.ceil(F.lit(q) * F.col("n")).cast("bigint"),
                F.col("c_acctbal"),
            )
        )
    return (
        r.groupBy("c_mktsegment")
        .agg(at(0.25).alias("q1"), at(0.50).alias("median"), at(0.75).alias("q3"))
        .orderBy("c_mktsegment")
    )
