"""Data-quality audit queries (SURVEY.md §2.11, round 4).

The reference's core loop is ingest → validate → quarantine → verify
(`APP/App.tsx` review gates + load-verify read-back; `README.md:2`'s
"self-healing" claim). This module is that loop's audit surface as
first-class queries: declarative expectations, referential integrity,
key uniqueness, distribution drift, Benford conformance, freshness,
outlier fences, and schema/type inference over dirty string columns —
each oracle-checked against DuckDB.

Scale discipline shared by every query here:

- Rule evaluation is ONE aggregate pass per table (map-side partial
  counters, ~N longs per task cross the wire) — never a scan per rule.
- Ratios are a single IEEE division of exact integer masses; drift
  scores keep the numerator in exact integer arithmetic so cross-engine
  float summation order can't flip a bit.
- FK audits join child→parent on the key with small parents broadcast;
  the one big-big pair (lineitem⋈orders) shuffles on the join key
  exactly once.
- Medians/MADs are rank-based (window per group), not interpolated —
  deterministic across engines and skew-safe (per-group windows, no
  global sort).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_dq_expectations",
    oracle="""
    WITH c AS (
      SELECT COUNT(*) AS n,
        CAST(SUM(CASE WHEN NOT COALESCE(l_quantity > 0, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_quantity_positive,
        CAST(SUM(CASE WHEN NOT COALESCE(l_discount BETWEEN 0 AND 1, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_discount_in_unit_range,
        CAST(SUM(CASE WHEN NOT COALESCE(l_extendedprice > 0, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_price_positive,
        CAST(SUM(CASE WHEN NOT COALESCE(l_tax BETWEEN 0 AND 1, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_tax_in_unit_range,
        CAST(SUM(CASE WHEN NOT COALESCE(l_returnflag IN ('A','N','R'), FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_returnflag_enum,
        CAST(SUM(CASE WHEN NOT COALESCE(l_shipdate IS NOT NULL, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_shipdate_not_null
      FROM lineitem
    )
    SELECT rule, n_rows, n_violations,
           CASE WHEN n_rows = 0 THEN 1.0
                ELSE (n_rows - n_violations) / CAST(n_rows AS DOUBLE) END
             AS pass_rate,
           n_violations = 0 AS ok
    FROM (
      SELECT 'quantity_positive' AS rule, n AS n_rows, v_quantity_positive AS n_violations FROM c
      UNION ALL SELECT 'discount_in_unit_range', n, v_discount_in_unit_range FROM c
      UNION ALL SELECT 'price_positive', n, v_price_positive FROM c
      UNION ALL SELECT 'tax_in_unit_range', n, v_tax_in_unit_range FROM c
      UNION ALL SELECT 'returnflag_enum', n, v_returnflag_enum FROM c
      UNION ALL SELECT 'shipdate_not_null', n, v_shipdate_not_null FROM c
    ) ORDER BY rule
    """,
)
def q_dq_expectations(spark, sf_dir):
    """Declarative expectation suite over lineitem via
    ``operators.expectations.run_expectations`` — six rules, ONE
    aggregate scan (each task emits one counter row; no per-rule jobs).
    The report row shape is (rule, n_rows, n_violations, pass_rate, ok);
    pass_rate is a single IEEE division of exact longs."""
    from self_healing_data_pipeline_spark.operators.expectations import (
        expect_between,
        expect_in,
        expect_not_null,
        expect_positive,
        run_expectations,
    )

    li = read_table(spark, sf_dir, "lineitem")
    rules = [
        expect_positive("quantity_positive", "l_quantity"),
        expect_between("discount_in_unit_range", "l_discount", 0, 1),
        expect_positive("price_positive", "l_extendedprice"),
        expect_between("tax_in_unit_range", "l_tax", 0, 1),
        expect_in("returnflag_enum", "l_returnflag", ["A", "N", "R"]),
        expect_not_null("shipdate_not_null", "l_shipdate"),
    ]
    return run_expectations(li, rules).orderBy("rule")


@query(
    "q_dq_fk_orphans",
    oracle="""
    SELECT relation, n_child, n_orphans, n_orphans = 0 AS ok FROM (
      SELECT 'customer.c_nationkey->nation' AS relation,
             COUNT(*) AS n_child,
             CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
      FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      UNION ALL
      SELECT 'lineitem.l_orderkey->orders', COUNT(*),
             CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      UNION ALL
      SELECT 'lineitem.l_partkey->part', COUNT(*),
             CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
      UNION ALL
      SELECT 'lineitem.l_suppkey->supplier', COUNT(*),
             CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
      UNION ALL
      SELECT 'nation.n_regionkey->region', COUNT(*),
             CAST(SUM(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
      UNION ALL
      SELECT 'orders.o_custkey->customer', COUNT(*),
             CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    ) ORDER BY relation
    """,
)
def q_dq_fk_orphans(spark, sf_dir):
    """Referential-integrity audit over the full FK graph that
    ``q_join_discovery`` recovers: per relation, child rows vs orphans
    (child keys with no parent). All THREE lineitem FKs audit in ONE
    scan — a single join chain (orders via the one big↔big shuffle;
    the part/supplier key sets are size-chosen by AQE, broadcast at
    fixture SF, shuffle at corpus scale — only the fixed-grain
    nation/region parents keep a forced hint) feeding one aggregate
    that counts the three orphan kinds, unpivoted to per-relation
    rows. The remaining relations are one LEFT JOIN + ungrouped
    aggregate each.
    Orphan counting — not just existence — so the report quantifies
    damage."""

    def audit(child, ckey, parent, pkey, label, broadcast_parent):
        p = parent.select(pkey).distinct()
        if broadcast_parent:
            p = F.broadcast(p)
        return (
            child.select(ckey)
            .join(p, F.col(ckey) == F.col(pkey), "left")
            .agg(
                F.lit(label).alias("relation"),
                F.count(F.lit(1)).alias("n_child"),
                F.sum(F.when(F.col(pkey).isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_orphans"),
            )
            .select(
                "relation",
                "n_child",
                "n_orphans",
                (F.col("n_orphans") == 0).alias("ok"),
            )
        )

    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    s = read_table(spark, sf_dir, "supplier")
    p = read_table(spark, sf_dir, "part")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")

    # all three lineitem FKs audited in ONE scan: chain the parent key
    # sets onto one pass (orders via the single big-big shuffle; part/
    # supplier join strategy left to AQE — they scale with the corpus,
    # so a forced broadcast is a cluster OOM at real SF) and count the
    # three orphan kinds in one aggregate, then unpivot into rows
    li3 = (
        li.select("l_orderkey", "l_partkey", "l_suppkey")
        .join(
            o.select("o_orderkey").distinct(),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left",
        )
        .join(
            p.select("p_partkey").distinct(),
            F.col("l_partkey") == F.col("p_partkey"),
            "left",
        )
        .join(
            s.select("s_suppkey").distinct(),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left",
        )
        .agg(
            F.count(F.lit(1)).alias("n_child"),
            *[
                F.sum(F.when(F.col(k).isNull(), 1).otherwise(0))
                .cast("long")
                .alias(a)
                for k, a in (
                    ("o_orderkey", "orph_orders"),
                    ("p_partkey", "orph_part"),
                    ("s_suppkey", "orph_supplier"),
                )
            ],
        )
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(rel).alias("relation"),
                            F.col("n_child").alias("n_child"),
                            F.col(a).alias("n_orphans"),
                        )
                        for rel, a in (
                            ("lineitem.l_orderkey->orders", "orph_orders"),
                            ("lineitem.l_partkey->part", "orph_part"),
                            ("lineitem.l_suppkey->supplier", "orph_supplier"),
                        )
                    ]
                )
            ).alias("x")
        )
        .select(
            "x.relation",
            "x.n_child",
            "x.n_orphans",
            (F.col("x.n_orphans") == 0).alias("ok"),
        )
    )
    parts = [
        audit(c, "c_nationkey", n, "n_nationkey",
              "customer.c_nationkey->nation", True),
        li3,
        audit(n, "n_regionkey", r, "r_regionkey",
              "nation.n_regionkey->region", True),
        audit(o, "o_custkey", c, "c_custkey",
              "orders.o_custkey->customer", False),
    ]
    out = parts[0]
    for q in parts[1:]:
        out = out.unionByName(q)
    return out.orderBy("relation")


@query(
    "q_dq_uniqueness",
    oracle="""
    SELECT entity, n_rows, n_distinct, n_dup_keys, n_dup_keys = 0 AS ok
    FROM (
      SELECT 'customer.c_custkey' AS entity, COUNT(*) AS n_rows,
             COUNT(DISTINCT c_custkey) AS n_distinct,
             CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT) AS n_dup_keys
      FROM customer
      UNION ALL
      SELECT 'documents.doc_id', COUNT(*), COUNT(DISTINCT doc_id),
             CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT) FROM documents
      UNION ALL
      SELECT 'events.event_id', COUNT(*), COUNT(DISTINCT event_id),
             CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT) FROM events
      UNION ALL
      SELECT 'lineitem.(l_orderkey,l_linenumber)', COUNT(*),
             COUNT(DISTINCT l_orderkey * 16 + l_linenumber),
             CAST(COUNT(*) - COUNT(DISTINCT l_orderkey * 16 + l_linenumber) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'orders.o_orderkey', COUNT(*), COUNT(DISTINCT o_orderkey),
             CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders
    ) ORDER BY entity
    """,
)
def q_dq_uniqueness(spark, sf_dir):
    """Primary-key uniqueness audit: per declared key, rows vs distinct
    keys and the excess (duplicate rows beyond the first per key). The
    composite lineitem key packs (orderkey, linenumber) into one bigint
    (linenumber < 16) so the distinct is a single-column hash aggregate
    on both engines. Each entity is one exact distinct-count aggregate
    (two-stage partial_count_distinct under AQE) — no window, no sort."""

    def audit(df, keycol, label):
        return df.agg(
            F.lit(label).alias("entity"),
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(keycol).alias("n_distinct"),
            (F.count(F.lit(1)) - F.countDistinct(keycol))
            .cast("long")
            .alias("n_dup_keys"),
        ).select(
            "entity",
            "n_rows",
            "n_distinct",
            "n_dup_keys",
            (F.col("n_dup_keys") == 0).alias("ok"),
        )

    li = read_table(spark, sf_dir, "lineitem").withColumn(
        "__pk", F.col("l_orderkey") * 16 + F.col("l_linenumber")
    )
    parts = [
        audit(read_table(spark, sf_dir, "customer"), "c_custkey",
              "customer.c_custkey"),
        audit(read_table(spark, sf_dir, "documents"), "doc_id",
              "documents.doc_id"),
        audit(read_table(spark, sf_dir, "events"), "event_id",
              "events.event_id"),
        audit(li, "__pk", "lineitem.(l_orderkey,l_linenumber)"),
        audit(read_table(spark, sf_dir, "orders"), "o_orderkey",
              "orders.o_orderkey"),
    ]
    out = parts[0]
    for q in parts[1:]:
        out = out.unionByName(q)
    return out.orderBy("entity")


@query(
    "q_dq_benford",
    oracle="""
    WITH digits AS (
      SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ), tot AS (SELECT COUNT(*) AS n FROM digits)
    SELECT d.digit,
           COUNT(*) AS n_orders,
           COUNT(*) / CAST(MIN(t.n) AS DOUBLE) AS observed_share,
           ROUND(LOG10(1.0 + 1.0 / d.digit), 6) AS benford_share,
           ROUND(ABS(COUNT(*) / CAST(MIN(t.n) AS DOUBLE)
                     - LOG10(1.0 + 1.0 / d.digit)), 6) AS abs_dev
    FROM digits d CROSS JOIN tot t
    GROUP BY d.digit
    ORDER BY d.digit
    """,
)
def q_dq_benford(spark, sf_dir):
    """Benford first-digit conformance on order totals — the classic
    fabricated-data screen. First digit via integer→string head (exact
    on both engines, no float formatting), shares as one IEEE division
    of exact longs against a broadcast one-row total, and the Benford
    expectation log10(1+1/d) ROUNDed to 6 places so cross-engine libm
    ulp differences cannot flip the hash. One hash aggregate over 9
    groups; the total joins back as a broadcast scalar."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digits = o.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    # ONE scan, one subtree: the grand total is a window sum OVER the
    # 9-row digit histogram (single-partition, but over 9 rows)
    return (
        digits.groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .withColumn(
            "n", F.sum("n_orders").over(Window.partitionBy()).cast("long")
        )
        .select(
            "digit",
            "n_orders",
            (F.col("n_orders") / F.col("n").cast("double")).alias(
                "observed_share"
            ),
            F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias(
                "benford_share"
            ),
            F.round(
                F.abs(
                    F.col("n_orders") / F.col("n").cast("double")
                    - F.log10(1.0 + 1.0 / F.col("digit"))
                ),
                6,
            ).alias("abs_dev"),
        )
        .orderBy("digit")
    )


@query(
    "q_dq_category_drift",
    oracle="""
    WITH m AS (
      SELECT CAST(strftime(o_orderdate, '%Y-%m') AS VARCHAR) AS month,
             o_orderpriority, COUNT(*) AS c_m
      FROM orders GROUP BY 1, 2
    ), mn AS (
      SELECT month, CAST(SUM(c_m) AS BIGINT) AS n_m FROM m GROUP BY month
    ), g AS (
      SELECT o_orderpriority, COUNT(*) AS c_g FROM orders GROUP BY 1
    ), n AS (SELECT COUNT(*) AS n_g FROM orders)
    SELECT m.month, MIN(mn.n_m) AS n_orders,
           CAST(SUM(ABS(m.c_m * (SELECT n_g FROM n) - g.c_g * mn.n_m)) AS BIGINT)
             AS l1_mass,
           0.5 * (CAST(SUM(ABS(m.c_m * (SELECT n_g FROM n) - g.c_g * mn.n_m)) AS BIGINT)
                  / CAST(MIN(mn.n_m) * (SELECT n_g FROM n) AS DOUBLE)) AS tvd
    FROM m JOIN mn USING (month) JOIN g USING (o_orderpriority)
    GROUP BY m.month
    ORDER BY m.month
    """,
)
def q_dq_category_drift(spark, sf_dir):
    """Population-stability drift monitor: per month, the total-variation
    distance between that month's order-priority mix and the global mix
    — the screen that catches a upstream feed silently changing its
    category distribution. The TVD numerator Σ|c_m·N − c_g·n_m| stays in
    EXACT integer arithmetic (so cross-engine float summation order is
    irrelevant) and only the final scale is one IEEE division. Costs:
    one months×priorities aggregate, a broadcast 5-row global mix, a
    broadcast 1-row total. Bound: c·N products stay under int64 while
    rows < ~3×10⁹ per side (documented overflow fence; at larger scale
    switch the product column to decimal(38,0))."""
    o = read_table(spark, sf_dir, "orders").select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        "o_orderpriority",
    )
    # ONE table scan, ONE subtree: the months×priorities aggregate
    # (~#months·5 rows) is the only read; monthly totals, the global
    # mix, and the grand total are window sums OVER that aggregate —
    # joins back to re-derived branches would re-scan the table
    m = o.groupBy("month", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("c_m")
    )
    m = m.select(
        "month",
        "o_orderpriority",
        "c_m",
        F.sum("c_m").over(Window.partitionBy("month")).cast("long").alias("n_m"),
        F.sum("c_m")
        .over(Window.partitionBy("o_orderpriority"))
        .cast("long")
        .alias("c_g"),
        # global total: single-partition window over the ~#months·5-row
        # aggregate (bounded by the calendar, not the data)
        F.sum("c_m").over(Window.partitionBy()).cast("long").alias("n_g"),
    )
    return (
        m.groupBy("month")
        .agg(
            F.min("n_m").alias("n_orders"),
            F.sum(
                F.abs(F.col("c_m") * F.col("n_g") - F.col("c_g") * F.col("n_m"))
            )
            .cast("long")
            .alias("l1_mass"),
            (
                F.lit(0.5)
                * (
                    F.sum(
                        F.abs(
                            F.col("c_m") * F.col("n_g")
                            - F.col("c_g") * F.col("n_m")
                        )
                    ).cast("long")
                    / (F.min("n_m") * F.min("n_g")).cast("double")
                )
            ).alias("tvd"),
        )
        .orderBy("month")
    )


@query(
    "q_dq_freshness",
    oracle="""
    WITH g AS (SELECT MAX(ts) AS max_all FROM events)
    SELECT event_type, COUNT(*) AS n_events, MAX(ts) AS latest,
           (epoch_us(MIN(g.max_all)) - epoch_us(MAX(ts))) // 60000000
             AS staleness_min
    FROM events CROSS JOIN g
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_dq_freshness(spark, sf_dir):
    """Freshness/staleness audit: per event type, latest arrival and its
    lag in whole minutes behind the freshest record anywhere — the check
    that catches one upstream topic silently stalling while the rest of
    the feed advances. One 5-group aggregate + a broadcast 1-row global
    max; integer minutes keep the comparison exact."""
    e = read_table(spark, sf_dir, "events")
    # ONE scan, one subtree: the global max is a window max OVER the
    # 5-row per-type aggregate (single-partition, but over 5 rows)
    per_type = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"), F.max("ts").alias("latest")
    )
    return (
        per_type.withColumn(
            "max_all", F.max("latest").over(Window.partitionBy())
        )
        .select(
            "event_type",
            "n_events",
            "latest",
            # whole-microsecond integer arithmetic, then integer-divide to
            # minutes: exact on both engines (no boundary-crossing
            # semantics, no sub-second truncation)
            # (NTZ→TZ cast is safe: the tz offset cancels in the diff)
            F.floor(
                (
                    F.unix_micros(F.col("max_all").cast("timestamp"))
                    - F.unix_micros(F.col("latest").cast("timestamp"))
                )
                / F.lit(60000000)
            )
            .cast("long")
            .alias("staleness_min"),
        )
        .orderBy("event_type")
    )


@query(
    "q_dq_type_inference",
    oracle="""
    WITH raw AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS c_id,
             CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS c_date,
             o_orderpriority AS c_text,
             CASE WHEN o_orderkey % 10 = 0 THEN 'N/A'
                  ELSE CAST(o_orderkey % 97 AS VARCHAR) END AS c_dirty
      FROM orders
    ), prof AS (
      SELECT col, n, n_bigint, n_date FROM (
        SELECT 'c_id' AS col, COUNT(*) AS n,
               CAST(SUM(CASE WHEN TRY_CAST(c_id AS BIGINT) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bigint,
               CAST(SUM(CASE WHEN TRY_CAST(c_id AS DATE) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_date
        FROM raw
        UNION ALL
        SELECT 'c_date', COUNT(*),
               CAST(SUM(CASE WHEN TRY_CAST(c_date AS BIGINT) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN TRY_CAST(c_date AS DATE) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM raw
        UNION ALL
        SELECT 'c_text', COUNT(*),
               CAST(SUM(CASE WHEN TRY_CAST(c_text AS BIGINT) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN TRY_CAST(c_text AS DATE) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM raw
        UNION ALL
        SELECT 'c_dirty', COUNT(*),
               CAST(SUM(CASE WHEN TRY_CAST(c_dirty AS BIGINT) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN TRY_CAST(c_dirty AS DATE) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        FROM raw
      )
    )
    SELECT col, n, n_bigint, n_date,
           CASE WHEN n_bigint * 100 >= n * 99 THEN 'BIGINT'
                WHEN n_date * 100 >= n * 99 THEN 'DATE'
                ELSE 'TEXT' END AS inferred_type
    FROM prof ORDER BY col
    """,
)
def q_dq_type_inference(spark, sf_dir):
    """Schema inference over dirty string columns — the reference's EP1
    behavior (upload → per-column type analysis, `APP/services/
    geminiService.ts` schema prompt) as a deterministic Spark op. A
    string-typed view is derived from orders (id, ISO date, free text,
    and a 10%-dirty numeric column), then ONE aggregate pass counts
    try_cast successes per candidate type; inference applies a 99%
    majority threshold so the dirty column still heals to TEXT only
    when contamination exceeds tolerance (here 10% > 1% → TEXT).
    Integer-threshold comparison (n_bigint·100 ≥ n·99) keeps the
    decision exact. All counters are map-side partials in a single
    scan of the derived view (the un-stacked form of
    ``run_expectations``)."""
    o = read_table(spark, sf_dir, "orders")
    raw = o.select(
        F.col("o_orderkey").cast("string").alias("c_id"),
        F.col("o_orderdate").cast("date").cast("string").alias("c_date"),
        F.col("o_orderpriority").alias("c_text"),
        F.when(F.col("o_orderkey") % 10 == 0, F.lit("N/A"))
        .otherwise((F.col("o_orderkey") % 97).cast("string"))
        .alias("c_dirty"),
    # fixture parquet is one input split; the per-row try-parses are the
    # cost here, so fan out (real warehouse scans already have many
    # splits — the skinny 4-string-column shuffle is the cheap side)
    ).repartition(spark.sparkContext.defaultParallelism)
    aggs = [F.count(F.lit(1)).alias("n")]
    for col in ["c_id", "c_date", "c_text", "c_dirty"]:
        aggs.append(
            F.sum(
                F.when(F.col(col).try_cast("bigint").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias(f"big_{col}")
        )
        aggs.append(
            # explicit ISO format: Spark's bare string→date cast accepts
            # partial dates ('2024' → 2024-01-01) that DuckDB rejects, so
            # pin the full yyyy-MM-dd pattern both engines agree on. The
            # rlike gate short-circuits non-date strings BEFORE the
            # formatter (whose failure path is exception-driven, ~µs/row
            # — measured 10× on a mostly-non-date column); anything that
            # parses under yyyy-MM-dd matches the regex, so the
            # conjunction is equivalent to the bare parse.
            F.sum(
                F.when(
                    F.col(col).rlike(r"^\d{4}-\d{2}-\d{2}$")
                    & F.try_to_timestamp(
                        F.col(col), F.lit("yyyy-MM-dd")
                    ).isNotNull(),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias(f"date_{col}")
        )
    counts = raw.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(col).alias("col"),
                F.col(f"big_{col}").alias("n_bigint"),
                F.col(f"date_{col}").alias("n_date"),
            )
            for col in ["c_id", "c_date", "c_text", "c_dirty"]
        ]
    )
    return (
        counts.select(F.col("n"), F.explode(pairs).alias("p"))
        .select(
            F.col("p.col").alias("col"),
            "n",
            F.col("p.n_bigint").alias("n_bigint"),
            F.col("p.n_date").alias("n_date"),
        )
        .withColumn(
            "inferred_type",
            F.when(F.col("n_bigint") * 100 >= F.col("n") * 99, "BIGINT")
            .when(F.col("n_date") * 100 >= F.col("n") * 99, "DATE")
            .otherwise("TEXT"),
        )
        .orderBy("col")
    )


@query(
    "q_dq_outlier_mad",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders
    ), med AS (
      SELECT o_orderpriority, o_totalprice AS median_price
      FROM ranked WHERE rn = (n + 1) // 2
    ), dev AS (
      SELECT o.o_orderpriority, o.o_orderkey,
             ABS(o.o_totalprice - m.median_price) AS adev,
             m.median_price
      FROM orders o JOIN med m USING (o_orderpriority)
    ), devranked AS (
      SELECT o_orderpriority, adev, median_price,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY adev, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM dev
    ), mad AS (
      SELECT o_orderpriority, median_price, adev AS mad
      FROM devranked WHERE rn = (n + 1) // 2
    )
    SELECT d.o_orderpriority, MIN(m.median_price) AS median_price,
           MIN(m.mad) AS mad,
           CAST(SUM(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           COUNT(*) AS n_rows
    FROM dev d JOIN mad m USING (o_orderpriority)
    GROUP BY d.o_orderpriority
    ORDER BY d.o_orderpriority
    """,
)
def q_dq_outlier_mad(spark, sf_dir):
    """Robust outlier fence per category: median / MAD (median absolute
    deviation) of order totals per priority, and the count of rows
    outside the 3-MAD fence — the screen that survives the very
    outliers it hunts (unlike mean/stddev z-scores, cf.
    ``q_events_anomaly``). Both medians are exact rank-based picks of
    actual values (lower median, deterministic tie-break on orderkey;
    same discipline as ``q_profile_median``) so the result is bit-stable
    across engines. Two per-group window passes + one aggregate; windows
    partition by priority (parallel across groups, no global sort), and
    the 5-row median/MAD tables broadcast back to the fact side."""
    o = read_table(spark, sf_dir, "orders")
    w1 = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    wn = Window.partitionBy("o_orderpriority")
    med = (
        o.select(
            "o_orderpriority",
            "o_totalprice",
            F.row_number().over(w1).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select(
            "o_orderpriority", F.col("o_totalprice").alias("median_price")
        )
    )
    dev = o.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority",
        "o_orderkey",
        F.abs(F.col("o_totalprice") - F.col("median_price")).alias("adev"),
        "median_price",
    )
    w2 = Window.partitionBy("o_orderpriority").orderBy("adev", "o_orderkey")
    mad = (
        dev.select(
            "o_orderpriority",
            "adev",
            "median_price",
            F.row_number().over(w2).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .filter(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("o_orderpriority", "median_price", F.col("adev").alias("mad"))
    )
    return (
        dev.select("o_orderpriority", "adev")
        .join(F.broadcast(mad), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.min("median_price").alias("median_price"),
            F.min("mad").alias("mad"),
            F.sum(F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_dq_route_quarantine",
    oracle="""
    WITH routed AS (
      SELECT CASE
               WHEN NOT COALESCE(l_quantity > 0, FALSE)
                 THEN 'quantity_positive'
               WHEN NOT COALESCE(l_discount BETWEEN 0 AND 1, FALSE)
                 THEN 'discount_in_unit_range'
               WHEN NOT COALESCE(l_extendedprice > 0, FALSE)
                 THEN 'price_positive'
               WHEN NOT COALESCE(l_returnflag IN ('A','N','R'), FALSE)
                 THEN 'returnflag_enum'
               ELSE 'clean'
             END AS route,
             l_extendedprice
      FROM lineitem
    )
    SELECT route, COUNT(*) AS n_rows,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS amount_cents
    FROM routed GROUP BY route ORDER BY route
    """,
)
def q_dq_route_quarantine(spark, sf_dir):
    """Quarantine routing as a query: every row tagged with its FIRST
    failing rule (``operators.expectations.route_violations`` — the CASE
    chain the quarantine sink writes), then a per-route count + exact
    amount-cents mass so the report shows what value is stuck in
    quarantine, not just how many rows. One narrow projection + one
    small-cardinality aggregate; the CASE chain is a single codegen'd
    expression, no extra scan per rule."""
    from self_healing_data_pipeline_spark.operators.expectations import (
        expect_between,
        expect_in,
        expect_positive,
        route_violations,
    )

    li = read_table(spark, sf_dir, "lineitem")
    rules = [
        expect_positive("quantity_positive", "l_quantity"),
        expect_between("discount_in_unit_range", "l_discount", 0, 1),
        expect_positive("price_positive", "l_extendedprice"),
        expect_in("returnflag_enum", "l_returnflag", ["A", "N", "R"]),
    ]
    return (
        route_violations(li, rules)
        .select(
            F.coalesce(F.col("quarantine_rule"), F.lit("clean")).alias(
                "route"
            ),
            "l_extendedprice",
        )
        .groupBy("route")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
            .cast("long")
            .alias("amount_cents"),
        )
        .orderBy("route")
    )
