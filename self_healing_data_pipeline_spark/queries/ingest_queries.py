"""Ingestion routing queries (SURVEY.md §2.1 "API/connector sources").

Batch twins of ``streaming.ingest.incremental_ingest_with_quarantine``:
records arrive as serialized feed payloads (the API-extractor landing
pattern), get parsed under a frozen schema, and are ROUTED — loaded,
malformed (unparseable), or missing a required field — instead of silently
nulled or fatally failing the job. The routing aggregate is fully
oracle-checked: the corruption rule is deterministic on event_id, so the
expected per-route counts and loaded-value sums are plain ANSI SQL over
the raw table.

At 100 TB: parse + route is a narrow map (no shuffle); the only shuffle is
the 3-group aggregate. A bad feed page costs its own rows, not the load.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from self_healing_data_pipeline_spark.functions.scalar import dec
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

_FEED_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@query(
    "q_ingest_quarantine",
    oracle="""
    SELECT CASE WHEN event_id % 37 = 0 THEN 'malformed'
                WHEN event_id % 41 = 0 THEN 'missing_required_field'
                ELSE 'loaded' END AS status,
           COUNT(*) AS n_records,
           CAST(SUM(CASE WHEN event_id % 37 <> 0 AND event_id % 41 <> 0
                         THEN CAST(ROUND(value * 100) AS BIGINT) END)
                AS DOUBLE) / 100.0 AS sum_value_loaded
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
)
def q_ingest_quarantine(spark, sf_dir):
    """Schema-enforced feed ingestion with quarantine routing.

    Simulates the API-connector path end-to-end inside one plan: each
    event serializes to a JSON feed record (to_json); a deterministic
    fault model corrupts every 37th record (truncation → unparseable) and
    nulls the required user_id on every 41st; from_json re-parses under
    the frozen schema and each record routes to loaded / malformed /
    missing_required_field exactly as the streaming quarantine does. The
    oracle recomputes the expected routing from the raw table, so parse
    failure detection itself is verified, not just row counts. The loaded
    sum accumulates exact integer cents (ROUND(value·100) → BIGINT) rather
    than double→DECIMAL casts: decimal tie rounding of a raw double is
    engine-defined, while integer sums are order-insensitive and exact, so
    the oracle stays stable under fixture regeneration.
    """
    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        # fault model (part 1): drop the required field pre-serialization
        F.when(F.col("event_id") % 41 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("user_id"))
        .alias("user_id"),
        "event_type",
        "value",
    )
    feed = ev.select(
        F.col("event_id").alias("src_id"),
        F.to_json(F.struct("event_id", "user_id", "event_type", "value")).alias(
            "payload"
        ),
    )
    # fault model (part 2): truncate every 37th payload → invalid JSON
    feed = feed.withColumn(
        "payload",
        F.when(
            F.col("src_id") % 37 == 0,
            F.expr("substring(payload, 1, length(payload) - 5)"),
        ).otherwise(F.col("payload")),
    )
    parsed = feed.select(
        "src_id", F.from_json("payload", _FEED_SCHEMA).alias("rec")
    )
    status = (
        # PERMISSIVE from_json yields an all-null struct for unparseable
        # input; event_id is never null in a well-formed record, so a null
        # rec.event_id identifies a malformed payload.
        F.when(F.col("rec.event_id").isNull(), "malformed")
        .when(F.col("rec.user_id").isNull(), "missing_required_field")
        .otherwise("loaded")
    )
    return (
        parsed.select(
            status.alias("status"),
            F.col("rec.value").alias("value"),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            (
                F.sum(
                    F.when(
                        F.col("status") == "loaded",
                        F.round(F.col("value") * 100).cast("bigint"),
                    )
                ).cast("double")
                / 100.0
            ).alias("sum_value_loaded"),
        )
        .orderBy("status")
    )


@query(
    "q_merge_upsert",
    oracle="""
    WITH source AS (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2))
                  + CAST(10 AS DECIMAL(18,2)) AS DOUBLE) AS price
      FROM orders WHERE o_orderkey % 11 = 0
      UNION ALL
      SELECT o_orderkey + 10000000, 42.0
      FROM orders WHERE o_orderkey % 13 = 0
    )
    SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
           COALESCE(s.price, t.o_totalprice) AS final_price,
           CASE WHEN t.o_orderkey IS NULL THEN 'inserted'
                WHEN s.o_orderkey IS NULL THEN 'unchanged'
                ELSE 'updated' END AS action
    FROM orders t FULL OUTER JOIN source s ON t.o_orderkey = s.o_orderkey
    """,
)
def q_merge_upsert(spark, sf_dir):
    """MERGE INTO / upsert semantics as a Catalyst plan: a deterministic
    source batch (price updates for existing keys, inserts for new keys)
    merged into the orders table via FULL OUTER JOIN + COALESCE — matched
    rows take the source value, unmatched-source rows insert, everything
    else passes through, each tagged with its action. This is the
    row-level-update idiom for plain parquet tables (a lakehouse format
    turns the same plan into a transactional MERGE; the join-on-key
    shape — shuffle both sides on the merge key, or broadcast a small
    batch — is identical). Decimal arithmetic keeps updated prices
    bit-identical across engines."""
    o = read_table(spark, sf_dir, "orders")
    updates = o.filter(F.col("o_orderkey") % 11 == 0).select(
        "o_orderkey",
        (
            F.col("o_totalprice").cast("decimal(18,2)")
            + F.lit(10).cast("decimal(18,2)")
        )
        .cast("double")
        .alias("price"),
    )
    inserts = o.filter(F.col("o_orderkey") % 13 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        F.lit(42.0).alias("price"),
    )
    source = updates.unionByName(inserts)
    t = o.select("o_orderkey", "o_totalprice").alias("t")
    s = source.alias("s")
    return t.join(
        s, F.col("t.o_orderkey") == F.col("s.o_orderkey"), "full_outer"
    ).select(
        F.coalesce(F.col("t.o_orderkey"), F.col("s.o_orderkey")).alias(
            "o_orderkey"
        ),
        F.coalesce(F.col("s.price"), F.col("t.o_totalprice")).alias(
            "final_price"
        ),
        F.when(F.col("t.o_orderkey").isNull(), "inserted")
        .when(F.col("s.o_orderkey").isNull(), "unchanged")
        .otherwise("updated")
        .alias("action"),
    )


@query(
    "q_scd2_versions",
    oracle="""
    SELECT o_custkey,
           o_orderkey AS version_key,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS effective_from,
           STRFTIME(LEAD(o_orderdate) OVER w, '%Y-%m-%d') AS effective_to,
           (LEAD(o_orderdate) OVER w IS NULL) AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_scd2_versions(spark, sf_dir):
    """Slowly-changing-dimension type 2 build: each customer's orders
    become versioned rows with [effective_from, effective_to) validity —
    effective_to is the next version's start (NULL = current). One lead()
    window over (key, time, tie-break); a single shuffle on the dimension
    key builds the full version history, the standard warehouse pattern
    for tracking attribute changes over time."""
    from pyspark.sql import Window

    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        F.col("o_orderkey").alias("version_key"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("effective_from"),
        F.date_format(nxt, "yyyy-MM-dd").alias("effective_to"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "q_schema_evolution",
    oracle="""
    WITH v1 AS (
      SELECT event_id, CAST(user_id AS INTEGER) AS user_id, event_type
      FROM events WHERE ts < TIMESTAMP '2024-04-01 00:00:00'
    ), v2 AS (
      SELECT event_id, user_id, value, props
      FROM events WHERE ts >= TIMESTAMP '2024-04-01 00:00:00'
    ), unioned AS (
      SELECT event_id, CAST(user_id AS BIGINT) AS user_id, event_type,
             CAST(NULL AS DOUBLE) AS value, CAST(NULL AS VARCHAR) AS props
      FROM v1
      UNION ALL
      SELECT event_id, user_id, CAST(NULL AS VARCHAR), value, props
      FROM v2
    )
    SELECT COUNT(*) AS n_rows,
           COUNT(event_type) AS n_event_type,
           COUNT(value) AS n_value,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM unioned
    """,
)
def q_schema_evolution(spark, sf_dir):
    """Self-healing schema evolution (the reference's core premise:
    ingest adapts to drift instead of crashing). Two event batches with
    drifted schemas — v2 widens user_id int→bigint, drops event_type,
    adds value and props — union through
    ``operators.schema_evolution.evolve_union``: diff → widen along the
    numeric lattice → null-fill → unionByName (order-drift-proof). The
    oracle hand-writes the aligned UNION ALL, so the operator's widening
    and null-filling are value-verified, not just schema-checked. All
    alignment is narrow projections — no shuffle beyond the final
    aggregate."""
    from self_healing_data_pipeline_spark.operators.schema_evolution import (
        evolve_union,
    )

    ev = read_table(spark, sf_dir, "events")
    cut = F.lit("2024-04-01").cast("timestamp_ntz")
    v1 = ev.filter(F.col("ts") < cut).select(
        "event_id", F.col("user_id").cast("int").alias("user_id"), "event_type"
    )
    v2 = ev.filter(F.col("ts") >= cut).select(
        "event_id", "user_id", "value", "props"
    )
    unioned, events = evolve_union(v1, v2)
    kinds = {e.column: e.kind for e in events}
    # The drift report is part of the contract: wrong classification =
    # wrong pipeline behavior, so fail loudly here rather than union
    # misaligned data.
    assert kinds == {
        "user_id": "widened",
        "event_type": "removed",
        "value": "added",
        "props": "added",
    }, kinds
    return unioned.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("event_type").alias("n_event_type"),
        F.count("value").alias("n_value"),
        F.sum(dec("value")).cast("double").alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )
