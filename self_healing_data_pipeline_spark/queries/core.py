"""Core scan / preview / cast queries (SURVEY.md §2.1, §2.2, build step 1)."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import (
    read_csv,
    read_json,
    read_table,
)

# Scratch dir for round-trip scan tests (CSV/JSON inputs are derived from the
# read-only parquet fixtures; we never synthesize our own data values).
_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".scratch")


@query(
    "q_scan_parquet",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def q_scan_parquet(spark, sf_dir):
    """Columnar scan with projection pruning (ReadSchema shows 2 cols)."""
    return read_table(spark, sf_dir, "region").select("r_regionkey", "r_name")


@query(
    "q_scan_csv",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def q_scan_csv(spark, sf_dir):
    """CSV scan: header + inferSchema (reference dynamic-typing twin).

    Round-trips the nation fixture through CSV so the values under test are
    the driver's, not synthesized.
    """
    os.makedirs(_SCRATCH, exist_ok=True)
    out = os.path.join(_SCRATCH, "nation_csv")
    read_table(spark, sf_dir, "nation").coalesce(1).write.mode("overwrite").option(
        "header", True
    ).csv(out)
    return read_csv(spark, out).select("n_nationkey", "n_name", "n_regionkey")


@query(
    "q_scan_json",
    oracle="SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
)
def q_scan_json(spark, sf_dir):
    """JSON scan (JSONL) with schema inference over all rows — the fix for
    the reference's first-row-keys schema rule (SURVEY.md §1.1)."""
    os.makedirs(_SCRATCH, exist_ok=True)
    out = os.path.join(_SCRATCH, "supplier_json")
    read_table(spark, sf_dir, "supplier").coalesce(1).write.mode("overwrite").json(out)
    df = read_json(spark, out, multi_line=False)
    return df.select(
        "s_suppkey",
        "s_name",
        "s_nationkey",
        F.col("s_acctbal").cast("double").alias("s_acctbal"),
    )


@query(
    "q_preview_limit",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag LIMIT 10
    """,
)
def q_preview_limit(spark, sf_dir):
    """SELECT * LIMIT n preview read-back (reference pgliteService.ts:81-101)
    under a total order so the preview is deterministic. The fixture's
    (l_orderkey, l_linenumber) is NOT unique (the q_inventory_floor
    round-12 find), so the sort extends to every selected column —
    rows equal on all four are interchangeable in a LIMIT, making the
    preview layout-independent on both engines (round-12 queued
    tie-order batch)."""
    return (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .limit(10)
    )


@query("q_rowcount", oracle="SELECT COUNT(*) AS n_rows FROM lineitem")
def q_rowcount(spark, sf_dir):
    return read_table(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("n_rows")
    )


@query(
    "q_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_day,
           CAST(o_orderkey AS DOUBLE) AS key_dbl
    FROM orders
    """,
)
def q_cast(spark, sf_dir):
    """Type-lattice casts (SURVEY.md §1.2): double→bigint (explicit floor —
    Spark truncates, DuckDB rounds, so raw CAST is not portable),
    long↔string, timestamp→date→string, long→double."""
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.floor("o_totalprice").cast("bigint").alias("price_floor"),
        F.col("o_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.col("o_orderdate").cast("date").cast("string").alias("order_day"),
        F.col("o_orderkey").cast("double").alias("key_dbl"),
    )


@query(
    "q_project",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer",
)
def q_project(spark, sf_dir):
    """Column projection — pruned at the parquet scan."""
    return read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "q_filter_pred",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus = 'O'
      AND o_totalprice BETWEEN 1000 AND 150000
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_custkey IS NOT NULL
    """,
)
def q_filter_pred(spark, sf_dir):
    """Conjunctive predicate surface (=, BETWEEN, IN, >=, IS NOT NULL) —
    all pushed to the parquet scan (PushedFilters in .explain)."""
    o = read_table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "O")
        & F.col("o_totalprice").between(1000, 150000)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
