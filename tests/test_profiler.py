"""Profiler + catalog tests: the deterministic replacement for the
reference's LLM schema-analysis step, including the TEXT-on-mixed rule
and quality-issue categories (geminiService.ts:61,64)."""

from __future__ import annotations

from self_healing_data_pipeline_spark.plans.catalog import (
    ColumnAnalysis,
    TableSchema,
    schema_to_struct,
    struct_to_ddl,
)
from self_healing_data_pipeline_spark.plans.profiler import profile_dataframe


def test_profile_messy_columns(spark):
    rows = [
        ("1", "Alice", "alice@example.com", "2024-01-15", "1203.50", "true"),
        ("2", "Bob", None, "2024-02-01", "-50.25", "false"),
        ("3", "Carol", "carol@example", "2024-02-30", "abc", "true"),
        (None, "Dave", "dave@example.com", None, "0", "maybe"),
    ]
    df = spark.createDataFrame(
        rows, "cust_id string, name string, email string, signup string,"
        " balance string, active string"
    )
    schema = profile_dataframe(df, "messy")
    by_name = {c.column_name: c for c in schema.columns}

    assert by_name["cust_id"].inferred_sql_type == "INTEGER"
    assert "Contains null values" in by_name["cust_id"].quality_issues
    assert by_name["balance"].inferred_sql_type == "TEXT"  # mixed → TEXT
    assert "Mixed data types detected" in by_name["balance"].quality_issues
    assert by_name["active"].inferred_sql_type == "TEXT"  # true/false/maybe
    assert by_name["email"].semantic_type == "email"
    assert "Inconsistent formatting" in by_name["email"].quality_issues
    # 2024-02-30 still matches the date SHAPE; shape-wise consistent
    assert by_name["signup"].inferred_sql_type == "DATE"


def test_profile_numeric_outliers(spark):
    vals = [(float(i),) for i in range(100)] + [(10_000.0,)]
    df = spark.createDataFrame(vals, "x double")
    schema = profile_dataframe(df, "t")
    assert "Possible outliers detected" in schema.columns[0].quality_issues


def test_freeze_and_ddl_roundtrip():
    schema = TableSchema(
        "orders_q1",
        [
            ColumnAnalysis("id", "INTEGER"),
            ColumnAnalysis("amount", "REAL"),
            ColumnAnalysis("note", "TEXT", quality_issues=["Contains null values"]),
        ],
    )
    struct = schema_to_struct(schema)
    assert [f.dataType.simpleString() for f in struct.fields] == [
        "bigint",
        "double",
        "string",
    ]
    assert struct.fields[2].metadata["qualityIssues"] == ["Contains null values"]
    ddl = struct_to_ddl("orders_q1", struct)
    assert ddl.startswith('CREATE TABLE "orders_q1"')
    assert '"amount" REAL' in ddl


def test_one_scan_plan_at_width(spark):
    """r7 verdict task 8: the one-scan claim must hold at 100+ columns
    (~6 aggregate expressions per column). 120 columns mixing string /
    double / long thirds -> the physical plan is a single scan feeding
    one aggregate chain: no joins, no repeated scans, no shuffle of raw
    rows (only the aggregate's one-row exchange)."""
    from self_healing_data_pipeline_spark.plans.profiler import (
        first_pass_aggregate,
    )

    cols = []
    for i in range(40):
        cols.append(f"CAST(id + {i} AS STRING) AS s{i}")
        cols.append(f"CAST(id * 1.5 + {i} AS DOUBLE) AS d{i}")
        cols.append(f"id + {i} AS l{i}")
    df = spark.range(100).selectExpr(*cols)
    assert len(df.columns) == 120
    agg = first_pass_aggregate(df)
    plan = agg._jdf.queryExecution().executedPlan().toString()
    n_scans = plan.count("Scan ExistingRDD") + plan.count(
        "LocalTableScan"
    ) + plan.count("Range (")
    assert n_scans == 1, plan[:2000]
    assert "Join" not in plan
    # and it actually computes: one row, with the expected measure count
    row = agg.collect()[0].asDict()
    assert row["__total"] == 100
    assert sum(k.startswith("nulls__") for k in row) == 120
