"""Unit tests for the declarative expectations runner
(operators/expectations.py): report correctness, NULL-as-violation
semantics, first-failing-rule routing, and the one-scan plan shape."""

import pytest
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.operators.expectations import (
    Expectation,
    expect_between,
    expect_in,
    expect_not_null,
    expect_positive,
    route_violations,
    run_expectations,
)


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, 10.0, "A"),
        (2, -5.0, "A"),      # violates amount_positive
        (3, None, "B"),      # NULL amount: violates amount_positive too
        (4, 2.0, "X"),       # violates flag_enum
        (5, 150.0, "B"),     # violates amount_range
    ]
    return spark.createDataFrame(rows, "id long, amount double, flag string")


def _rules():
    # built lazily: Column construction needs an active SparkContext
    return [
        expect_positive("amount_positive", "amount"),
        expect_between("amount_range", "amount", 0, 100),
        expect_in("flag_enum", "flag", ["A", "B"]),
        expect_not_null("id_not_null", "id"),
    ]


def test_report_counts(df):
    rep = {r["rule"]: r for r in run_expectations(df, _rules()).collect()}
    assert rep["amount_positive"]["n_violations"] == 2  # -5 and NULL
    assert rep["amount_range"]["n_violations"] == 3  # -5, NULL, 150
    assert rep["flag_enum"]["n_violations"] == 1
    assert rep["id_not_null"]["n_violations"] == 0
    assert all(r["n_rows"] == 5 for r in rep.values())
    assert rep["id_not_null"]["ok"] and not rep["amount_range"]["ok"]
    assert rep["flag_enum"]["pass_rate"] == 0.8


def test_null_predicate_counts_as_violation(spark):
    # a rule that cannot be evaluated on a row is not satisfied by it
    d = spark.createDataFrame([(None,), (1.0,)], "x double")
    rep = run_expectations(d, [Expectation("x_pos", F.col("x") > 0)]).collect()
    assert rep[0]["n_violations"] == 1


def test_empty_table_passes(spark):
    d = spark.createDataFrame([], "x double")
    rep = run_expectations(d, [Expectation("x_pos", F.col("x") > 0)]).collect()
    assert rep[0]["n_rows"] == 0
    assert rep[0]["ok"] and rep[0]["pass_rate"] == 1.0


def test_single_scan_plan(df):
    # the whole suite compiles to ONE aggregate over ONE scan — no
    # per-rule jobs (the 100 TB property); the explode of the counter
    # row happens after the final aggregate
    plan = run_expectations(df, _rules())._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") == 1
    assert "Join" not in plan


def test_route_first_failing_rule(df):
    routed = {
        r["id"]: r["quarantine_rule"]
        for r in route_violations(df, _rules()).collect()
    }
    assert routed[1] is None
    assert routed[2] == "amount_positive"  # first in rule order, not range
    assert routed[3] == "amount_positive"
    assert routed[4] == "flag_enum"
    assert routed[5] == "amount_range"


def test_route_then_clean_split_counts(df):
    routed = route_violations(df, _rules())
    clean = routed.filter(F.col("quarantine_rule").isNull()).count()
    dirty = routed.filter(F.col("quarantine_rule").isNotNull()).count()
    assert (clean, dirty) == (1, 4)
