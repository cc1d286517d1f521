"""Driver-contract smoke tests: entry() returns rows on sf0.001; every
oracle key has a query; every query runs and returns a DataFrame."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_every_oracle_key_has_a_query():
    qs = entrymod.queries()
    missing = [k for k in entrymod.oracle_sql() if k not in qs]
    assert missing == []


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_runs_and_has_rows(spark, sf_dir, name):
    df = entrymod.queries()[name](spark, sf_dir)
    assert df.columns  # stable non-empty schema
    n = df.count()
    if name != "q_set_except":  # legitimately empty (every customer ordered)
        assert n > 0, f"{name} returned no rows"
