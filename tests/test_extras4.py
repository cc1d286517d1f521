"""Plan-shape and equivalence tests for the skew/histogram/ngram queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import QUERIES, load_all

load_all()


def test_salted_agg_matches_plain_groupby(spark, sf_dir):
    got = {
        (r["l_returnflag"], r["l_linestatus"]): r["n_rows"]
        for r in QUERIES["q_skew_salted_agg"](spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ref = {
        (r["l_returnflag"], r["l_linestatus"]): r["n"]
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == ref


def test_salted_agg_plan_has_two_aggregation_phases(spark, sf_dir):
    df = QUERIES["q_skew_salted_agg"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # partial per (key, salt), final per key → two HashAggregate pairs
    assert plan.count("HashAggregate") >= 4


def test_salted_join_emits_no_salt_column_and_no_row_loss(spark, sf_dir):
    df = QUERIES["q_skew_salted_join"](spark, sf_dir)
    assert "__salt" not in df.columns
    total = df.agg(F.sum("n_items")).collect()[0][0]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert total == li  # every lineitem row joined exactly once


def test_histogram_bins_cover_all_rows(spark, sf_dir):
    rows = QUERIES["q_profile_histogram"](spark, sf_dir).collect()
    assert all(0 <= r["bin"] <= 9 for r in rows)
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r["n_rows"] for r in rows) == n_orders


def test_ngrams_plan_is_udf_free_and_ordered(spark, sf_dir):
    df = QUERIES["q_text_ngrams"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    rows = df.collect()
    assert len(rows) == 20
    counts = [r["n"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(" " in r["bigram"] for r in rows)


def test_connected_components_on_known_graph(spark):
    from self_healing_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    # chain 1-2-3 (transitivity: 1~2, 2~3 but not 1~3), pair 10-11,
    # triangle 20-21-22
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_l long, id_r long",
    )
    want = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    # driver union-find fast path (default threshold)
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(edges).collect()
    }
    assert got == want
    # distributed pointer-jumping path (threshold forced to 0)
    got_dist = {
        r["node"]: r["cluster_id"]
        for r in connected_components(edges, driver_threshold=0).collect()
    }
    assert got_dist == want


def test_connected_components_long_chain_distributed(spark):
    from self_healing_data_pipeline_spark.operators.dedup import (
        connected_components,
    )

    # a 33-node chain has diameter 32: min-propagation alone needs 32
    # rounds; pointer jumping must converge well inside max_iter=10
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(32)], "id_l long, id_r long"
    )
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(
            edges, driver_threshold=0, max_iter=10
        ).collect()
    }
    assert got == {i: 0 for i in range(33)}
