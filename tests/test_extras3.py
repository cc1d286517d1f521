"""Golden-output and plan-shape tests for the extras3 analytic surface
(grouping sets, exact correlation, funnel/retention, gap-fill, fuzzy
match, decorrelated subquery, multimodal feature query)."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import QUERIES, load_all

load_all()


def ts(s):
    return dt.datetime.fromisoformat(s)


def test_grouping_sets_plan_uses_expand_and_covers_all_sets(spark, sf_dir):
    df = QUERIES["q_agg_grouping_sets"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan
    rows = df.collect()
    # one grand-total row, one row per status, one per (status, priority)
    grand = [r for r in rows if r["g_status"] == 1 and r["g_priority"] == 1]
    assert len(grand) == 1
    per_status = [r for r in rows if r["g_status"] == 0 and r["g_priority"] == 1]
    assert len(per_status) >= 1
    assert grand[0]["n_orders"] == sum(r["n_orders"] for r in per_status)


def test_exact_corr_matches_builtin_within_tolerance(spark, sf_dir):
    got = {
        r["l_returnflag"]: r
        for r in QUERIES["q_agg_corr"](spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ref = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.corr("l_quantity", "l_extendedprice").alias("c"),
            F.covar_samp("l_quantity", "l_extendedprice").alias("cv"),
        )
        .collect()
    }
    for flag, row in got.items():
        assert math.isclose(row["corr_qty_price"], ref[flag]["c"], rel_tol=1e-9)
        assert math.isclose(
            row["covar_samp_qty_price"], ref[flag]["cv"], rel_tol=1e-9
        )


def test_funnel_counts_on_tiny_data(spark, tmp_path):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6],
            "ts": pd.to_datetime(
                [
                    # u1: full ordered funnel
                    "2024-01-01 10:00:00",
                    "2024-01-01 10:05:00",
                    "2024-01-01 10:10:00",
                    # u2: click BEFORE view → not counted past step 1
                    "2024-01-01 09:00:00",
                    "2024-01-01 09:30:00",
                    # u3: view only
                    "2024-01-01 11:00:00",
                ]
            ),
            "user_id": [1, 1, 1, 2, 2, 3],
            "event_type": ["view", "click", "purchase", "click", "view", "view"],
            "value": [0.0] * 6,
            "props": ["{}"] * 6,
        }
    )
    # single-file parquet, same layout as the driver fixtures
    pdf.to_parquet(str(tmp_path / "events.parquet"))
    r = QUERIES["q_events_funnel"](spark, str(tmp_path)).collect()[0]
    assert r["n_view"] == 3
    assert r["n_view_then_click"] == 1
    assert r["n_full_funnel"] == 1


def test_retention_week_zero_has_every_user(spark, sf_dir):
    rows = QUERIES["q_events_retention"](spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    week0 = sum(r["n_active_users"] for r in rows if r["week_offset"] == 0)
    assert week0 == n_users  # every user is active in their cohort week
    assert all(r["week_offset"] >= 0 for r in rows)


def test_date_series_is_contiguous_and_count_preserving(spark, sf_dir):
    rows = QUERIES["q_date_series"](spark, sf_dir).orderBy("day").collect()
    days = [dt.date.fromisoformat(r["day"]) for r in rows]
    assert all(
        (b - a).days == 1 for a, b in zip(days, days[1:])
    ), "gap-filled calendar must be contiguous"
    total = sum(r["n_orders"] for r in rows)
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert total == n_orders


def test_fuzzy_match_blocks_by_lang_and_orders_pairs(spark, sf_dir):
    df = QUERIES["q_fuzzy_match"](spark, sf_dir)
    rows = df.collect()
    assert all(r["doc_a"] < r["doc_b"] for r in rows)
    assert all(r["edit_distance"] <= 4 for r in rows)
    assert rows, "fixture plants near-dup prefixes — result must be non-empty"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    langs = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", "lang").collect()}
    assert all(langs[r["doc_a"]] == langs[r["doc_b"]] for r in rows)


def test_correlated_subquery_decorrelates_to_single_shuffle(spark, sf_dir):
    df = QUERIES["q_subquery_correlated"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # decorrelated → window aggregate, no nested-loop per-row subquery
    assert "Window" in plan
    rows = df.collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    means = {
        r["o_custkey"]: r["m"]
        for r in orders.groupBy("o_custkey")
        .agg(F.avg("o_totalprice").alias("m"))
        .collect()
    }
    for r in rows[:50]:
        assert r["o_totalprice"] > 1.5 * means[r["o_custkey"]] * (1 - 1e-9)


def test_multimodal_feature_query_schema_and_entropy_bounds(spark, sf_dir):
    # round-11 promoted output: law-derivable exact columns + boolean
    # range witnesses for the byte-level quantities that are not SQL
    # (raw n_bytes / byte_entropy / feature_norm values fold into the
    # *_ok booleans the oracle pins TRUE)
    df = QUERIES["q_multimodal_features"](spark, sf_dir)
    assert [f.name for f in df.schema.fields] == [
        "media_id",
        "format",
        "width",
        "height",
        "pixel_mean_lossless",
        "dims_ok",
        "pixels_ok",
        "entropy_ok",
        "bytes_ok",
        "feature_norm_ok",
    ]
    rows = df.collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == docs
    fmts = ["png", "gif", "jpeg", "bmp"]
    for r in rows:
        # header round-trip: parsed dims equal the embedded dims, and the
        # format tracks the doc_id%4 synthesis rule (png/gif/jpeg/bmp)
        assert r["dims_ok"] is True
        assert r["format"] == fmts[r["media_id"] % 4]
        # REAL pixel decode on every row, all four formats
        assert r["pixels_ok"] is True
        if r["format"] == "jpeg":
            assert r["pixel_mean_lossless"] is None  # DCT-lossy: NULL side
        else:
            assert 0.0 <= r["pixel_mean_lossless"] <= 255.0
        assert r["entropy_ok"] is True  # byte_entropy in (0, 8]
        assert r["bytes_ok"] is True  # payload larger than any header
        assert r["feature_norm_ok"] is True  # fake-feature norm > 0
