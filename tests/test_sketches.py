"""KMV/theta sketch containment (operators.sketches) — the 100 TB path
for join discovery: estimator accuracy on partial overlaps, exactness on
true subsets, and bounded sketch size."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.operators.sketches import (
    column_profiles,
    kmv_sketches,
    sketch_containment,
)

CANDIDATES = [("child", "c_key"), ("parent", "p_key")]


@pytest.fixture(scope="module")
def sketch_dir(spark, tmp_path_factory):
    """child.c_key = 0..9999; parent.p_key = 0..6999 ∪ 20000..22999
    (true containment of child in parent = 0.7, parent in child = 7/10)."""
    d = tmp_path_factory.mktemp("sketchdata")
    spark.range(10_000).select(F.col("id").alias("c_key")).write.parquet(
        str(d / "child.parquet")
    )
    spark.range(7_000).select(F.col("id").alias("p_key")).union(
        spark.range(20_000, 23_000).select(F.col("id").alias("p_key"))
    ).write.parquet(str(d / "parent.parquet"))
    return str(d)


def test_kmv_sketch_is_bounded_and_sorted_bottom_k(spark, sketch_dir):
    profiles = column_profiles(spark, sketch_dir, CANDIDATES)
    sk = kmv_sketches(spark, sketch_dir, CANDIDATES, profiles, k=256)
    sizes = {
        (r["tbl"], r["col"]): r["n"]
        for r in sk.groupBy("tbl", "col").agg(F.count("*").alias("n")).collect()
    }
    assert sizes[("child", "c_key")] == 256
    assert sizes[("parent", "p_key")] == 256
    # the sketch holds the k SMALLEST distinct hashes: its max must be
    # below the minimum of the excluded hashes — verify against a brute
    # exhaustive hash of the child column
    all_h = sorted(
        r["h"]
        for r in spark.read.parquet(f"{sketch_dir}/child.parquet")
        .select(F.xxhash64(F.col("c_key").cast("bigint")).alias("h"))
        .distinct()
        .collect()
    )
    got = sorted(
        r["h"] for r in sk.filter("tbl = 'child'").select("h").collect()
    )
    assert got == all_h[:256]


def test_containment_estimate_partial_overlap(spark, sketch_dir):
    profiles = column_profiles(spark, sketch_dir, CANDIDATES)
    sk = kmv_sketches(spark, sketch_dir, CANDIDATES, profiles, k=512)
    est = {
        (r["child_table"], r["parent_table"]): r["containment_est"]
        for r in sketch_containment(sk).collect()
    }
    # true containment(child ⊆ parent) = 7000/10000 = 0.70
    assert abs(est[("child", "parent")] - 0.70) < 0.08
    # true containment(parent ⊆ child) = 7000/10000 = 0.70
    assert abs(est[("parent", "child")] - 0.70) < 0.08


def test_containment_exact_one_for_true_subset(spark, tmp_path):
    """A ⊆ B ⇒ every sketch hash of A below the common θ is in B's
    sketch: the estimate is EXACTLY 1.0, no sampling error — why the
    0.95 threshold cannot false-negative a real FK edge."""
    d = tmp_path
    spark.range(0, 30_000, 3).select(F.col("id").alias("c_key")).write.parquet(
        str(d / "child.parquet")
    )
    spark.range(30_000).select(F.col("id").alias("p_key")).write.parquet(
        str(d / "parent.parquet")
    )
    profiles = column_profiles(spark, str(d), CANDIDATES)
    sk = kmv_sketches(spark, str(d), CANDIDATES, profiles, k=256)
    row = (
        sketch_containment(sk)
        .filter("child_table = 'child'")
        .collect()[0]
    )
    assert row["containment_est"] == 1.0


def test_small_column_degrades_to_exact(spark, tmp_path):
    """Columns with fewer distinct values than k keep EVERY hash (p
    saturates at 1): tiny dimension keys get exact containment."""
    d = tmp_path
    spark.range(25).select(F.col("id").alias("c_key")).write.parquet(
        str(d / "child.parquet")
    )
    spark.range(20).select(F.col("id").alias("p_key")).write.parquet(
        str(d / "parent.parquet")
    )
    profiles = column_profiles(spark, str(d), CANDIDATES)
    sk = kmv_sketches(spark, str(d), CANDIDATES, profiles, k=256)
    assert sk.count() == 45  # exhaustive on both sides
    est = {
        (r["child_table"], r["parent_table"]): r["containment_est"]
        for r in sketch_containment(sk).collect()
    }
    assert est[("child", "parent")] == 0.8  # 20/25 exactly
    assert est[("parent", "child")] == 1.0
