"""Z-order layout (sources.writers.zorder_write): footer-verified
multi-column file skipping — the property the layout exists for."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from self_healing_data_pipeline_spark.sources.writers import zorder_write


def _file_ranges(path: str, col: str) -> list[tuple[float, float]]:
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        mns, mxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    mns.append(c.statistics.min)
                    mxs.append(c.statistics.max)
        if mns:
            out.append((min(mns), max(mxs)))
    return out


def test_zorder_tightens_ranges_on_both_columns(spark, tmp_path):
    # two independent uniform columns: a plain sort by x leaves y's
    # per-file range global; z-order must tighten BOTH
    n = 40_000
    df = spark.range(n).selectExpr(
        "CAST(pmod(hash(id), 1000) AS DOUBLE) AS x",
        "CAST(pmod(hash(id + 7777), 1000) AS DOUBLE) AS y",
    )
    sorted_path = str(tmp_path / "sorted_x")
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(sorted_path)
    )
    z_path = str(tmp_path / "zorder")
    zorder_write(df, z_path, ["x", "y"], n_files=16)

    def avg_width(path, col):
        rs = _file_ranges(path, col)
        assert rs
        return sum(mx - mn for mn, mx in rs) / len(rs)

    global_span = 999.0
    # sort by x: x tight, y near-global
    assert avg_width(sorted_path, "x") < 0.2 * global_span
    assert avg_width(sorted_path, "y") > 0.8 * global_span
    # z-order: BOTH columns well below global span -> point/range filters
    # on either column skip most files
    assert avg_width(z_path, "x") < 0.5 * global_span
    assert avg_width(z_path, "y") < 0.5 * global_span
    # and the data survives the layout unchanged
    back = spark.read.parquet(z_path)
    assert back.count() == n


def test_zorder_plan_has_no_single_partition_stage(spark, tmp_path):
    import io
    from contextlib import redirect_stdout

    df = spark.range(1000).selectExpr(
        "CAST(id AS DOUBLE) AS x", "CAST(pmod(id * 37, 1000) AS DOUBLE) AS y"
    )
    # build the exact plan zorder_write executes, minus the write
    from pyspark.sql import functions as F

    stats = df.agg(
        F.min("x"), F.max("x"), F.min("y"), F.max("y")
    )  # the one driver round-trip: a 1-row aggregate
    assert stats.count() == 1
    zorder_write(df, str(tmp_path / "z"), ["x", "y"], n_files=4)
    back = spark.read.parquet(str(tmp_path / "z"))
    plan_df = back.filter(F.col("y") < 10.0)
    buf = io.StringIO()
    with redirect_stdout(buf):
        plan_df.explain("formatted")
    # pruning-relevant pushdown reaches the scan
    assert "PushedFilters" in buf.getvalue()


def test_zorder_survives_null_and_constant_columns(spark, tmp_path):
    df = spark.createDataFrame(
        [(float(i), None, 5.0) for i in range(100)],
        "x double, all_null double, const double",
    )
    out = str(tmp_path / "z")
    zorder_write(df, out, ["x", "all_null", "const"], n_files=4)
    assert spark.read.parquet(out).count() == 100


def test_compact_parquet_dir_flat_and_partitioned(spark, tmp_path):
    """Small-file compaction: a 40-file directory collapses toward the
    target size, data survives byte-identically, and a hive-partitioned
    layout keeps its pruning directories (compacted per leaf)."""
    import os

    from pyspark.sql import functions as F

    from self_healing_data_pipeline_spark.sources.writers import (
        compact_parquet_dir,
    )

    flat = str(tmp_path / "flat")
    df = spark.range(10_000).select(
        "id", (F.col("id") % 7).alias("v"), F.concat(F.lit("r"), "id").alias("s")
    )
    df.repartition(40).write.parquet(flat)
    n_before = sum(1 for f in os.listdir(flat) if f.endswith(".parquet"))
    assert n_before == 40
    stats = compact_parquet_dir(spark, flat, target_mb=128, sort_within=["id"])
    n_after = sum(1 for f in os.listdir(flat) if f.endswith(".parquet"))
    assert stats["files_before"] == 40 and stats["files_after"] == n_after
    assert n_after < n_before
    back = spark.read.parquet(flat)
    assert back.count() == 10_000
    assert back.agg(F.sum("id")).collect()[0][0] == 10_000 * 9_999 // 2

    part = str(tmp_path / "part")
    df.withColumn("p", (F.col("id") % 2).cast("int")).repartition(
        20
    ).write.partitionBy("p").parquet(part)
    stats = compact_parquet_dir(spark, part, target_mb=128)
    assert stats["leaves"] == 2
    assert stats["files_after"] < stats["files_before"]
    back = spark.read.parquet(part)
    assert back.count() == 10_000
    # partition layout intact: pruning filter still reaches the scan
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        back.filter(F.col("p") == 1).explain("formatted")
    assert "PartitionFilters: [isnotnull(p" in buf.getvalue()
    # idempotent: a second compaction is a no-op (already at target)
    again = compact_parquet_dir(spark, part, target_mb=128)
    assert again["files_after"] == again["files_before"]


def test_compact_orphans_invisible_and_stale_backup_cleared(spark, tmp_path):
    """Advice r5: in a hive layout the old '<leaf>.compact_tmp' sibling
    names contained '=', so a crash-orphaned staging/backup dir was
    parsed as a partition directory and double-read. Staging/backup now
    carry a leading '.' (Spark's file index excludes dot-prefixed paths
    unconditionally — an underscore prefix would NOT suffice, since
    '_'-names containing '=' are kept as partition dirs), and a stale
    backup from a prior crash is cleared before the swap instead of
    making os.rename fail with ENOTEMPTY."""
    import os

    from pyspark.sql import functions as F

    from self_healing_data_pipeline_spark.sources.writers import (
        compact_parquet_dir,
    )

    part = str(tmp_path / "part")
    df = spark.range(4_000).select(
        "id", F.concat(F.lit("r"), "id").alias("s"),
        (F.col("id") % 2).cast("int").alias("p"),
    )
    df.repartition(20).write.partitionBy("p").parquet(part)

    # simulate a prior crash: a stale backup (with data!) AND a stale
    # staging dir already exist beside leaf p=1
    leaf = os.path.join(part, "p=1")
    for stale in (".p=1.compact_bak", ".p=1.compact_tmp"):
        spark.read.parquet(leaf).limit(5).write.parquet(
            os.path.join(part, stale)
        )
    # orphaned underscore-dirs are invisible to the reader (no
    # double-read), unlike the old '='-bearing sibling names
    assert spark.read.parquet(part).count() == 4_000

    stats = compact_parquet_dir(spark, part, target_mb=128)
    assert stats["leaves"] == 2  # stale dirs not treated as leaves
    back = spark.read.parquet(part)
    assert back.count() == 4_000
    assert back.agg(F.sum("id")).collect()[0][0] == 4_000 * 3_999 // 2
    # swap completed: no staging/backup residue remains
    residue = [d for d in os.listdir(part) if "compact" in d]
    assert residue == []
