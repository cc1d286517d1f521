"""Table sinks (SURVEY.md §2.1): bulk partitioned writes replacing the
reference's row-at-a-time transactional insert loop
(``automated-data-catalog-&-etl/services/pgliteService.ts:51-78``).

Atomicity: Spark writes to a staging directory and commits by rename
(FileOutputCommitter) — the bulk twin of the reference's all-or-nothing
transaction. ``errorifexists`` mode mirrors its fresh-table-per-run rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "errorifexists",
    partition_by: list[str] | None = None,
    target_partitions: int | None = None,
) -> None:
    """Parquet sink. ``partition_by`` gives directory partition pruning for
    downstream scans; ``target_partitions`` controls file count/size (at
    100 TB, aim for 128–512 MB files — thousands of tiny files break the
    driver's file-listing, one giant file breaks parallelism)."""
    out = df
    if target_partitions is not None:
        if partition_by:
            out = df.repartition(target_partitions, *partition_by)
        else:
            out = df.repartition(target_partitions)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "errorifexists",
    path: str | None = None,
) -> str:
    """Bucketed managed table: rows are hash-distributed into ``n_buckets``
    files per partition by ``bucket_cols`` at WRITE time.

    This is the shuffle-elimination primitive for repeated big joins /
    aggregations on the same key: two tables bucketed by the join key with
    equal bucket counts sort-merge-join with NO Exchange on either side —
    at 100 TB that deletes the single most expensive stage of the job.
    ``sort_cols`` additionally pre-sorts within buckets, removing the Sort
    as well. The trade: one up-front shuffle at ingest, amortized over
    every downstream join.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        # external table: data lives at `path`, catalog entry carries the
        # bucket spec (the warehouse dir is a static config, so tests and
        # scratch runs pass an explicit location instead)
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(name)
    return name


def register_table(
    spark: SparkSession, df: DataFrame, name: str, replace: bool = True
) -> str:
    """Catalog sink: register a (temp) table for SQL access — the engine
    twin of the reference's CREATE TABLE + load step."""
    if replace:
        df.createOrReplaceTempView(name)
    else:
        df.createTempView(name)  # raises if it exists (errorifexists)
    return name


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Z-order (Morton-curve) layout: cluster rows so EVERY listed column
    has tight per-file min/max ranges — the Delta/Iceberg
    ``OPTIMIZE ZORDER BY`` equivalent for plain parquet.

    Why it matters at 100 TB: parquet scans skip files/row-groups whose
    footer min/max exclude the filter value, but a sort by (a, b) only
    prunes on ``a`` — ``b``'s ranges stay near-global in every file. Bit
    interleaving the columns' rank-space positions gives a single sort
    key whose locality is shared across ALL listed columns, so filters on
    any of them (and conjunctions) skip most files. The footer-verified
    win is asserted in ``tests/test_layout.py``.

    Mechanics — everything JVM-side, one stats pass + one range shuffle
    (a percent_rank formulation was rejected: a global rank window is a
    SinglePartition stage, the exact bottleneck this repo's CI bans):

    1. one tiny min/max aggregate per column (driver literals);
    2. per column, a uniform bucket in [0, 2^bits) over [min, max] —
       under heavy skew buckets crowd, but file-level min/max pruning
       only needs monotone locality, not balance;
    3. interleave the bucket bits into a Morton key (closed-form bit ops
       inside codegen, no UDF);
    4. ``repartitionByRange(n_files, z)`` + per-partition sort, then one
       parquet file per range partition.
    """
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(c).alias(f"mn_{c}") for c in cols],
        *[F.max(c).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    z = F.lit(0).cast("bigint")
    buckets = []
    for c in cols:
        # all-NULL column: no range to cluster on — constant bucket 0
        # (NULL rows elsewhere get a NULL bucket and sort together)
        if stats[f"mn_{c}"] is None:
            buckets.append(F.lit(0).cast("bigint"))
            continue
        mn = float(stats[f"mn_{c}"])
        mx = float(stats[f"mx_{c}"])
        span = (mx - mn) or 1.0
        frac = (F.col(c).cast("double") - F.lit(mn)) / F.lit(span)
        buckets.append(
            F.least(
                (frac * (1 << bits)).cast("bigint"), F.lit((1 << bits) - 1)
            )
        )
    # interleave: output bit (i*len(cols)+j) = bucket_j's bit i
    for i in range(bits):
        for j, b in enumerate(buckets):
            # Column & / | are LOGICAL operators in PySpark — bit math
            # needs the explicit bitwise methods
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, i).bitwiseAND(F.lit(1).cast("bigint")),
                    i * len(cols) + j,
                )
            )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
    sort_within: list[str] | None = None,
) -> dict[str, int]:
    """Small-file compaction (the plain-parquet twin of Delta/Iceberg
    ``OPTIMIZE`` / ``rewrite_data_files``): rewrite a parquet directory
    so files approach ``target_mb`` each. Streaming sinks and frequent
    small batches leave thousands of tiny files; at 100 TB that breaks
    driver file-listing, floods the scheduler with sub-second tasks,
    and destroys scan throughput — compaction is the maintenance job
    every ingestion pipeline schedules.

    Hive-partitioned layouts compact each leaf partition directory
    independently (pruning layout preserved); ``sort_within`` re-sorts
    rows inside the rewritten files to restore clustering for min/max
    file skipping. The rewrite is crash-safe: the new files land in a
    sibling staging directory and swap in via two directory renames —
    a crash before the swap leaves the original intact, a crash between
    the renames leaves the backup recoverable by hand. Staging and
    backup basenames start with ``.`` (``.<leaf>.compact_tmp`` /
    ``.<leaf>.compact_bak``): Spark's file index excludes dot-prefixed
    paths UNCONDITIONALLY, so a crash-orphaned directory in a hive
    layout is never parsed as a partition directory. (An underscore
    prefix would NOT work here: ``shouldFilterOutPathName`` keeps
    ``_``-prefixed names that contain ``=`` — partition dirs — so
    ``_p=1.compact_bak`` would still be scanned and double-read, and a
    bare ``<leaf>.tmp`` sibling likewise.)
    A stale backup from a prior crash is cleared before the swap, so
    the rename can never fail with ENOTEMPTY.

    Driver cost is one directory walk (bounded by file count — the
    thing being reduced); data cost is one read + one write of the
    directory, embarrassingly parallel. Returns before/after stats."""
    import math
    import os
    import shutil

    def leaf_dirs(root: str) -> list[str]:
        leaves = []
        for cur, dirs, files in os.walk(root):
            # never descend into hidden/temporary dirs (our own
            # staging/backup residue, _spark_metadata, ...) — they are
            # invisible to Spark's file index and must not be compacted
            dirs[:] = [d for d in dirs if not d.startswith((".", "_"))]
            datadirs = [d for d in dirs if "=" in d]
            if any(f.endswith(".parquet") for f in files) and not datadirs:
                leaves.append(cur)
        return leaves or [root]

    stats = {"files_before": 0, "files_after": 0, "bytes": 0, "leaves": 0}
    for leaf in leaf_dirs(path):
        files = [
            os.path.join(leaf, f)
            for f in os.listdir(leaf)
            if f.endswith(".parquet")
        ]
        if not files:
            continue
        nbytes = sum(os.path.getsize(f) for f in files)
        n_target = max(1, math.ceil(nbytes / (target_mb * 1024 * 1024)))
        stats["leaves"] += 1
        stats["files_before"] += len(files)
        stats["bytes"] += nbytes
        if len(files) <= n_target:
            stats["files_after"] += len(files)
            continue
        df = spark.read.parquet(leaf)
        out = df.repartition(n_target)
        if sort_within:
            out = out.sortWithinPartitions(*sort_within)
        parent, base = os.path.dirname(leaf) or ".", os.path.basename(leaf)
        staging = os.path.join(parent, f".{base}.compact_tmp")
        backup = os.path.join(parent, f".{base}.compact_bak")
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(backup, ignore_errors=True)
        out.write.mode("overwrite").parquet(staging)
        os.rename(leaf, backup)
        os.rename(staging, leaf)
        shutil.rmtree(backup)
        stats["files_after"] += sum(
            1 for f in os.listdir(leaf) if f.endswith(".parquet")
        )
    return stats
