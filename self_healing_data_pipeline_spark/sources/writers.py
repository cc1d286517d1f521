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
