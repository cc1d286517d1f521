"""Round-6 batch 26 (SURVEY.md §2.1 storage layout / §2.4): the
STORAGE-LAYOUT PLANNER pair every lakehouse maintenance service runs —
(a) compaction bin-packing (which small files coalesce into which
target-sized output file) and (b) zone-map data skipping (how many
files a predicate can prune from min/max footer stats, and the
false-positive rows the survivors still scan). Both are pure
declarative plans over a logical file model, so the planner itself
runs distributed — no driver-side file listing loop.

The logical file model: lineitem rows shard into "files" keyed by
(ship month, l_orderkey % 8) with file bytes = Σ(100 + 4*round(qty)) per row
— the shape a date-partitioned ingest with hash-bucketed writers
produces. The reference delegates storage maintenance to its embedded
store (automated-data-catalog-&-etl/services/pgliteService.ts:36-49);
here both planner halves are Spark plans with DuckDB oracle twins.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# Compaction target size (bytes). Small enough that sf0.01's ~13 KB
# logical files pack several bins per month; the real knob would be
# 128-1024 MB — the plan shape is size-independent.
_TARGET = 32_768

_FILE_MODEL = """
    SELECT STRFTIME(l_shipdate, '%Y-%m') AS ship_month,
           CAST(l_orderkey % 8 AS BIGINT) AS file_id,
           CAST(SUM(100 + CAST(ROUND(l_quantity) AS BIGINT) * 4) AS BIGINT) AS file_bytes,
           CAST(COUNT(*) AS BIGINT) AS file_rows,
           MIN(l_extendedprice) AS zmin,
           MAX(l_extendedprice) AS zmax
    FROM lineitem
    GROUP BY 1, 2
"""


@query(
    "q_compaction_bins",
    oracle=f"""
    WITH files AS ({_FILE_MODEL}),
    packed AS (
      SELECT ship_month, file_id, file_bytes, file_rows,
             CAST(FLOOR(
               (SUM(file_bytes) OVER (PARTITION BY ship_month
                                      ORDER BY file_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW)
                - file_bytes) / {_TARGET}.0) AS BIGINT) AS bin
      FROM files
    )
    SELECT ship_month, bin,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(file_bytes) AS BIGINT) AS bin_bytes,
           CAST(SUM(file_rows) AS BIGINT) AS bin_rows,
           CAST(MIN(file_id) AS BIGINT) AS first_file,
           CAST(MAX(file_id) AS BIGINT) AS last_file
    FROM packed
    GROUP BY ship_month, bin
    ORDER BY ship_month, bin
    """,
)
def q_compaction_bins(spark, sf_dir):
    """COMPACTION PLAN (OPTIMIZE bin-packing): coalesce each ship
    month's small files into ~32 KB output bins by boundary-split on
    the cumulative-bytes axis — file f lands in bin
    floor(cum_bytes_before_f / target), the same split rule Spark's
    own file coalescer (maxPartitionBytes packing) and Delta OPTIMIZE
    apply to a sorted file list.

    Scale shape: file stats are one partial-aggregated groupBy at
    (month, file) grain; the running-bytes window partitions by month
    (files-per-partition is bounded — ~10^3-10^4 in a real layout), so
    the planner parallelizes across partitions and never touches a
    SinglePartition sort or a driver-side file loop."""
    li = read_table(spark, sf_dir, "lineitem")
    files = li.groupBy(
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
        (F.col("l_orderkey") % 8).cast("bigint").alias("file_id"),
    ).agg(
        F.sum(F.lit(100) + F.round("l_quantity").cast("bigint") * 4)
        .cast("bigint")
        .alias("file_bytes"),
        F.count(F.lit(1)).cast("bigint").alias("file_rows"),
    )
    w = (
        Window.partitionBy("ship_month")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = files.withColumn(
        "bin",
        F.floor(
            (F.sum("file_bytes").over(w) - F.col("file_bytes")) / _TARGET
        ).cast("bigint"),
    )
    return (
        packed.groupBy("ship_month", "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("file_bytes").cast("bigint").alias("bin_bytes"),
            F.sum("file_rows").cast("bigint").alias("bin_rows"),
            F.min("file_id").cast("bigint").alias("first_file"),
            F.max("file_id").cast("bigint").alias("last_file"),
        )
        .orderBy("ship_month", "bin")
    )


@query(
    "q_zone_map_prune",
    oracle=f"""
    WITH files AS ({_FILE_MODEL}),
    verdicts AS (
      SELECT ship_month, file_id, file_rows,
             (zmax >= 20000 AND zmin <= 30000) AS scanned
      FROM files
    ),
    matched AS (
      SELECT STRFTIME(l_shipdate, '%Y-%m') AS ship_month,
             CAST(COUNT(*) AS BIGINT) AS rows_matched
      FROM lineitem
      WHERE l_extendedprice BETWEEN 20000 AND 30000
      GROUP BY 1
    )
    SELECT v.ship_month,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(CASE WHEN v.scanned THEN 0 ELSE 1 END) AS BIGINT)
             AS files_pruned,
           CAST(SUM(v.file_rows) AS BIGINT) AS rows_total,
           CAST(SUM(CASE WHEN v.scanned THEN v.file_rows ELSE 0 END)
             AS BIGINT) AS rows_scanned,
           CAST(COALESCE(MAX(m.rows_matched), 0) AS BIGINT) AS rows_matched,
           CAST(SUM(CASE WHEN v.scanned THEN v.file_rows ELSE 0 END)
             - COALESCE(MAX(m.rows_matched), 0) AS BIGINT)
             AS false_positive_rows
    FROM verdicts v LEFT JOIN matched m ON v.ship_month = m.ship_month
    GROUP BY v.ship_month
    ORDER BY v.ship_month
    """,
)
def q_zone_map_prune(spark, sf_dir):
    """ZONE-MAP SKIPPING AUDIT: from per-file min/max footer stats
    (the zone maps parquet row groups and Delta file stats carry),
    decide which files the predicate `l_extendedprice BETWEEN 20000
    AND 30000` can prune outright (zone disjoint from the range), and
    for the files that must be scanned, how many of their rows are
    false positives — the number data skipping cannot save and only
    row-level filtering removes. This is the audit that tells a
    layout service whether re-clustering (Z-order) on a column would
    pay off: high false-positive ratio = poor clustering on that key.

    Scale shape: zone maps are the same (month, file)-grain partial
    aggregate; the verdict is a per-file expression; the matched-row
    recount pushes the BETWEEN into the parquet scan. One broadcast-
    size LEFT JOIN at month grain. No SinglePartition anywhere."""
    li = read_table(spark, sf_dir, "lineitem")
    files = li.groupBy(
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
        (F.col("l_orderkey") % 8).cast("bigint").alias("file_id"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("file_rows"),
        F.min("l_extendedprice").alias("zmin"),
        F.max("l_extendedprice").alias("zmax"),
    )
    verdicts = files.withColumn(
        "scanned", (F.col("zmax") >= 20000) & (F.col("zmin") <= 30000)
    )
    matched = (
        li.filter(F.col("l_extendedprice").between(20000, 30000))
        .groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("rows_matched"))
    )
    return (
        verdicts.groupBy("ship_month")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum(F.when(F.col("scanned"), 0).otherwise(1))
            .cast("bigint")
            .alias("files_pruned"),
            F.sum("file_rows").cast("bigint").alias("rows_total"),
            F.sum(F.when(F.col("scanned"), F.col("file_rows")).otherwise(0))
            .cast("bigint")
            .alias("rows_scanned"),
        )
        .join(F.broadcast(matched), "ship_month", "left")
        .select(
            "ship_month",
            "n_files",
            "files_pruned",
            "rows_total",
            "rows_scanned",
            F.coalesce(F.col("rows_matched"), F.lit(0))
            .cast("bigint")
            .alias("rows_matched"),
            (
                F.col("rows_scanned")
                - F.coalesce(F.col("rows_matched"), F.lit(0))
            )
            .cast("bigint")
            .alias("false_positive_rows"),
        )
        .orderBy("ship_month")
    )
