"""Aggregation operators: hash aggregates, profiling, exact statistics.

All group-bys here are single-shuffle hash aggregates with automatic
map-side partial aggregation (Catalyst plans partial_sum → shuffle on the
group keys → final_sum); at 100 TB the shuffle volume is |groups| per
partition, not |rows|. Monetary sums use exact decimal accumulation
(see ``functions.scalar``) so results are reproducible across runs,
partitionings, and engines.

The profiling aggregates are the deterministic replacement for the
reference's LLM data-profiling step (null counts / cardinality / outliers —
``automated-data-catalog-&-etl/services/geminiService.ts:50-99``, quality
categories at ``geminiService.ts:64``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.functions.scalar import davg, dec, dsum


def pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-02") -> DataFrame:
    """Flagship query — TPC-H-Q1-shaped pricing summary.

    scan → pushed-down filter → 2-key hash agg → sort. The filter and the
    4-column projection reach the parquet scan (check with
    ``.explain("formatted")``: PushedFilters + pruned ReadSchema), the
    aggregate is partial+final, and the final sort is on a handful of
    grouped rows — the plan a 1000-executor cluster wants.
    """
    disc = dec("l_extendedprice") * (F.lit(1).cast("decimal(12,2)") - dec("l_discount"))
    charge = disc * (F.lit(1).cast("decimal(12,2)") + dec("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def null_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column null/completeness profile → long-format DataFrame.

    One pass over the data (single aggregate, no shuffle of raw rows);
    the unpivot happens on the 1-row aggregate result.
    """
    cols = columns or df.columns
    agg = df.agg(
        F.count(F.lit(1)).alias("__total"),
        *[
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__nulls_{c}")
            for c in cols
        ],
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col(f"__nulls_{c}").alias("null_count"),
                F.col("__total").alias("total_count"),
            )
            for c in cols
        ]
    )
    return (
        agg.select(F.explode(pairs).alias("p"))
        .select("p.column_name", "p.null_count", "p.total_count")
        .orderBy("column_name")
    )


def exact_stats(df: DataFrame, col: str, group_by: list[str]) -> DataFrame:
    """Deterministic min/max/sum/stddev per group for a 2-decimal column.

    Stddev via exact decimal sum/sum-of-squares, combined in double:
    sqrt((n·Σx² − (Σx)²) / (n·(n−1))) — reproducible across engines and
    partition orders, unlike the built-in streaming-variance aggregate.
    """
    x = dec(col)
    n = F.count(F.lit(1)).cast("double")
    sx = F.sum(x).cast("double")
    sxx = F.sum(x * x).cast("double")
    return (
        df.groupBy(*group_by)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(col).alias("min_val"),
            F.max(col).alias("max_val"),
            F.sum(x).cast("double").alias("sum_val"),
            # max(0, ·) clamps the one-ulp negative variance a
            # near-constant group can produce (sqrt would give NaN)
            (
                F.greatest(n * sxx - sx * sx, F.lit(0.0))
                / (n * (n - F.lit(1.0)))
            ).alias("var_val"),
        )
        .withColumn("stddev_val", F.sqrt(F.col("var_val")))
        .drop("var_val")
        .orderBy(*group_by)
    )
