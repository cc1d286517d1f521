"""Fixture-table helpers (the TPC-H-ish star schema in /root/testdata)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = FIXTURE_TABLES
) -> dict[str, DataFrame]:
    # Through read_table, not raw spark.read.parquet: events.parquet has
    # nanosecond timestamps that need the converting reader.
    from self_healing_data_pipeline_spark.sources.readers import read_table

    return {name: read_table(spark, sf_dir, name) for name in names}
