"""Arbitrary-SQL execution — the reference's single query choke point.

Every reference query flows through ``executeSql(sql)`` →
``dbInstance.query(sql)`` (``automated-data-catalog-&-etl/services/
pgliteService.ts:36-49``); the engine twin registers the datasets as views
and hands the string to Spark SQL, so Catalyst plans it like any
DataFrame query (same optimizer, same physical operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from self_healing_data_pipeline_spark.sources.readers import read_table
from self_healing_data_pipeline_spark.sources.tables import FIXTURE_TABLES


def register_fixture_views(
    spark: SparkSession, sf_dir: str, tables=FIXTURE_TABLES
) -> None:
    for t in tables:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)


def execute_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Run one SQL statement (views must already be registered)."""
    return spark.sql(sql)
