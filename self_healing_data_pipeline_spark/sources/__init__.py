from self_healing_data_pipeline_spark.sources.readers import (
    read_csv,
    read_json,
    read_parquet,
    read_table,
    UnsupportedFormatError,
    read_any,
)
from self_healing_data_pipeline_spark.sources.tables import FIXTURE_TABLES, load_tables

__all__ = [
    "read_csv",
    "read_json",
    "read_parquet",
    "read_table",
    "read_any",
    "UnsupportedFormatError",
    "FIXTURE_TABLES",
    "load_tables",
]
