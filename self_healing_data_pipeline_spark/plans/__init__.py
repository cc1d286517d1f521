from self_healing_data_pipeline_spark.plans.catalog import (
    ColumnAnalysis,
    TableSchema,
    schema_to_struct,
    struct_to_ddl,
)
from self_healing_data_pipeline_spark.plans.profiler import profile_dataframe

__all__ = [
    "ColumnAnalysis",
    "TableSchema",
    "schema_to_struct",
    "struct_to_ddl",
    "profile_dataframe",
]
