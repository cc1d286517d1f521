from self_healing_data_pipeline_spark.operators.aggregates import (
    pricing_summary,
    exact_stats,
    null_profile,
)
from self_healing_data_pipeline_spark.operators.relational import (
    asof_join,
    range_join,
    top_k,
)
from self_healing_data_pipeline_spark.operators.windows import sessionize

__all__ = [
    "pricing_summary",
    "exact_stats",
    "null_profile",
    "asof_join",
    "range_join",
    "top_k",
    "sessionize",
]
