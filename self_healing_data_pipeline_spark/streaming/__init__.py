from self_healing_data_pipeline_spark.streaming.windows import (
    streaming_tumbling_counts,
    streaming_sliding_counts,
    streaming_session_agg,
    streaming_dedup,
)
from self_healing_data_pipeline_spark.streaming.stateful import running_user_stats

__all__ = [
    "streaming_tumbling_counts",
    "streaming_sliding_counts",
    "streaming_session_agg",
    "streaming_dedup",
    "running_user_stats",
]
