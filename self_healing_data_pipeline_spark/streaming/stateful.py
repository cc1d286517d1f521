"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.9/§2.10 — the extension point for operators Spark's built-in
streaming aggregates can't express).

``running_user_stats`` keeps per-key running (count, sum, max) across
micro-batches and emits one updated row per key per batch — the canonical
"custom accumulator with timeout" shape. State is a fixed-width tuple per
key: memory is O(|keys|), evicted via processing-time timeout, so the
operator is stable on unbounded streams.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "count LONG, total DOUBLE, max_val DOUBLE"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), False),
        T.StructField("max_value", T.DoubleType(), False),
    ]
)


def _update_user_stats(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    count, total, max_val = (
        state.get if state.exists else (0, 0.0, float("-inf"))
    )
    for pdf in pdfs:
        count += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            max_val = max(max_val, float(pdf["value"].max()))
    state.update((count, total, max_val))
    state.setTimeoutDuration(3600 * 1000)  # evict idle keys after 1h
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [count],
            "total_value": [total],
            "max_value": [max_val],
        }
    )


def running_user_stats(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Per-key running stats over an unbounded stream (update mode)."""
    from pyspark.sql import functions as F

    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events.groupBy(key)
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
