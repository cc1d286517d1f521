"""Window-function compositions: sessionization, keep-first dedup.

Pure window functions — one shuffle on the partition key, sort within
partitions, no Python. Deterministic: every ORDER BY carries a unique
tie-break column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tie_break: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event of the same key exceeds ``gap_minutes``.

    lag → boundary flag → running sum = session index. Batch twin of
    Structured Streaming's ``session_window`` (see ``streaming.windows``).
    """
    w = Window.partitionBy(key).orderBy(F.col(ts).asc(), F.col(tie_break).asc())
    prev_ts = F.lag(F.col(ts)).over(w)
    # Interval comparison works for both TIMESTAMP and TIMESTAMP_NTZ and is
    # session-timezone-independent.
    gap = F.expr(f"INTERVAL {gap_minutes} MINUTES")
    is_new = (prev_ts.isNull() | (F.col(ts) - prev_ts > gap)).cast("bigint")
    return events.withColumn("__new_session", is_new).withColumn(
        "session_id",
        F.sum("__new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).drop("__new_session")


def keep_first(
    df: DataFrame, keys: list[str], order_by: list
) -> DataFrame:
    """Stateful-dedup batch twin: keep the first row per key under a total
    order (streaming twin: ``dropDuplicatesWithinWatermark``)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
