"""Incremental file ingestion — the continuous form of the reference's
upload-and-load flow (SURVEY.md §2.1 "API/connector sources", vision
``README.md:2``).

``incremental_ingest`` watches a directory and appends newly-arrived
files to a parquet table exactly once: Structured Streaming's file source
tracks processed files in the checkpoint, so re-runs skip already-ingested
data (the self-healing property: a crashed run resumes where it left off
instead of double-loading — state lives in the checkpoint, not the
operator). ``trigger(availableNow=True)`` drains the backlog and stops,
which makes the same code both a batch catch-up job and a continuous
daemon (drop the trigger).

At scale: the file source lists incrementally (maxFilesPerTrigger bounds
per-batch work), output is append-only parquet partitionable by arrival
date, and the checkpoint is the only coordination state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def incremental_ingest(
    spark: SparkSession,
    source_dir: str,
    dest_dir: str,
    checkpoint_dir: str,
    schema: T.StructType,
    fmt: str = "csv",
    max_files_per_trigger: int | None = None,
    transform=None,
    await_seconds: int = 300,
) -> None:
    """Drain all unprocessed files from ``source_dir`` into ``dest_dir``.

    ``transform`` (optional) maps the streaming DataFrame before the sink —
    the hook where frozen-schema casts / quality filters plug in.
    """
    reader = spark.readStream.schema(schema)
    if fmt == "csv":
        reader = reader.option("header", True)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.format(fmt).load(source_dir)
    stream = stream.withColumn("_ingested_at", F.current_timestamp())
    if transform is not None:
        stream = transform(stream)
    q = (
        stream.writeStream.format("parquet")
        .option("path", dest_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    finished = q.awaitTermination(await_seconds)
    if not finished:
        # Don't return pretending the drain completed: stop the query so
        # the checkpoint stays consistent and surface the timeout.
        q.stop()
        raise TimeoutError(
            f"incremental_ingest did not drain {source_dir!r} within "
            f"{await_seconds}s (processed files remain recorded in the "
            f"checkpoint; re-run to resume)"
        )


def ingested_table(spark: SparkSession, dest_dir: str) -> DataFrame:
    return spark.read.parquet(dest_dir)
