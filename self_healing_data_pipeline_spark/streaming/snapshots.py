"""Epoch-snapshot resolution shared by the foreachBatch state stores
(``streaming.cdc``, ``streaming.rollup``).

Both subsystems persist state as full parquet snapshots under
``state_dir/batch=<epoch_id>`` and rely on "readers resolve the newest
snapshot" for recovery. Two hazards live in that resolution, and both
belong here so every store gets the same fix:

* **Partial writes.** A crash mid-``parquet()`` leaves a footerless
  ``batch=N`` directory (only ``_temporary`` inside, no ``_SUCCESS``).
  A reader that resolves it fails with ``UNABLE_TO_INFER_SCHEMA`` on
  every restart — a permanent crash loop on the recovery path. Snapshot
  resolution therefore skips any epoch directory without the
  ``_SUCCESS`` marker Spark's commit protocol writes last.
* **Self-reads on replay.** foreachBatch is at-least-once: epoch N can
  re-run after its own snapshot committed. A merge that reads the
  newest snapshot then reads its OWN output; additive merges
  double-count, and even latest-wins merges depend on unspecified
  overwrite-while-read behavior. Passing ``before_epoch=N`` anchors the
  read to epochs strictly below N, so replay re-derives the same bytes
  from the same inputs.

Scale notes: pure driver-side directory listing — one ``listdir`` of
epoch directories (hundreds, pruned by retention), never a data scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def committed_epochs(state_dir: str, before_epoch: int | None = None) -> list[int]:
    """Sorted epoch ids with a complete (``_SUCCESS``-marked) snapshot,
    optionally restricted to epochs strictly below ``before_epoch``."""
    if not os.path.isdir(state_dir):
        return []
    epochs = []
    for d in os.listdir(state_dir):
        if not (d.startswith("batch=") and d.split("=", 1)[1].isdigit()):
            continue
        e = int(d.split("=", 1)[1])
        if before_epoch is not None and e >= before_epoch:
            continue
        if os.path.exists(os.path.join(state_dir, d, "_SUCCESS")):
            epochs.append(e)
    return sorted(epochs)


def read_latest_snapshot(
    spark: SparkSession, state_dir: str, before_epoch: int | None = None
) -> DataFrame | None:
    """Newest committed snapshot (strictly below ``before_epoch`` when
    given), or None if no complete snapshot exists yet."""
    epochs = committed_epochs(state_dir, before_epoch)
    if not epochs:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"batch={epochs[-1]}"))
