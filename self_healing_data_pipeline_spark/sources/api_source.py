"""Custom CONNECTOR via the PySpark 4 Python DataSource API: a
paginated REST-API-style source with parallel page fetch, page-range
FILTER PUSHDOWN, a true structured-streaming reader with
offset-tracked exactly-once paging, and a WRITE path (batch +
streaming API sink) with a real two-phase commit protocol.

This is the reference's API-source vision
(`automated-data-catalog-&-etl/README.md:2` — data arriving from an
external service, not files) made concrete as a first-class Spark
source: `spark.read.format("synth_api")` / `spark.readStream.format
("synth_api")` after `register_api_source(spark)`.

Design for scale:

- **One InputPartition per page** — a real API's pagination IS the
  parallelism unit; executors fetch pages concurrently and nothing
  flows through the driver.
- **Filter pushdown prunes pages**: `pushFilters` narrows the page
  range from `page = / > / >= / < / <=` predicates, so
  ``read.filter("page = 7")`` fetches ONE page, not all of them (the
  connector-side analogue of parquet partition pruning). All filters
  are also returned as unhandled, so Spark re-applies them — pruning
  is a fetch optimization, never a correctness dependency.
- **Deterministic, offset-keyed pages** make the streaming reader
  exactly-once under replay: `readBetweenOffsets(start, end)`
  re-produces precisely the claimed pages, the contract Structured
  Streaming needs from a replayable source.

The payload derivation is deliberately SQL-expressible (md5 of the
record id, modular event mix, modular cents) so the whole connector is
ORACLE-CHECKED end to end against DuckDB `generate_series`
(`q_scan_api_source`) — connector correctness, not just connector
plumbing."""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)

API_SCHEMA = (
    "id bigint, page int, event_type string, amount_cents bigint, "
    "token string"
)

_EVENTS = ["view", "click", "purchase"]


def _page_rows(page: int, page_size: int):
    """The deterministic 'API response' for one page — shared by the
    batch reader, the stream reader, and replay."""
    for i in range(page_size):
        rid = page * page_size + i
        yield (
            rid,
            page,
            _EVENTS[rid % 3],
            (rid * 37) % 10_000,
            hashlib.md5(str(rid).encode()).hexdigest(),
        )


def prune_page_range(filters, pages: int):
    """Narrow [lo, hi] (inclusive) page bounds from supported filters
    on the ``page`` column; anything else leaves the range untouched.
    Pure function so the pruning logic is unit-testable off-cluster."""
    lo, hi = 0, pages - 1
    for f in filters:
        col = getattr(f, "attribute", None)
        if col != ("page",):
            continue
        if isinstance(f, EqualTo):
            lo, hi = max(lo, int(f.value)), min(hi, int(f.value))
        elif isinstance(f, GreaterThan):
            lo = max(lo, int(f.value) + 1)
        elif isinstance(f, GreaterThanOrEqual):
            lo = max(lo, int(f.value))
        elif isinstance(f, LessThan):
            hi = min(hi, int(f.value) - 1)
        elif isinstance(f, LessThanOrEqual):
            hi = min(hi, int(f.value))
    return lo, hi


class SyntheticApiDataSource(DataSource):
    """``format("synth_api")``: options ``pages`` (default 20),
    ``page_size`` (default 50)."""

    @classmethod
    def name(cls) -> str:
        return "synth_api"

    def schema(self) -> str:
        return API_SCHEMA

    def reader(self, schema):
        return _ApiBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return _ApiStreamReader(self.options)

    def writer(self, schema, overwrite):
        return _ApiBatchWriter(self.options)

    def streamWriter(self, schema, overwrite):
        return _ApiStreamWriter(self.options)


class _ApiBatchReader(DataSourceReader):
    def __init__(self, options):
        self.pages = int(options.get("pages", 20))
        self.page_size = int(options.get("page_size", 50))
        self._lo, self._hi = 0, self.pages - 1

    def pushFilters(self, filters):
        self._lo, self._hi = prune_page_range(filters, self.pages)
        # report every filter unhandled: Spark re-applies them all, so
        # pruning can only skip fetches, never change results
        return filters

    def partitions(self):
        return [InputPartition(p) for p in range(self._lo, self._hi + 1)]

    def read(self, partition):
        yield from _page_rows(partition.value, self.page_size)


class _ApiStreamReader(SimpleDataSourceStreamReader):
    """Offset = {'page': next_unread}; each ``read`` returns every
    currently-available page up to ``pages_per_batch`` (the rate-limit
    knob, like maxFilesPerTrigger) and advances the offset past them —
    so an ``availableNow`` drain consumes everything in one trigger.
    ``readBetweenOffsets`` deterministically replays a claimed range
    after restart; with ``max_pages`` consumed, ``read`` returns an
    empty batch and the SAME offset, which terminates the drain."""

    def __init__(self, options):
        self.page_size = int(options.get("page_size", 50))
        self.max_pages = int(options.get("max_pages", 2**31 - 1))
        self.pages_per_batch = int(options.get("pages_per_batch", 1000))

    def initialOffset(self) -> dict:
        return {"page": 0}

    def read(self, start: dict):
        p = int(start["page"])
        end = min(p + self.pages_per_batch, self.max_pages)
        if end <= p:
            return iter([]), {"page": p}
        rows = [
            r for page in range(p, end)
            for r in _page_rows(page, self.page_size)
        ]
        return iter(rows), {"page": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        for p in range(int(start["page"]), int(end["page"])):
            yield from _page_rows(p, self.page_size)

    def commit(self, end: dict) -> None:
        pass  # nothing to acknowledge upstream in the synthetic API


def register_api_source(spark) -> None:
    """Idempotent registration (latest registration wins in Spark).
    Also enables Python-source filter pushdown — a runtime SQL conf
    that defaults to false; Spark refuses a reader that implements
    ``pushFilters`` while it's disabled, so the two must travel
    together."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticApiDataSource)


# ---------------------------------------------------------------------------
# Write path: the API SINK with a real two-phase commit protocol.
# Tasks "POST" their partition as a staged request file and return a
# commit message; only the DRIVER's commit() publishes the batch — an
# atomic manifest rename — so a failed job leaves nothing half-visible
# (the FileCommitProtocol shape, applied to an API/webhook sink).
# ---------------------------------------------------------------------------

import json as _json
import os as _os
import uuid as _uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _ApiCommit(WriterCommitMessage):
    staged: str
    n_rows: int


def _stage_rows(path: str, iterator) -> _ApiCommit:
    """Task-side: serialize this partition's rows as ONE staged request
    (newline-delimited JSON) under .staging/ — unique name per task
    attempt, so speculative/retried attempts never collide; losers are
    simply never committed."""
    from pyspark import TaskContext

    staging = _os.path.join(path, ".staging")
    _os.makedirs(staging, exist_ok=True)
    tc = TaskContext.get()
    name = f"req_{tc.partitionId()}_{_uuid.uuid4().hex}.jsonl"
    staged = _os.path.join(staging, name)
    n = 0
    with open(staged, "w") as f:
        for row in iterator:
            f.write(_json.dumps(row.asDict()) + "\n")
            n += 1
    return _ApiCommit(staged=staged, n_rows=n)


def _publish(path: str, messages, manifest_name: str) -> None:
    """Driver-side atomic publish: move staged files into the spool and
    write the manifest LAST (rename-committed) — readers trust only
    manifested files, so a crash anywhere before the final rename
    publishes nothing."""
    final_names, total = [], 0
    for m in messages:
        if m is None:
            continue
        dst = _os.path.join(path, _os.path.basename(m.staged))
        _os.replace(m.staged, dst)
        final_names.append(_os.path.basename(dst))
        total += m.n_rows
    tmp = _os.path.join(path, f"._manifest_{_uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        _json.dump({"files": sorted(final_names), "rows": total}, f)
    _os.replace(tmp, _os.path.join(path, manifest_name))


def _discard(messages) -> None:
    for m in messages:
        if m is not None:
            try:
                _os.remove(m.staged)
            except OSError:
                pass


class _ApiBatchWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        return _stage_rows(self.path, iterator)

    def commit(self, messages):
        _publish(self.path, messages, "_MANIFEST.json")

    def abort(self, messages):
        _discard(messages)


class _ApiStreamWriter(DataSourceStreamWriter):
    """Streaming twin: per-epoch manifests (``_MANIFEST_<batchId>``)
    make replayed epochs idempotent at the READER — a re-run epoch
    re-publishes the same manifest name, and manifest-trusting readers
    take the latest write (the epoch-snapshot convention
    `streaming/snapshots.py` uses)."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        return _stage_rows(self.path, iterator)

    def commit(self, messages, batchId: int):
        _publish(self.path, messages, f"_MANIFEST_{batchId}.json")

    def abort(self, messages, batchId: int):
        _discard(messages)
