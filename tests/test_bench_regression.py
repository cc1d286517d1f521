"""Per-query bench regression tripwire (round-3 judge task).

The driver's 2x gate is on the suite TOTAL, so a single badly-regressed
plan can hide inside a green total. This test compares the latest local
bench run (``bench_queries.json``, written by ``python bench.py``)
against the frozen last-accepted reference
(``tools/bench_baseline.json``) and fails when any query exceeds 1.5x
its reference time — the same rule as ``tools/bench_diff.py``.

Workflow: after perf-relevant changes run ``python bench.py`` then
pytest; when a round's numbers are accepted, refresh the baseline with
``cp bench_queries.json tools/bench_baseline.json``.
"""

from __future__ import annotations

import json
import os

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
THRESHOLD = 1.5
NOISE_FLOOR_SEC = 0.3  # sub-0.3s timings are JVM-scheduling noise
# a regression must ALSO move this much wall time: shared-host runs
# show ±0.4s run-to-run jitter on sub-second queries (GC/codegen/host
# contention), so ratio alone false-flags untouched queries
MIN_DELTA_SEC = 0.5


def _load(path: str) -> dict[str, float]:
    with open(path) as f:
        data = json.load(f)
    if isinstance(data.get("parsed"), dict):
        data = data["parsed"]
    return {k: float(v) for k, v in data["queries"].items()}


def test_no_per_query_bench_regression():
    current_path = os.path.join(REPO, "bench_queries.json")
    baseline_path = os.path.join(REPO, "tools", "bench_baseline.json")
    if not os.path.exists(current_path):
        pytest.skip("no bench_queries.json — run `python bench.py` first")
    current = _load(current_path)
    baseline = _load(baseline_path)
    regressed = {
        k: (baseline[k], current[k])
        for k in set(baseline) & set(current)
        if max(baseline[k], current[k]) >= NOISE_FLOOR_SEC
        and baseline[k] > 0
        and current[k] / baseline[k] >= THRESHOLD
        and current[k] - baseline[k] >= MIN_DELTA_SEC
    }
    assert not regressed, (
        f"queries regressed >= {THRESHOLD}x vs tools/bench_baseline.json "
        f"(old_sec, new_sec): {regressed} — investigate with "
        "tools/bench_diff.py; refresh the baseline only after accepting"
    )
