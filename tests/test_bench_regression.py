"""Per-query bench regression tripwire (round-3 judge task; mechanism
hardened round 9).

The driver's 2x gate is on the suite TOTAL, so a single badly-regressed
plan can hide inside a green total. This test compares the latest bench
run (``bench_queries.json`` — written by ``python bench.py`` locally,
and OVERWRITTEN by the driver's end-of-round run) against the frozen
last-accepted reference (``tools/bench_baseline.json``).

Rounds 6, 7, and 8 each ended with exactly one untouched key >1.5x in
the driver's end-of-round run that an isolated re-time showed to be
host-contention noise (±0.5-1.5 s run-to-run jitter under the 365-query
suite). A static threshold therefore can't distinguish "plan regressed"
from "driver's run was noisy", and the adjudicate-then-refresh loop was
structurally one round behind. Round-9 mechanism — noise self-adjudicates
instead of reddening the committed tree:

1. **Absolute floor**: keys where old AND new are both < 1.0 s are
   ignored (scheduler jitter dominates a sub-second denominator — a
   0.3 s scan "regressing" to 0.65 s is not a plan problem).
2. **Delta floor**: a breach must also move >= 0.5 s of wall time.
3. **Live re-time**: any key still breaching is re-timed IN ISOLATION
   (min of 3 passes after the standard bench warm-up —
   ``tools/retime.py``, the same protocol used for every accepted
   adjudication since round 6) and fails ONLY if the isolated time
   still exceeds the threshold. A genuinely regressed plan re-times
   slow and still fails; end-of-round contention noise re-times fast
   and the tree stays green.

Workflow: after perf-relevant changes run ``python bench.py`` then
pytest; when a round's numbers are accepted, refresh the baseline with
``cp bench_queries.json tools/bench_baseline.json`` (only ever from a
clean, idle-host run).
"""

from __future__ import annotations

import json
import os

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
THRESHOLD = 1.5
# Both-sides-sub-second keys are jitter-dominated: ignore entirely.
ABS_FLOOR_SEC = 1.0
# A regression must ALSO move this much wall time.
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
    suspects = {
        k: (baseline[k], current[k])
        for k in set(baseline) & set(current)
        if max(baseline[k], current[k]) >= ABS_FLOOR_SEC
        and baseline[k] > 0
        and current[k] / baseline[k] >= THRESHOLD
        and current[k] - baseline[k] >= MIN_DELTA_SEC
    }
    if not suspects:
        return
    # Self-adjudicate: isolated min-of-3 re-time of just the suspects.
    # Noise re-times fast (tree stays green); a real plan regression
    # re-times slow and fails below with both numbers shown.
    import sys

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from retime import retime

    fresh = retime(sorted(suspects), passes=3)
    regressed = {
        k: {"baseline": suspects[k][0], "suite_run": suspects[k][1],
            "isolated_retime": fresh[k]}
        for k in suspects
        if fresh[k] / suspects[k][0] >= THRESHOLD
        and fresh[k] - suspects[k][0] >= MIN_DELTA_SEC
    }
    assert not regressed, (
        f"queries regressed >= {THRESHOLD}x vs tools/bench_baseline.json "
        f"even after isolated min-of-3 re-time: {regressed} — investigate "
        "with tools/bench_diff.py; refresh the baseline only after accepting"
    )
