"""Per-query bench regression tripwire (round-3 judge task; mechanism
hardened round 9).

The driver's 2x gate is on the suite TOTAL, so a single badly-regressed
plan can hide inside a green total. This test compares the latest bench
run (``bench_queries.json`` — written by ``python bench.py`` locally,
and OVERWRITTEN by the driver's end-of-round run) against the frozen
last-accepted reference (``tools/bench_baseline.json``).

Rounds 6, 7, and 8 each ended with exactly one untouched key >1.5x in
the driver's end-of-round run that an isolated re-time showed to be
host-contention noise (±0.5-1.5 s run-to-run jitter under the 374-query
suite). A static threshold therefore can't distinguish "plan regressed"
from "driver's run was noisy", and the adjudicate-then-refresh loop was
structurally one round behind. Round-9 mechanism — noise self-adjudicates
instead of reddening the committed tree:

1. **Suspect detection** stays sensitive: ratio >= 1.5x AND absolute
   move >= 0.5 s AND either side >= 0.3 s. (An earlier draft ignored
   keys where both sides were < 1 s; that would have made a genuine
   0.15 s -> 0.95 s plan regression permanently invisible — review
   finding. Sub-second suspects are cheap to adjudicate instead.)
2. **Live re-time**: every suspect is re-timed IN ISOLATION (min of 3
   passes after the standard bench warm-up — ``tools/retime.py``, the
   same protocol used for every accepted adjudication since round 6)
   and fails ONLY if the isolated time still breaches the same rule.
   A genuinely regressed plan re-times slow and still fails;
   end-of-round contention noise re-times fast and the tree stays
   green. Keys present in the JSON files but no longer registered
   (renames) are reported as stale instead of KeyError-ing.

Workflow: after perf-relevant changes run ``python bench.py`` then
pytest; when a round's numbers are accepted, refresh the baseline with
``cp bench_queries.json tools/bench_baseline.json`` (only ever from a
clean, idle-host run).
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
THRESHOLD = 1.5
NOISE_FLOOR_SEC = 0.3  # sub-0.3s on both sides: scheduler jitter only
MIN_DELTA_SEC = 0.5  # a regression must also move this much wall time


def _load(path: str) -> dict[str, float]:
    with open(path) as f:
        data = json.load(f)
    if isinstance(data.get("parsed"), dict):
        data = data["parsed"]
    return {k: float(v) for k, v in data["queries"].items()}


def _breaches(old: float, new: float) -> bool:
    return (
        max(old, new) >= NOISE_FLOOR_SEC
        and old > 0
        and new / old >= THRESHOLD
        and new - old >= MIN_DELTA_SEC
    )


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
        if _breaches(baseline[k], current[k])
    }
    if not suspects:
        return
    # Self-adjudicate: isolated min-of-3 re-time of just the suspects.
    # Noise re-times fast (tree stays green); a real plan regression
    # re-times slow and fails below with all three numbers shown.
    # Import by file path — no sys.path mutation leaking into the rest
    # of the test session (review finding).
    spec = importlib.util.spec_from_file_location(
        "retime", os.path.join(REPO, "tools", "retime.py")
    )
    retime_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(retime_mod)

    from self_healing_data_pipeline_spark import registry

    registry.load_all()
    live = sorted(k for k in suspects if k in registry.QUERIES)
    stale = sorted(k for k in suspects if k not in registry.QUERIES)
    assert not stale, (
        f"bench JSON files contain keys no longer in the registry: "
        f"{stale} — re-run `python bench.py` and refresh "
        "tools/bench_baseline.json"
    )
    fresh = retime_mod.retime(live, passes=3)
    regressed = {
        k: {"baseline": suspects[k][0], "suite_run": suspects[k][1],
            "isolated_retime": fresh[k]}
        for k in live
        if _breaches(suspects[k][0], fresh[k])
    }
    assert not regressed, (
        f"queries regressed >= {THRESHOLD}x vs tools/bench_baseline.json "
        f"even after isolated min-of-3 re-time: {regressed} — investigate "
        "with tools/bench_diff.py; refresh the baseline only after accepting"
    )
