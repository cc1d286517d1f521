"""Per-query bench regression tripwire (round-3 judge task; mechanism
hardened round 9, isolation fixed round 10, environment-calibrated
later in round 10 — see the SENTINELS note for the multiplicative
drift model both stages now normalize by).

The driver's 2x gate is on the suite TOTAL, so a single badly-regressed
plan can hide inside a green total. This test compares the latest bench
run (``bench_queries.json`` — written by ``python bench.py`` locally,
and OVERWRITTEN by the driver's end-of-round run) against the frozen
last-accepted reference (``tools/bench_baseline.json``).

Rounds 6, 7, and 8 each ended with exactly one untouched key >1.5x in
the driver's end-of-round run that an isolated re-time showed to be
host-contention noise (±0.5-1.5 s run-to-run jitter under the ~380-query
suite). A static threshold therefore can't distinguish "plan regressed"
from "driver's run was noisy", so noise self-adjudicates:

1. **Suspect detection** stays sensitive: ratio >= 1.5x AND absolute
   move >= 0.5 s AND either side >= 0.3 s. (An earlier draft ignored
   keys where both sides were < 1 s; that would have made a genuine
   0.15 s -> 0.95 s plan regression permanently invisible — review
   finding. Sub-second suspects are cheap to adjudicate instead.)
   Keys listed in the baseline's ``isolated_keys`` were frozen from an
   isolated min-of-3 (systematically faster than contended suite runs),
   so they get a protocol-aware threshold of 1.8x — see the provenance
   rule in ``tools/retime.py``'s docstring.
2. **Live re-time in a SUBPROCESS**: every suspect is re-timed in a
   fresh process running ``tools/retime.py`` (min of 3 passes after the
   standard bench warm-up) and fails ONLY if the isolated time still
   breaches the same rule. A genuinely regressed plan re-times slow and
   still fails; end-of-round contention noise re-times fast and the
   tree stays green. The subprocess is load-bearing: ``getOrCreate()``
   cannot change master at runtime, so an in-process call under pytest
   inherits conftest's ``local[4]`` / 4-shuffle-partition session and
   re-judges 32-core baselines on 4 cores (the round-9 false red on
   q_multimodal_features: 2.21 s on 4 cores vs 1.40 s idle-32-core).
   The retime JSON reports the actual ``sparkContext.master`` and this
   test asserts it is the bench one; ``test_retime_subprocess_is_isolated``
   pins the property even on rounds with no suspects.

BASELINE REFRESH PROCEDURE (round-10 rule, applied from r10 on) — the
ORDER matters (review finding: the reverse order lets the cp clobber
the spliced values and tags): FIRST accept the clean idle-host suite
run via ``cp bench_queries.json tools/bench_baseline.json``, THEN
re-time every key that moved materially (>1.3x in either direction AND
>=0.3 s absolute) through ``python tools/retime.py --patch-baseline
<keys>``, which splices the isolated min-of-3 into the fresh baseline
and tags the key in ``isolated_keys``. This stops a single lucky suite run from
setting an unbeatable floor (the r8 q_multimodal_features 1.43 s trap —
its natural band is 1.4-3.0 s) and keeps the baseline's mixed protocols
explicit instead of silent.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
THRESHOLD = 1.5
ISOLATED_THRESHOLD = 1.8  # baseline frozen from isolated min-of-3 (faster)
NOISE_FLOOR_SEC = 0.3  # sub-0.3s on both sides: scheduler jitter only
MIN_DELTA_SEC = 0.5  # a regression must also move this much wall time

#: ENVIRONMENT CALIBRATION (round-10 second fix to this mechanism).
#: Host speed is not constant: the same tree measured suite totals of
#: 333-408 s across one day with identical plans, and a retime
#: subprocess that runs beside pytest's resident JVM lands ~1.4x
#: pessimistic vs a truly idle retime (measured: q_impute_missing
#: 1.64 s direct vs 2.45 s under pytest — same code, same session
#: config). Under a MULTIPLICATIVE environment model, a uniformly slow
#: run inflates every key by the same factor while a genuine plan
#: regression inflates one key on top of it — so both stages normalize:
#: stage 1 divides each suite ratio by the run's MEDIAN ratio over all
#: common keys (384 keys: one regressed plan cannot move the median),
#: and stage 2 re-times these stable SENTINEL keys in the same
#: subprocess and divides each suspect's isolated ratio by the median
#: sentinel drift. A true 1.5x regression on a 1.4x-slow host shows
#: raw 2.1x and corrected 1.5x — still caught; calibration can only
#: absorb what affects every key equally. Guard rails (second review
#: pass): (a) sentinel baselines must be ISOLATED-tagged so
#: fresh/baseline is protocol-matched drift, not drift times the
#: suite-vs-isolated protocol skew; (b) cal clamps to >= 1.0 (a fast
#: environment never hides a regression) and stage-2 cal caps at 2.0
#: (the measured co-residency factor is ~1.4-1.5 — a larger "drift"
#: is more likely a sentinel's own problem than the environment);
#: (c) if the run's MEDIAN ratio itself exceeds SUITE_CAL_LIMIT the
#: test FAILS with a distinct message instead of normalizing — a
#: global regression (session default, shuffle config) moves the
#: median exactly like a horrible host day, and this estimator cannot
#: tell them apart, so neither is silently absorbed; (d) a sentinel
#: that is itself a suspect is excluded from CALIBRATION (it still
#: gets judged in `live`, calibrated by the remaining sentinels).
SENTINELS = ("q_agg_groupby", "q_join_inner", "q_window_frame")
SUITE_CAL_LIMIT = 1.75
RETIME_CAL_LIMIT = 2.0


def _load(path: str) -> tuple[dict[str, float], set[str]]:
    with open(path) as f:
        data = json.load(f)
    if isinstance(data.get("parsed"), dict):
        data = data["parsed"]
    return (
        {k: float(v) for k, v in data["queries"].items()},
        set(data.get("isolated_keys", [])),
    )


def _breaches(old: float, new: float, threshold: float = THRESHOLD) -> bool:
    return (
        max(old, new) >= NOISE_FLOOR_SEC
        and old > 0
        and new / old >= threshold
        and new - old >= MIN_DELTA_SEC
    )


def _run_retime(extra_args: list[str], timeout: int) -> dict:
    """Run tools/retime.py in a FRESH process (fresh JVM -> bench session,
    local[$SPARK_GRAFT_CPUS]); parse the last stdout line as JSON and
    assert the session really is the bench one, not an inherited test
    session."""
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "retime.py"), *extra_args],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"tools/retime.py failed (rc={proc.returncode}):\n"
        f"stdout tail: {proc.stdout[-2000:]}\nstderr tail: {proc.stderr[-2000:]}"
    )
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    info = json.loads(lines[-1])
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    assert info["master"] == f"local[{cpus}]", (
        f"retime subprocess ran on master={info['master']!r}, expected "
        f"local[{cpus}] — adjudication on the wrong session is the round-9 "
        "false-red bug"
    )
    return info


def test_retime_subprocess_is_isolated():
    """The adjudication mechanism itself: a retime subprocess must get a
    fresh bench-config JVM (local[$SPARK_GRAFT_CPUS]) even while pytest
    owns a local[4] session in THIS process. --probe starts the session
    and reports master without timing any query."""
    _run_retime(["--probe"], timeout=300)


def test_no_per_query_bench_regression():
    current_path = os.path.join(REPO, "bench_queries.json")
    baseline_path = os.path.join(REPO, "tools", "bench_baseline.json")
    if not os.path.exists(current_path):
        pytest.skip("no bench_queries.json — run `python bench.py` first")
    current, _ = _load(current_path)
    baseline, isolated = _load(baseline_path)
    common = sorted(set(baseline) & set(current))
    ratios = [current[k] / baseline[k] for k in common if baseline[k] > 0]
    if not ratios:
        pytest.skip("bench_queries.json shares no keys with the baseline")
    # Stage-1 environment factor: the run's median ratio (see SENTINELS
    # note — uniform host drift is not a plan regression, and one
    # regressed plan cannot move the median of ~384 keys). A median
    # above SUITE_CAL_LIMIT is indistinguishable from a GLOBAL
    # regression and is never silently normalized away.
    med = statistics.median(ratios)
    assert med <= SUITE_CAL_LIMIT, (
        f"the run's MEDIAN per-query ratio is {med:.2f}x — either the "
        "host is catastrophically degraded (re-run `python bench.py` "
        "idle) or a global regression (session default, shuffle config) "
        "slowed the whole suite; this gate cannot tell them apart and "
        "refuses to normalize it away"
    )
    suite_cal = max(1.0, med)
    suspects = {
        k: (baseline[k], current[k])
        for k in common
        if _breaches(
            baseline[k],
            current[k] / suite_cal,
            ISOLATED_THRESHOLD if k in isolated else THRESHOLD,
        )
    }
    if not suspects:
        return
    from self_healing_data_pipeline_spark import registry

    registry.load_all()
    live = sorted(k for k in suspects if k in registry.QUERIES)
    stale = sorted(k for k in suspects if k not in registry.QUERIES)
    assert not stale, (
        f"bench JSON files contain keys no longer in the registry: "
        f"{stale} — re-run `python bench.py` and refresh "
        "tools/bench_baseline.json"
    )
    # Self-adjudicate in a SUBPROCESS (fresh JVM, bench session) — never
    # in-process, which would inherit conftest's local[4] session.
    # Sentinels ride along for stage-2 calibration (a suspect sentinel
    # is excluded from CALIBRATION and judged in `live` like any other
    # suspect, calibrated by the remaining sentinels). Protocol match:
    # only isolated-TAGGED sentinel baselines may calibrate — a
    # suite-protocol baseline would fold the suite-vs-isolated skew
    # into the "drift" and mis-correct in both directions.
    sentinels = [
        s
        for s in SENTINELS
        if s not in suspects
        and s in baseline
        and s in isolated
        and s in registry.QUERIES
    ]
    info = _run_retime(live + sentinels, timeout=120 + 180 * (len(live) + len(sentinels)))
    fresh = info["queries"]
    retime_cal = (
        min(
            RETIME_CAL_LIMIT,
            max(1.0, statistics.median([fresh[s] / baseline[s] for s in sentinels])),
        )
        if sentinels
        else 1.0
    )
    # Stage 2 always uses the BASE threshold: the isolated re-time is
    # protocol-matched (or generous) against either baseline kind —
    # isolated-vs-isolated for tagged keys, isolated-vs-suite (faster
    # side) for untagged — so the 1.8x protocol-skew slack of stage 1
    # would here let a genuine 1.6x regression on a tagged key ship
    # (review finding).
    regressed = {
        k: {"baseline": suspects[k][0], "suite_run": suspects[k][1],
            "isolated_retime": fresh[k],
            "environment_cal": round(retime_cal, 3)}
        for k in live
        if _breaches(suspects[k][0], fresh[k] / retime_cal, THRESHOLD)
    }
    assert not regressed, (
        f"queries regressed vs tools/bench_baseline.json even after "
        f"isolated min-of-3 subprocess re-time (sentinel-calibrated): "
        f"{regressed} — investigate "
        "with tools/bench_diff.py; refresh the baseline only after accepting "
        "(volatile keys: tools/retime.py --patch-baseline)"
    )
