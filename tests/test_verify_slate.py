"""CI gate for the mechanical re-verification slate (r11 verdict task 2).

Rule: any query key whose implementation (callable source, defining
module, or oracle SQL) changed since its last green driver verdict must
land inside the driver's ~50-key verification prefix of
``__spark_entry__.queries()`` — and the whole slate must fit the
per-round budget. No Spark session needed: everything here is source
hashing and dict ordering.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import verify_slate  # noqa: E402

DRIVER_PREFIX = 50


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "entry_for_slate", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------- pure unit


def test_compute_slate_flags_each_field():
    cur = {
        "q_a": {"func": "1", "module": "m1", "deps": "d1", "oracle": "o1"},
        "q_b": {"func": "2", "module": "m2", "deps": "d2", "oracle": "o2"},
        "q_c": {"func": "3", "module": "m3", "deps": "d3", "oracle": "o3"},
        "q_d": {"func": "4", "module": "m4", "deps": "d4", "oracle": "o4"},
        "q_new": {"func": "5", "module": "m5", "deps": "d5", "oracle": "o5"},
    }
    snap = {
        "keys": {
            "q_a": {"func": "STALE", "module": "m1", "deps": "d1", "oracle": "o1"},
            "q_b": {"func": "2", "module": "STALE", "deps": "d2", "oracle": "o2"},
            "q_c": {"func": "3", "module": "m3", "deps": "d3", "oracle": "STALE"},
            # shared-operator edit: only the import-closure hash moves
            "q_d": {"func": "4", "module": "m4", "deps": "STALE", "oracle": "o4"},
            # q_new absent: never verified -> handled by the unchecked
            # bucket in queries(), must NOT be flagged here.
        }
    }
    must, why = verify_slate.compute_slate(cur, snap)
    assert set(must) == {"q_a", "q_b", "q_c", "q_d"}
    assert why["q_a"] == ["func"]
    assert why["q_b"] == ["module"]
    assert why["q_c"] == ["oracle"]
    assert why["q_d"] == ["deps"]


def test_compute_slate_clean_snapshot_flags_nothing():
    cur = {"q_a": {"func": "1", "module": "m", "oracle": "o"}}
    snap = {"keys": {"q_a": {"func": "1", "module": "m", "oracle": "o"}}}
    must, why = verify_slate.compute_slate(cur, snap)
    assert must == [] and why == {}


# ------------------------------------------------------------- integration


@pytest.fixture(scope="module")
def slate_report():
    return verify_slate.report()


@pytest.fixture(scope="module")
def query_order():
    return list(_entry_module().queries())


def test_snapshot_exists_and_covers_registry(slate_report):
    snap = verify_slate.load_snapshot()
    assert snap.get("keys"), "run tools/verify_slate.py --bootstrap"
    registry = verify_slate._load_registry()
    # Every snapshotted key still exists (renamed/dropped keys must be
    # pruned so the slate never chases ghosts).
    ghosts = set(snap["keys"]) - set(registry.QUERIES)
    assert not ghosts, f"snapshot has keys not in registry: {sorted(ghosts)}"


def test_snapshot_absorbed_latest_driver_round():
    """Self-enforcing refresh: when a new CORRECTNESS_r{N}.json lands
    (driver round N finished), the snapshot must absorb it BEFORE new
    edits pile up. Staleness by EXACTLY ONE round is a warning, not a
    failure: the driver writes CORRECTNESS_r{N} at round end and the
    judge runs this suite on that very tree, where the refresh has by
    construction not happened yet (and would be a no-op risk-wise —
    the tree is byte-identical to what the driver verified; the
    refresh tool's git guard enforces exactly that before stamping).
    Two rounds stale means a whole round of edits piled up unstamped —
    that fails."""
    import warnings

    snap = verify_slate.load_snapshot()
    rnd, _ = verify_slate._latest_correctness()
    have = snap.get("refreshed_round")
    if have == rnd:
        return
    assert have is not None and rnd - have == 1, (
        f"slate snapshot is {rnd - (have or 0)} rounds behind "
        f"(refreshed_round={have}, latest CORRECTNESS round={rnd}) — "
        "run `python tools/verify_slate.py --refresh` FIRST, before "
        "touching query modules"
    )
    warnings.warn(
        f"CORRECTNESS_r{rnd:02d}.json not yet absorbed "
        f"(refreshed_round={have}); run `python tools/verify_slate.py "
        "--refresh` before editing query modules this round",
        stacklevel=1,
    )


def test_slate_fits_budget(slate_report):
    assert slate_report["count"] <= verify_slate.SLATE_BUDGET, (
        "must-verify slate exceeds the driver budget; split the round's "
        f"edits or raise rotation: {slate_report['must_verify']}"
    )


def test_slate_lands_in_driver_prefix(slate_report, query_order):
    prefix = set(query_order[:DRIVER_PREFIX])
    missing = [k for k in slate_report["must_verify"] if k not in prefix]
    assert not missing, (
        "keys changed since their last driver verdict but NOT in the "
        f"verification prefix — add to _CHANGED_SINCE_VERDICT: {missing} "
        f"(reasons: {({k: slate_report['reasons'][k] for k in missing})})"
    )


def test_hand_slate_keys_exist_and_lead(query_order):
    entry = _entry_module()
    hand = list(entry._CHANGED_SINCE_VERDICT)
    prefix = set(query_order[:DRIVER_PREFIX])
    for key in hand:
        assert key in prefix, f"{key} fell out of the driver prefix"
