"""Compare two bench JSON outputs and flag per-query regressions.

Usage: python tools/bench_diff.py OLD.json NEW.json [threshold]

Prints queries slower than ``threshold``× (default 1.5) their old time,
the top improvements, and the common-subset totals — the driver's 2×
gate is on totals, but a single regressed plan hides inside a green
total, so CI wants the per-query view.

Accepts either a raw bench line ({"queries": {...}}) or a driver record
that nests it under "parsed".
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        data = json.load(f)
    if isinstance(data.get("parsed"), dict):
        data = data["parsed"]
    qs = data.get("queries")
    if not isinstance(qs, dict):
        raise SystemExit(f"{path}: no 'queries' dict found")
    return {k: float(v) for k, v in qs.items()}


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    common = sorted(set(old) & set(new))
    if not common:
        print("no common queries")
        return 1
    old_total = sum(old[k] for k in common)
    new_total = sum(new[k] for k in common)
    print(
        f"common subset: {len(common)} queries, "
        f"{old_total:.1f}s -> {new_total:.1f}s ({new_total / old_total:.2f}x)"
    )
    # Only meaningful ratios: ignore sub-0.3s noise on both sides.
    deltas = [
        (new[k] / old[k], k)
        for k in common
        if max(old[k], new[k]) >= 0.3 and old[k] > 0
    ]
    regressed = sorted((r for r in deltas if r[0] >= threshold), reverse=True)
    improved = sorted(r for r in deltas if r[0] <= 1 / threshold)
    if regressed:
        print(f"\nregressed >= {threshold}x:")
        for ratio, k in regressed:
            print(f"  {k}: {old[k]:.2f}s -> {new[k]:.2f}s ({ratio:.2f}x)")
    else:
        print(f"\nno regressions >= {threshold}x")
    if improved:
        print("\nimproved:")
        for ratio, k in improved:
            print(f"  {k}: {old[k]:.2f}s -> {new[k]:.2f}s ({ratio:.2f}x)")
    only_new = sorted(set(new) - set(old))
    if only_new:
        slow_new = [k for k in only_new if new[k] >= 2.0]
        print(f"\nnew queries: {len(only_new)}; >=2s: ", end="")
        print(", ".join(f"{k} ({new[k]:.1f}s)" for k in slow_new) or "none")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
