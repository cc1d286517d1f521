"""Mechanical re-verification slate (round-11 verdict task 2).

Problem: the driver records oracle verdicts for a ~50-key prefix of
``__spark_entry__.queries()`` per round. When a key's implementation
changes AFTER its latest driver verdict, the recorded evidence
describes code that no longer exists — that key must re-verify before
its verdict can be trusted. Rounds 10–11 maintained this slate by hand
(``_CHANGED_SINCE_VERDICT`` in ``__spark_entry__.py``); this tool makes
it mechanical.

Model: ``tools/verify_snapshot.json`` stores, per query key, the
sha256 (16-hex prefix) of

* ``func``   — the query callable's own source text,
* ``module`` — the full bytes of the module file that defines it
  (helper/shared-builder edits — the round-11 graph lineage fix lived
  in shared helpers — change this even when the callable is untouched),
* ``deps``   — the transitive in-package import closure of that module
  (operators/, functions/, sources/, … files it reaches), so an edit
  to a shared OPERATOR flags every key whose module imports it — the
  blind spot a module-only hash leaves open,
* ``oracle`` — the key's DuckDB oracle SQL string,

as of the key's most recent green driver verdict. A key whose CURRENT
hash differs from its snapshot in any of the three must appear in the
driver's next verification prefix.

Usage::

    python tools/verify_slate.py              # JSON must-verify report
    python tools/verify_slate.py --refresh    # absorb the latest
        CORRECTNESS_r*.json: re-snapshot every key it verified green.
        Run at ROUND START, before making changes — the tree at round
        start is byte-identical to the tree the driver verified.
    python tools/verify_slate.py --bootstrap  # snapshot ALL keys from
        the current tree (first-time init; see caveat in the snapshot
        file's "_note").

CI: ``tests/test_verify_slate.py`` asserts every computed must-verify
key lands inside the driver's 50-key prefix of ``queries()`` and that
the slate fits the per-round budget.
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
SNAPSHOT_PATH = os.path.join(HERE, "verify_snapshot.json")

#: Driver verification budget per round, minus a rotation reserve so
#: vintage-queue draining never starves (budget 50, reserve 10).
SLATE_BUDGET = 40


def _load_registry():
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from self_healing_data_pipeline_spark import registry

    registry.load_all()
    return registry


def _short(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()[:16]


_PKG = "self_healing_data_pipeline_spark"
_IMPORT_RE = None  # compiled lazily (module may be imported without re)


def _module_file(dotted: str) -> str | None:
    """Best-effort dotted-module → file path inside the package."""
    rel = dotted.replace(".", os.sep)
    for cand in (
        os.path.join(REPO, rel + ".py"),
        os.path.join(REPO, rel, "__init__.py"),
    ):
        if os.path.isfile(cand):
            return cand
    return None


def _package_imports(path: str) -> list[str]:
    """Dotted in-package modules statically imported by ``path``."""
    global _IMPORT_RE
    import re

    if _IMPORT_RE is None:
        _IMPORT_RE = re.compile(
            rf"^\s*(?:from\s+({_PKG}(?:\.\w+)*)\s+import|"
            rf"import\s+({_PKG}(?:\.\w+)*))",
            re.MULTILINE,
        )
    try:
        with open(path) as f:
            src = f.read()
    except OSError:
        return []
    out = []
    for m in _IMPORT_RE.finditer(src):
        out.append(m.group(1) or m.group(2))
    return out


def _dep_closure(mod_file: str, file_cache: dict[str, str]) -> str:
    """Hash of the transitive in-package import closure of ``mod_file``
    (excluding the module itself — that is the ``module`` field)."""
    seen: set[str] = set()
    frontier = [mod_file]
    while frontier:
        cur = frontier.pop()
        for dotted in _package_imports(cur):
            dep = _module_file(dotted)
            if dep and dep != mod_file and dep not in seen:
                seen.add(dep)
                frontier.append(dep)
    parts = []
    for dep in sorted(seen):
        if dep not in file_cache:
            try:
                with open(dep, "rb") as f:
                    file_cache[dep] = _short(f.read())
            except OSError:
                file_cache[dep] = "unreadable"
        parts.append(f"{os.path.relpath(dep, REPO)}:{file_cache[dep]}")
    return _short("\n".join(parts).encode())


def current_hashes(registry) -> dict[str, dict[str, str]]:
    """Per-key {func, module, deps, module_file, oracle} hashes."""
    out: dict[str, dict[str, str]] = {}
    file_cache: dict[str, str] = {}
    deps_cache: dict[str, str] = {}
    for key, func in registry.QUERIES.items():
        mod = inspect.getmodule(func)
        mod_file = getattr(mod, "__file__", None) or "<unknown>"
        if mod_file not in file_cache:
            try:
                with open(mod_file, "rb") as f:
                    file_cache[mod_file] = _short(f.read())
            except OSError:
                file_cache[mod_file] = "unreadable"
        if mod_file not in deps_cache:
            deps_cache[mod_file] = _dep_closure(mod_file, file_cache)
        try:
            src = inspect.getsource(func)
        except (OSError, TypeError):
            src = ""
        out[key] = {
            "func": _short(src.encode()),
            "module": file_cache[mod_file],
            "deps": deps_cache[mod_file],
            "module_file": os.path.relpath(mod_file, REPO)
            if os.path.isabs(mod_file)
            else mod_file,
            "oracle": _short(registry.ORACLE.get(key, "").encode()),
        }
    return out


def load_snapshot() -> dict:
    try:
        with open(SNAPSHOT_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def compute_slate(
    current: dict[str, dict[str, str]], snapshot: dict
) -> tuple[list[str], dict[str, list[str]]]:
    """Keys whose current source/oracle differs from their snapshot.

    Pure function (unit-tested directly). Keys absent from the snapshot
    are NOT flagged: never-verified keys already sort into the front of
    ``queries()`` via the unchecked buckets, and flagging them here
    would double-count the budget.
    """
    must: list[str] = []
    why: dict[str, list[str]] = {}
    keys = snapshot.get("keys", snapshot)  # tolerate flat bootstrap form
    for key, cur in current.items():
        snap = keys.get(key)
        if not isinstance(snap, dict):
            continue
        reasons = [
            field
            for field in ("func", "oracle", "module", "deps")
            if snap.get(field) is not None and cur[field] != snap[field]
        ]
        if reasons:
            must.append(key)
            why[key] = reasons
    return must, why


def _latest_correctness() -> tuple[int, dict]:
    files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if not files:
        return 0, {}
    path = files[-1]
    rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()) or 0)
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return rnd, {}
    return rnd, data if isinstance(data, dict) else {}


def _green(verdict: dict) -> bool:
    rows_only = (
        verdict.get("err") == "no_oracle"
        and verdict.get("spark_rows") is not None
    )
    return bool(verdict.get("hash_match")) or rows_only


def refresh() -> int:
    """Re-snapshot keys verified green in the LATEST correctness file."""
    registry = _load_registry()
    current = current_hashes(registry)
    snapshot = load_snapshot()
    keys = snapshot.setdefault("keys", {})
    rnd, data = _latest_correctness()
    if snapshot.get("refreshed_round") == rnd and keys:
        print(f"already refreshed for round {rnd}; nothing to do")
        return 0
    changed = sources_changed_since_artifact(rnd)
    if changed and "--force" not in sys.argv:
        print(
            f"REFUSING refresh: query sources changed since "
            f"CORRECTNESS_r{rnd:02d} was recorded — a refresh now would "
            "stamp post-verdict edits as driver-verified. Revert or "
            "re-verify these first (--force to override):"
        )
        for p in changed:
            print(f"  {p}")
        return 1
    n = 0
    for key, verdict in data.items():
        if isinstance(verdict, dict) and _green(verdict) and key in current:
            keys[key] = {**current[key], "round": rnd}
            n += 1
    snapshot["refreshed_round"] = rnd
    with open(SNAPSHOT_PATH, "w") as f:
        json.dump(snapshot, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"refreshed {n} keys from CORRECTNESS_r{rnd:02d}")
    return n


def sources_changed_since_artifact(rnd: int) -> list[str]:
    """Query-source paths edited since ``CORRECTNESS_r{rnd}.json`` was
    recorded — the refresh safety guard. The driver verifies the tree
    as COMMITTED at round end, so:

    * artifact tracked at commit C -> any committed or worktree change
      to the package / ``__spark_entry__.py`` after C is post-verdict;
    * artifact still untracked (driver wrote it, round-start commit
      pending) -> the verified tree is HEAD's, so only DIRTY worktree
      sources are post-verdict.

    Returns [] when git is unavailable (degrades to the old behavior).
    """
    import subprocess

    paths = ["self_healing_data_pipeline_spark", "__spark_entry__.py"]

    def _git(*args) -> str | None:
        try:
            r = subprocess.run(
                ["git", *args], cwd=REPO, capture_output=True, text=True,
                timeout=30,
            )
        except Exception:
            return None
        return r.stdout if r.returncode == 0 else None

    art = f"CORRECTNESS_r{rnd:02d}.json"
    commit = _git("log", "--diff-filter=A", "--format=%H", "-1", "--", art)
    commit = (commit or "").strip()
    ref = commit if commit else "HEAD"
    out = _git("diff", "--name-only", ref, "--", *paths)
    if out is None:
        return []
    return sorted(p for p in out.split("\n") if p.strip())


def bootstrap() -> None:
    registry = _load_registry()
    current = current_hashes(registry)
    rnd, _ = _latest_correctness()
    snapshot = {
        "_note": (
            "Bootstrapped from the working tree in round 12 (re-run when "
            "the deps field was added). Keys whose implementation changed "
            "after their last driver verdict but before this bootstrap "
            "are covered by the hand-maintained _CHANGED_SINCE_VERDICT "
            "slate for the r12 sample; from r12's refresh onward this "
            "snapshot is the single source of truth."
        ),
        "refreshed_round": rnd,
        "keys": {k: {**v, "round": rnd} for k, v in current.items()},
    }
    with open(SNAPSHOT_PATH, "w") as f:
        json.dump(snapshot, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"bootstrapped {len(current)} keys (round {rnd})")


def report() -> dict:
    registry = _load_registry()
    current = current_hashes(registry)
    snapshot = load_snapshot()
    must, why = compute_slate(current, snapshot)
    return {
        "must_verify": sorted(must),
        "reasons": {k: why[k] for k in sorted(why)},
        "count": len(must),
        "budget": SLATE_BUDGET,
        "over_budget": len(must) > SLATE_BUDGET,
    }


if __name__ == "__main__":
    if "--refresh" in sys.argv:
        refresh()
    elif "--bootstrap" in sys.argv:
        bootstrap()
    else:
        print(json.dumps(report(), indent=1))
