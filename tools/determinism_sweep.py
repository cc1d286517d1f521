"""Partition-perturbation determinism sweep (round 12).

The q_inventory_floor find (window order not total over the fixture's
non-unique ``(l_orderkey, l_linenumber)``; clamp count flaked by one
at sf0.1) showed that a key can be hash-green for rounds while
carrying latent nondeterminism: the driver's oracle gate compares ONE
Spark execution against DuckDB, so an unstable plan that usually
lands on the agreeing side keeps passing until it doesn't.

This sweep attacks the class directly: every ``queries()`` key runs
TWICE at the given SF — once under the session defaults (32 shuffle
partitions here), once with ``spark.sql.shuffle.partitions`` set to a
coprime small value (7) — and the sorted result frames are hashed and
compared. Changing the partition count perturbs exactly the things a
deterministic query must not depend on: which rows share a partition
(tie order into windows and limits), aggregation merge trees (float
sum order), and AQE's runtime coalescing decisions.

Verdict classes:

* ``STABLE`` — hashes agree. Required for every ORACLE-BACKED key:
  the driver's hash gate implicitly promises this.
* ``UNSTABLE`` — hashes differ. For an oracle-backed key this is a
  bug of the q_inventory_floor class (fix the total order / exact
  arithmetic). For a rows-only key it may be the documented reason
  the key IS rows-only (``percentile_approx``'s uncontracted GK merge
  tree, HLL variants) — the report marks which.

Usage:
  python tools/determinism_sweep.py [sf_dir] [q_key ...]
Writes ``determinism_sweep.json`` next to this file; exits 1 if any
ORACLE-BACKED key is unstable.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PERTURBED_PARTITIONS = "7"


def frame_hash(pdf) -> str:
    """Order-insensitive, dtype-insensitive content hash: sort columns
    by name, rows by all columns (as strings), hash the string grid.
    Mirrors the spirit of the driver compare (sorted values)."""
    cols = sorted(pdf.columns)
    a = pdf[cols].astype(str).sort_values(cols, kind="mergesort")
    h = hashlib.sha256()
    h.update(("|".join(cols)).encode())
    for row in a.itertuples(index=False):
        h.update(("\x1f".join(row) + "\x1e").encode())
    return h.hexdigest()[:16]


def main(argv) -> int:
    sf_dir = "/root/testdata/sf0.01"
    keys = []
    for a in argv:
        if a.startswith("/"):
            sf_dir = a
        else:
            keys.append(a)

    import __spark_entry__ as entrymod
    from self_healing_data_pipeline_spark.session import get_spark

    spark = get_spark("determinism_sweep")
    qs = entrymod.queries()
    oracle_backed = set(entrymod.oracle_sql())
    if not keys:
        keys = list(qs)

    base_parts = spark.conf.get("spark.sql.shuffle.partitions")
    report: dict[str, dict] = {}
    unstable_oracle: list[str] = []
    for k in keys:
        rec: dict = {"oracle_backed": k in oracle_backed}
        try:
            spark.conf.set("spark.sql.shuffle.partitions", base_parts)
            h1 = frame_hash(qs[k](spark, sf_dir).toPandas())
            spark.conf.set(
                "spark.sql.shuffle.partitions", PERTURBED_PARTITIONS
            )
            h2 = frame_hash(qs[k](spark, sf_dir).toPandas())
            rec["stable"] = h1 == h2
            if not rec["stable"]:
                rec["hashes"] = [h1, h2]
                if k in oracle_backed:
                    unstable_oracle.append(k)
        except Exception as exc:
            rec["error"] = f"{type(exc).__name__}: {exc}"[:200]
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", base_parts)
        report[k] = rec

    out = os.path.join(os.path.dirname(__file__), "determinism_sweep.json")
    unstable_rows_only = sorted(
        k for k, r in report.items()
        if r.get("stable") is False and not r["oracle_backed"]
    )
    with open(out, "w") as f:
        json.dump(
            {
                "sf_dir": sf_dir,
                "perturbed_partitions": PERTURBED_PARTITIONS,
                "unstable_oracle_backed": sorted(unstable_oracle),
                "unstable_rows_only": unstable_rows_only,
                "report": report,
            },
            f, indent=1, sort_keys=True,
        )
    errs = {k: r["error"] for k, r in report.items() if "error" in r}
    print(
        f"swept {len(report)} keys at {sf_dir} -> {out}; "
        f"{len(unstable_oracle)} unstable oracle-backed, "
        f"{len(unstable_rows_only)} unstable rows-only, {len(errs)} errors"
    )
    for k in sorted(unstable_oracle):
        print(f"  UNSTABLE (oracle-backed!): {k} {report[k]['hashes']}")
    for k in unstable_rows_only:
        print(f"  unstable (rows-only, check vs census): {k}")
    for k, e in errs.items():
        print(f"  ERROR {k}: {e}")
    return 1 if unstable_oracle else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
