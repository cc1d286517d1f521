"""Dump `.explain("formatted")` output for named queries to files.

Usage: python tools/dump_plans.py SF_DIR OUTDIR SUFFIX key [key ...]

Writes OUTDIR/<key>_<SUFFIX>.txt holding the formatted physical plan of
``queries()[key](spark, SF_DIR)``. These are the plan receipts for the
optimization rounds (plans/r{N}/<key>_before.txt / _after.txt): the
judge cannot run Spark, so plan-shape claims in OPTIMIZATION_r{N}.md
are checked against these files.

The plan is the pre-execution (AQE initial) plan: join strategy, scan
pushdown (PushedFilters/ReadSchema), Exchange placement and Python
boundary nodes are all visible without executing. Executed-plan truth
(AQE reuse, runtime join rewrites) lives in tools/plan_audit.py and
tools/broadcast_census.py, which DO execute.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 5:
        print(__doc__)
        return 2
    sf_dir, outdir, suffix = sys.argv[1:4]
    keys = sys.argv[4:]
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entrymod
    from self_healing_data_pipeline_spark.session import get_spark

    spark = get_spark("dump_plans")
    qs = entrymod.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    rc = 0
    for key in keys:
        if key not in qs:
            print(f"{key}: NOT REGISTERED", file=sys.stderr)
            rc = 1
            continue
        try:
            df = qs[key](spark, sf_dir)
            text = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001 - record, keep dumping
            text = f"EXPLAIN FAILED: {exc!r}\n"
            rc = 1
        path = os.path.join(outdir, f"{key}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {key} @ {sf_dir} ({suffix})\n")
            f.write(text if text.endswith("\n") else text + "\n")
        print(f"wrote {path}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
