"""Audit executed plans of every registered query for scale smells.

Usage: python tools/plan_audit.py [sf_dir] [query ...]

For each query: EXECUTES it (collect) at the given SF and inspects the
FINAL adaptive plan (initial plans cannot show AQE stage reuse, and the
toString output contains both sections — counting naively double-counts
every node). Flags:

- duplicate-scan: the same parquet file scanned more than once with no
  Reused* node in the final plan (a CTE computed per-branch). Some are
  by design (self-joins like Q17/Q18, dual-alias dims like Q8); the
  report is for eyeballs, not a hard gate.
- single-partition window/sort over non-aggregated data is NOT detected
  here — tests/test_scale_shapes.py asserts those statically.

Exit code is always 0: this is a review tool; hard plan contracts live
in CI.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from self_healing_data_pipeline_spark.session import get_spark

    spark = get_spark("plan_audit")
    flagged = 0
    total = 0
    for name, fn in sorted(entrymod.queries().items()):
        if only and name not in only:
            continue
        total += 1
        try:
            df = fn(spark, sf_dir)
            df.collect()
            p = df._jdf.queryExecution().executedPlan().toString()
            final = p.split("== Initial Plan ==")[0]
            files = re.findall(
                r"InMemoryFileIndex\(\d+ paths\)\[file:([^\]]+)\]", final
            )
            dups = {
                f.rsplit("/", 1)[-1]: c
                for f, c in Counter(files).items()
                if c >= 2
            }
            reused = len(re.findall(r"Reused", final))
            if dups and not reused:
                flagged += 1
                print(f"{name}: duplicate scans {dups}, no reuse")
        except Exception as e:  # report, keep auditing
            flagged += 1
            print(f"{name}: ERROR {type(e).__name__}: {e}")
    print(f"\n{total} queries audited, {flagged} flagged")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
