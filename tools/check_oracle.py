"""Local stand-in for the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given SF dir, then compares row count, column names, and
order-insensitive values (sorted by all columns, NaN-safe, exact for
ints/strings, bit-exact for doubles by default).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from self_healing_data_pipeline_spark.session import get_spark

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    results: dict[str, str] = {}
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception:
            results[name] = "SPARK-ERROR"
            print(f"=== {name}: SPARK ERROR\n{traceback.format_exc()}")
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(spdf)} rows)"
            print(f"=== {name}: rows-only, {len(spdf)} rows, {time.time()-t0:.1f}s")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception:
            results[name] = "ORACLE-ERROR"
            print(f"=== {name}: ORACLE ERROR\n{traceback.format_exc()}")
            continue
        verdict = compare(spdf, odf)
        results[name] = verdict
        print(f"=== {name}: {verdict}  ({len(spdf)} rows, {time.time()-t0:.1f}s)")

    n_bad = sum(1 for v in results.values() if "OK" not in v and "rows-only" not in v)
    print(f"\n{len(results)} queries, {n_bad} failing")
    return 1 if n_bad else 0


def _kind(series) -> str:
    """Normalized dtype kind: signed/unsigned ints collapse to 'i'; all
    object-ish (str, decimal, list) collapse to 'O'. Anything else (f, b,
    M for datetimes, m for timedeltas) passes through."""
    k = series.dtype.kind
    if k == "u":
        return "i"
    if k in ("S", "U"):
        return "O"
    return k


def compare(spdf, odf) -> str:
    import numpy as np
    import pandas as pd

    if len(spdf) != len(odf):
        return f"ROWCOUNT MISMATCH spark={len(spdf)} oracle={len(odf)}"
    s_cols = sorted(spdf.columns)
    o_cols = sorted(odf.columns)
    if s_cols != o_cols:
        return f"SCHEMA MISMATCH spark={s_cols} oracle={o_cols}"
    a = spdf[s_cols].sort_values(s_cols, kind="mergesort").reset_index(drop=True)
    b = odf[o_cols].sort_values(o_cols, kind="mergesort").reset_index(drop=True)
    # Driver-strict dtype gate: the driver hashes the raw pandas frames, so
    # an int64 Spark column vs a float64/object DuckDB twin (the classic
    # uncast SUM -> HUGEINT trap) hash-mismatches even when values agree.
    # Fail here on any dtype-KIND difference so that class can't reship.
    for c in s_cols:
        ka = _kind(a[c])
        kb = _kind(b[c])
        if ka != kb:
            return (
                f"DTYPE MISMATCH col={c} spark={a[c].dtype}({ka}) "
                f"oracle={b[c].dtype}({kb}) — cast the oracle aggregate"
            )
    for c in s_cols:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype("float64")
            bv = bv.astype("float64")
            both_nan = av.isna() & bv.isna()
            eq = (av == bv) | both_nan
            if not eq.all():
                i = (~eq).idxmax()
                diff = abs(float(av[i]) - float(bv[i])) if not (
                    math.isnan(av[i]) or math.isnan(bv[i])
                ) else float("nan")
                return (
                    f"VALUE MISMATCH col={c} row={i} "
                    f"spark={av[i]!r} oracle={bv[i]!r} absdiff={diff:g}"
                )
        else:
            av = av.astype(str)
            bv = bv.astype(str)
            if not (av == bv).all():
                i = (av != bv).idxmax()
                return f"VALUE MISMATCH col={c} row={i} spark={av[i]!r} oracle={bv[i]!r}"
    return "OK"


if __name__ == "__main__":
    raise SystemExit(main())
