"""Scalar expression helpers.

Cross-engine float determinism
------------------------------
Floating-point SUMs are order-dependent, and Spark's partial/final
aggregation order differs run-to-run and engine-to-engine. For aggregates
that must be *reproducible* (and comparable against another engine at any
scale), we sum in exact DECIMAL arithmetic and cast the result back to
DOUBLE at the end: the decimal sum is exact, so the final double is the
nearest-double of the same exact value everywhere — bit-identical,
shuffle-order-independent. The fixtures' monetary columns carry ≤2
fractional digits, so DECIMAL(18,2) inputs are lossless.

This is also the right call at 100 TB: a pipeline whose nightly totals
wobble in the last bits can't be diffed against yesterday's run.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

def dec(col: Column | str, scale: int = 2, precision: int = 12) -> Column:
    """Cast a (≤ *scale* fractional digits) double column to exact decimal.

    Default precision 12 keeps two chained decimal multiplications within
    the 38-digit cap in both Spark and DuckDB, so product scales stay exact
    (no engine-specific scale-reduction rounding).
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact, order-independent SUM of a monetary double column → DOUBLE."""
    return F.sum(dec(col, scale, precision=18)).cast("double")


def dsum_expr(expr: Column) -> Column:
    """Exact SUM of an already-decimal expression → DOUBLE."""
    return F.sum(expr).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Deterministic AVG: exact decimal SUM cast to double, divided by count.

    Both engines compute double(exact_sum) / double(count) — identical IEEE
    operations → identical bits (vs. built-in AVG whose accumulation order
    floats).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c)).cast("double") / F.count(c).cast("double")


def ts_str(col: Column | str) -> Column:
    """Render a timestamp as 'yyyy-MM-dd HH:mm:ss' (second precision) —
    the cross-engine-stable way to emit timestamps in query results."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss")


_IDENT_RE = re.compile(r"[^a-zA-Z0-9_]")


def sanitize_identifier(name: str, fallback: str = "uploaded_data") -> str:
    """Table-name hygiene: non-alphanumerics → '_', empty → fallback.

    Same rule as the reference (``automated-data-catalog-&-etl/App.tsx:132``:
    ``replace(/[^a-zA-Z0-9_]/g, '_')`` with fallback ``uploaded_data``).
    """
    stem = name.rsplit(".", 1)[0] if "." in name else name
    cleaned = _IDENT_RE.sub("_", stem)
    return cleaned or fallback
