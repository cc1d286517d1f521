"""Query registry: one entry per implemented operator (SURVEY.md §2).

Each ``q_*`` key maps to a PySpark callable ``(spark, sf_dir) -> DataFrame``
plus (where SQL-expressible) a DuckDB-runnable ANSI-SQL oracle string over
the same parquet tables. Column names/aliases match exactly on both sides —
the driver's compare sorts columns by name before hashing values.

Determinism rules applied throughout (SURVEY.md §7 "what's hard"):
- monetary aggregates in exact decimal, cast to double at the end
  (bit-identical across engines — ``functions.scalar``);
- every LIMIT carries a total order with a unique tie-break key;
- timestamps rendered with second precision via ``ts_str`` where emitted;
- no sampling, no approx functions in oracle-checked queries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query (and optionally its DuckDB oracle SQL)."""

    def deco(fn):
        # Refuse silent shadowing: two modules registering the same key
        # would leave whichever import ran last as the only survivor
        # (and its oracle as the only twin) with no error anywhere.
        # Idempotent re-registration of the SAME function (module
        # re-import) stays allowed.
        # Compare (module, qualname), not qualname alone: the repo
        # convention names the function after the key (@query('q_x')
        # def q_x), so two DIFFERENT modules registering the same key
        # would otherwise pass on matching function names — exactly the
        # silent-shadow case this guard exists to catch.
        prev = QUERIES.get(name)
        if prev is not None and (
            prev.__module__,
            prev.__qualname__,
        ) != (fn.__module__, fn.__qualname__):
            raise ValueError(f"duplicate query key: {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# Imported for side effects: each module registers its queries.
def load_all() -> None:
    from self_healing_data_pipeline_spark.queries import (  # noqa: F401
        core,
        relational,
        aggregates,
        scalars,
        windows,
        events,
        tier_c,
        extras,
        extras2,
        extras3,
        extras4,
        ingest_queries,
        llm_ops,
        udf_surface,
        tpch,
        tpch2,
        analytics,
        catalog_queries,
        corpus_ops,
        extras5,
        dq,
        analytics2,
        extras6,
        extras7,
        extras8,
        extras9,
        extras10,
        extras11,
        extras12,
        extras13,
        extras14,
        extras15,
        extras16,
        extras17,
        extras18,
        extras19,
        extras20,
        extras21,
        extras22,
        extras23,
        extras24,
        extras25,
        extras26,
        extras27,
        extras28,
        extras29,
        extras30,
        extras31,
        extras32,
        extras33,
        extras34,
        extras35,
        extras36,
        extras37,
        extras38,
        extras39,
        extras40,
        extras41,
        extras42,
        extras43,
        extras44,
        extras45,
        extras46,
        extras47,
        extras48,
        extras49,
        extras50,
        extras51,
        extras52,
        extras53,
        extras54,
        extras55,
        extras56,
        extras57,
        extras58,
        extras59,
        extras60,
        extras61,
        extras62,
        extras63,
        extras64,
        extras65,
        extras66,
        extras67,
        extras68,
        extras69,
        extras70,
        extras71,
        extras72,
        extras73,
        extras74,
        extras75,
        extras76,
        extras77,
        extras78,
        extras79,
        extras80,
        extras81,
        extras82,
        extras83,
        extras84,
        extras85,
        extras86,
        extras87,
        extras88,
        extras89,
        extras90,
        extras91,
    )
