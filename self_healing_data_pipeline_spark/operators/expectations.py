"""Declarative data-quality expectations (SURVEY.md §2.11, round 4).

The reference is a *self-healing* pipeline: it validates uploads,
routes bad rows to quarantine, and re-checks loads by reading them back
(`APP/App.tsx` load-verify step; `pipeline/runner.py` is this repo's
tested twin). This module adds the missing declarative layer on top —
Great-Expectations-style rules evaluated Spark-first.

Scale design (the whole point of the API shape):

- **One scan, N rules.** ``run_expectations`` compiles every rule into
  a conditional-count expression and evaluates ALL of them in a single
  aggregate pass over the table — never one job per rule. At 100 TB the
  difference between 1 scan and 20 scans is the difference between a
  nightly audit and an impossible one. The aggregate is map-side
  partial: each task folds its partition into one row of counters, and
  only ~N longs per task cross the network.
- **Violation routing, not just counting.** ``route_violations`` tags
  each row with its FIRST failing rule (same first-failing-rule
  discipline as ``q_quality_funnel``) so bad rows can be quarantined
  with one narrow projection — the self-healing action, not just the
  report.
- Rules are plain Column predicates, so Catalyst folds constants,
  prunes columns (only columns referenced by any rule are read), and
  pushes nothing row-at-a-time into Python.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One declarative rule: ``name`` + a row predicate that must hold.

    ``predicate`` is a Spark Column (NULL counts as a violation — an
    expectation that cannot be evaluated on a row is not satisfied by
    that row, matching SQL constraint semantics ``NOT coalesce(p,
    false)``)."""

    name: str
    predicate: Column


def expect_between(name: str, col: str, lo, hi) -> Expectation:
    return Expectation(name, F.col(col).between(F.lit(lo), F.lit(hi)))


def expect_positive(name: str, col: str) -> Expectation:
    return Expectation(name, F.col(col) > 0)


def expect_not_null(name: str, col: str) -> Expectation:
    return Expectation(name, F.col(col).isNotNull())


def expect_in(name: str, col: str, values) -> Expectation:
    return Expectation(name, F.col(col).isin(list(values)))


def expect_matches(name: str, col: str, pattern: str) -> Expectation:
    return Expectation(name, F.col(col).rlike(pattern))


def run_expectations(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """Evaluate all rules in ONE aggregate pass.

    Returns one row per rule: ``(rule, n_rows, n_violations, pass_rate,
    ok)`` — ok when zero violations. The single ``agg`` compiles to one
    hash-free partial aggregate (no grouping key): each task emits one
    counter row, the driver-side final merge touches #tasks rows."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for r in rules:
        aggs.append(
            # outer coalesce: sum over ZERO rows is NULL, but an empty
            # table has zero violations, not unknown
            F.coalesce(
                F.sum(
                    F.when(
                        ~F.coalesce(r.predicate, F.lit(False)), 1
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias(f"__v_{r.name}")
        )
    counts = df.agg(*aggs)
    # unpivot the single counter row into (rule, n_violations)
    pairs = F.array(
        *[
            F.struct(
                F.lit(r.name).alias("rule"),
                F.col(f"__v_{r.name}").cast("long").alias("n_violations"),
            )
            for r in rules
        ]
    )
    return (
        counts.select(F.col("__n").cast("long").alias("n_rows"), pairs.alias("p"))
        .select("n_rows", F.explode("p").alias("r"))
        .select(
            F.col("r.rule").alias("rule"),
            "n_rows",
            F.col("r.n_violations").alias("n_violations"),
            F.when(F.col("n_rows") == 0, F.lit(1.0))
            .otherwise(
                (F.col("n_rows") - F.col("r.n_violations"))
                / F.col("n_rows").cast("double")
            )
            .alias("pass_rate"),
            (F.col("r.n_violations") == 0).alias("ok"),
        )
    )


def route_violations(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """Tag each row with its first failing rule (``quarantine_rule``
    NULL = clean) — the narrow projection a quarantine sink writes.
    Evaluation is a single CASE chain; no extra scan or shuffle."""
    routed = F.lit(None).cast("string")
    for r in reversed(rules):
        routed = F.when(
            ~F.coalesce(r.predicate, F.lit(False)), F.lit(r.name)
        ).otherwise(routed)
    return df.withColumn("quarantine_rule", routed)
