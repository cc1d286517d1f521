"""Relational composition operators Spark lacks as built-ins.

As-of join and range join are the two §2.3 (SURVEY.md) operators without a
direct DataFrame primitive. Both are implemented as compositions that keep
all work inside Catalyst (no Python in the hot path):

- ``asof_join``: union the two inputs tagged by side, single window pass
  per key carrying the last right-side value forward. One shuffle on
  (key), no cartesian blow-up — at 100 TB this is a sort-merge within key
  partitions, the same shape Flink/KDB use for time-series joins.
- ``range_join``: optional bucketization turns an O(n·m) theta join into
  an equi-join on overlapping buckets + residual predicate, which AQE can
  plan as broadcast/shuffle-hash instead of nested-loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_cols: list, k: int) -> DataFrame:
    """ORDER BY + LIMIT — Spark plans TakeOrderedAndProject (per-partition
    heap + single merge at the driver; no global sort, no full shuffle).

    Callers must include a unique tie-break column in ``order_cols`` for
    deterministic results.
    """
    return df.orderBy(*order_cols).limit(k)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """As-of (backward) join: for each left row, the most recent right row
    with ``right_ts <= left_ts`` within the same ``key``.

    Composition: tag sides → unionByName → window ``last(value,
    ignorenulls=True)`` ordered by (ts, side-tag) per key → keep left rows.
    The side-tag orders a right row *before* a left row at the same
    timestamp (inclusive semantics, like ``pandas.merge_asof``).

    Scale: exactly one shuffle on ``key``; within a key the window is a
    sort + linear scan. Skewed keys can be salted upstream by the caller.
    ``tolerance`` (an INTERVAL string, e.g. ``'1 hour'``) bounds staleness.
    """
    # Keep the inputs' timestamp flavor (TIMESTAMP or TIMESTAMP_NTZ) — both
    # order and subtract consistently; forcing LTZ would make results
    # session-timezone-dependent.
    lt = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rt = right.withColumn("__side", F.lit(0)).withColumn("__ts", F.col(right_ts))
    for c in right_value_cols:
        lt = lt.withColumn(f"__r_{c}", F.lit(None).cast(rt.schema[c].dataType))
        rt = rt.withColumn(f"__r_{c}", F.col(c))
    rt_cols = [key, "__side", "__ts"] + [f"__r_{c}" for c in right_value_cols]
    unioned = lt.unionByName(rt.select(*rt_cols), allowMissingColumns=True)

    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in right_value_cols
        ],
        F.last(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True)
        .over(w)
        .alias("__asof_ts"),
    )
    out = carried.filter(F.col("__side") == 1)
    if tolerance is not None:
        within = F.col("__asof_ts") >= F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
        for c in right_value_cols:
            out = out.withColumn(
                f"__asof_{c}", F.when(within, F.col(f"__asof_{c}"))
            )
        out = out.withColumn("__asof_ts", F.when(within, F.col("__asof_ts")))
    keep = left.columns + [f"__asof_{c}" for c in right_value_cols] + ["__asof_ts"]
    renames = dict(
        [(f"__asof_{c}", f"asof_{c}") for c in right_value_cols]
        + [("__asof_ts", "asof_ts")]
    )
    out = out.select(*keep)
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    return out


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
) -> DataFrame:
    """As-of join via grouped ``pandas.merge_asof`` (applyInPandas).

    Alternative to the window composition in ``asof_join`` for callers who
    want pandas semantics verbatim. Scale shape: one co-grouped shuffle on
    ``key``; each group is merge-sorted in an Arrow batch. Prefer
    ``asof_join`` (pure JVM) unless a per-group pandas feature is needed —
    and never merge_asof on collected driver data.
    """
    import pandas as pd
    from pyspark.sql import types as T

    out_fields = list(left.schema.fields) + [
        T.StructField(f"asof_{c}", right.schema[c].dataType, True)
        for c in right_value_cols
    ]
    out_schema = T.StructType(out_fields)
    lcols = left.columns

    def merge(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        if ldf.empty:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        if rdf.empty:
            out = ldf[lcols].copy()
            for c in right_value_cols:
                out[f"asof_{c}"] = None
            return out
        ldf = ldf.sort_values(left_ts, kind="mergesort")
        rdf = rdf.sort_values(right_ts, kind="mergesort")
        merged = pd.merge_asof(
            ldf,
            rdf[[right_ts] + right_value_cols].rename(
                columns={c: f"asof_{c}" for c in right_value_cols}
            ),
            left_on=left_ts,
            right_on=right_ts,
            direction="backward",
            suffixes=("", "__r"),
        )
        keep = lcols + [f"asof_{c}" for c in right_value_cols]
        return merged[keep]

    grouped = left.groupBy(key).cogroup(right.groupBy(key))
    return grouped.applyInPandas(merge, schema=out_schema)


def range_join(
    left: DataFrame,
    right: DataFrame,
    condition: Column,
    left_value: Column | None = None,
    right_value: Column | None = None,
    band_width: float | None = None,
) -> DataFrame:
    """Theta/range join.

    Plain form: Catalyst plans a (broadcast) nested-loop — fine when one
    side is small. Banded form (``left_value``/``right_value``/
    ``band_width`` for a |l−r| ≤ band_width condition): the left side
    explodes into its bucket and both neighbors, the right side buckets
    once, and the join becomes bucket-equality + residual predicate —
    an equi-join Catalyst can shuffle-hash, instead of nested-loop.
    Neighbor explosion is what makes it *correct*: a pair within
    band_width can straddle a bucket boundary, so same-bucket-only
    joins silently drop matches.
    """
    if left_value is not None and right_value is not None and band_width is not None:
        l = left.withColumn(
            "__bkt",
            F.explode(
                F.array(
                    *[
                        (F.floor(left_value / band_width) + F.lit(d)).cast("bigint")
                        for d in (-1, 0, 1)
                    ]
                )
            ),
        )
        r = right.withColumn(
            "__bkt", F.floor(right_value / band_width).cast("bigint")
        )
        return l.join(r, (l["__bkt"] == r["__bkt"]) & condition).drop("__bkt")
    return left.join(right, condition)
