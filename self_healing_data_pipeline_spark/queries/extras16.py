"""Round-5 batch 11 (SURVEY.md §2.11): continuous QUANTILES from the
EXISTING rollup machinery — the point of mergeable partials is that one
registry serves many summaries, and this batch proves it: bucketing
values by (decimal digits, leading two digits) turns
``streaming.rollup``'s additive (bucket, n) state into a mergeable
quantile sketch with a <= 1/10 relative-error guarantee, no new
streaming code at all.

Why digit buckets and not log buckets: the bucket key must be computed
IDENTICALLY on both engines, and floor(log(x)/log(b)) can land on
either side of an integer boundary depending on the engine's last-ulp
log behavior. Decimal-digit bucketing is pure integer/string
arithmetic — cross-engine exact by construction — and a value in
bucket [L·10^k, (L+1)·10^k) with L in 10..99 is pinned to within
1/L <= 10% of its lower bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# Bucket key of a positive cents value: d = decimal digits, L = leading
# two digits (c itself when c < 10). Key = d*100 + L is monotone in the
# value's bucket lower bound.
_BUCKET_SQL = """CAST(LENGTH(CAST({c} AS VARCHAR)) AS BIGINT) * 100
      + CAST(SUBSTRING(CAST({c} AS VARCHAR), 1, 2) AS BIGINT)"""


def _bucket_col(c):
    s = c.cast("string")
    return (F.length(s).cast("bigint") * 100) + F.substring(s, 1, 2).cast(
        "bigint"
    )


def _bucket_lo_sql(key: str) -> str:
    # lower bound in cents: L * 10^(d-2) for d >= 2, else L (= the value)
    return f"""CASE WHEN {key} // 100 >= 2
        THEN ({key} % 100) * CAST(POWER(10, {key} // 100 - 2) AS BIGINT)
        ELSE {key} % 100 END"""


@query(
    "q_stream_quantiles",
    oracle=f"""
    WITH c AS (
      SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events
      WHERE value > 0
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c
    ), b AS (
      SELECT {_BUCKET_SQL.format(c='cents')} AS key,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM c GROUP BY 1
    ), cum AS (
      SELECT key, cnt,
             SUM(cnt) OVER (ORDER BY key) AS cum
      FROM b
    ), ranked AS (
      SELECT cents, ROW_NUMBER() OVER (ORDER BY cents) AS rn FROM c
    ), probes AS (
      SELECT * FROM (VALUES (50), (95), (99)) AS t(p)
    ), answers AS (
      SELECT p.p,
             (SELECT cents FROM ranked, tot
               WHERE rn = CAST(CEIL(p.p * n / 100.0) AS BIGINT)) AS exact_cents,
             (SELECT MIN(key) FROM cum, tot
               WHERE cum >= CAST(CEIL(p.p * n / 100.0) AS BIGINT)) AS key
      FROM probes p
    )
    SELECT CAST(p AS BIGINT) AS p,
           exact_cents,
           CAST({_bucket_lo_sql('key')} AS BIGINT) AS bucket_lo,
           CAST(CASE WHEN key // 100 >= 2
                THEN ({_bucket_lo_sql('key')})
                     + CAST(POWER(10, key // 100 - 2) AS BIGINT)
                ELSE (key % 100) + 1 END AS BIGINT) AS bucket_hi,
           TRUE AS bounds_ok
    FROM answers ORDER BY p
    """,
)
def q_stream_quantiles(spark, sf_dir):
    """Continuous quantiles from the ROLLUP registry — machinery reuse,
    not new machinery: event values (exact cents) bucket by (decimal
    digits, leading two digits) and stream through
    ``streaming.rollup.merge_rollup`` in three event-id-tercile epochs;
    the additive (bucket, n) state is then a mergeable quantile sketch.
    For p in {{50, 95, 99}}: the exact percentile value
    (oracle-verified by rank selection), the sketch bucket's exact
    integer bounds, and an in-row witness the oracle expects TRUE —
    the exact quantile falls inside the sketch's <= 10%-wide bucket,
    the quantile-error contract pinned by the correctness gate.

    Scale: state is bounded by the value DOMAIN (~90 buckets/decade),
    not the stream; per batch the shuffle carries bucket partials
    (rollup discipline); the rank-selection pass exists only for the
    gate's exact side."""
    import os

    from self_healing_data_pipeline_spark.session import scratch_dir
    from self_healing_data_pipeline_spark.streaming.rollup import (
        merge_rollup,
        read_rollup,
    )

    sdir = os.path.join(scratch_dir("squant", sf_dir), "state")
    ev = read_table(spark, sf_dir, "events").where(F.col("value") > 0)
    c = ev.select(
        "event_id", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    max_id = c.agg(F.max("event_id")).collect()[0][0] or 0
    t1, t2 = max_id // 3, 2 * max_id // 3
    for epoch, pred in enumerate(
        (
            F.col("event_id") <= t1,
            (F.col("event_id") > t1) & (F.col("event_id") <= t2),
            F.col("event_id") > t2,
        )
    ):
        batch = c.filter(pred)
        partials = batch.groupBy(
            _bucket_col(F.col("cents")).alias("bucket")
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
        )
        merge_rollup(spark, partials, sdir, [], epoch)
    snap = read_rollup(spark, sdir)
    out_schema = (
        "p bigint, exact_cents bigint, bucket_lo bigint, "
        "bucket_hi bigint, bounds_ok boolean"
    )
    if snap is None:
        return spark.createDataFrame([], out_schema)
    state = snap.select(F.col("bucket").alias("key"), F.col("n").alias("cnt"))
    # bounded state: resolve the probe quantile buckets driver-side
    rows = sorted(
        (r["key"], r["cnt"]) for r in state.collect()
    )
    total = sum(cnt for _, cnt in rows)
    if total == 0:
        # empty stream: no quantiles to certify — empty result, never a
        # driver exception (matches the other registry queries)
        return spark.createDataFrame([], out_schema)

    def bucket_for(rank: int) -> tuple[int, int]:
        cum = 0
        for key, cnt in rows:
            if cum + cnt >= rank:
                return key, cum  # cum = rows strictly below this bucket
            cum += cnt
        return rows[-1][0], cum - rows[-1][1]

    def lo_hi(key: int) -> tuple[int, int]:
        d, lead = key // 100, key % 100
        if d >= 2:
            lo = lead * 10 ** (d - 2)
            return lo, lo + 10 ** (d - 2)
        return lead, lead + 1
    import math

    probes = []
    for p in (50, 95, 99):
        rank = math.ceil(p * total / 100.0)
        key, below = bucket_for(rank)
        lo, hi = lo_hi(key)
        probes.append((p, key, rank - below, lo, hi))
    pr = spark.createDataFrame(
        probes,
        "p bigint, key bigint, rank_in bigint, bucket_lo bigint, bucket_hi bigint",
    )
    # Exact side for the gate WITHOUT a global sort: the sketch already
    # located each quantile's bucket, so the exact value is the
    # (rank - below)-th smallest INSIDE that bucket — a rank window
    # PARTITIONED BY bucket over only the probed buckets' rows (at
    # larger scales the same narrowing iterates: re-bucket within the
    # hit bucket until the slice is small).
    from pyspark.sql import Window

    in_probed = c.withColumn("key", _bucket_col(F.col("cents"))).join(
        F.broadcast(pr.select("key").distinct()), "key", "left_semi"
    )
    ranked = in_probed.select(
        "key",
        "cents",
        F.row_number()
        .over(Window.partitionBy("key").orderBy("cents"))
        .alias("rn"),
    )
    return (
        pr.join(ranked, (pr.key == ranked.key) & (pr.rank_in == ranked.rn))
        .select(
            "p",
            F.col("cents").alias("exact_cents"),
            "bucket_lo",
            "bucket_hi",
            (
                (F.col("cents") >= F.col("bucket_lo"))
                & (F.col("cents") < F.col("bucket_hi"))
            ).alias("bounds_ok"),
        )
        .orderBy("p")
    )
