"""Skew mitigation for joins and aggregations.

AQE's skew-join splitting (on by default in ``session.get_spark``) handles
sort-merge skew at runtime; explicit salting is still needed when
(a) the skewed side feeds a hash aggregate (AQE doesn't split agg keys), or
(b) you must co-locate with a broadcast-averse large dimension.

``salted_join`` implements the classic pattern: the skewed (probe) side
gets a uniform random-ish salt derived *deterministically* from a row
fingerprint; the build side is replicated ``salt`` times. The join key
becomes (key, salt) — hot keys spread over ``salt`` reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, cols: list[str], salt: int) -> DataFrame:
    """Deterministic per-row salt in [0, salt): hash of the named columns.

    xxhash64 is seeded and engine-side — same input rows always land on
    the same salt bucket (reproducible plans, unlike rand())."""
    return df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt))
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
    fingerprint_cols: list[str] | None = None,
) -> DataFrame:
    """Join a skewed fact side to a smaller side, spreading hot keys.

    skewed rows get salt = hash(fingerprint) % salt; the small side is
    exploded ×``salt`` (one copy per salt value) so every (key, salt)
    bucket finds its match. Shuffle volume: |skewed| + salt·|small| —
    the trade that turns one 10-hour straggler into ``salt`` even tasks.
    """
    if how not in ("inner", "left"):
        # Replicating the small side ×salt breaks outer-join semantics:
        # each unmatched small-side key would emit `salt` null-extended
        # rows instead of one.
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    fp = fingerprint_cols or skewed.columns
    l = with_salt(skewed, fp, salt)
    r = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l.join(r, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def salted_agg_count(
    df: DataFrame, keys: list[str], salt: int = 16
) -> DataFrame:
    """Two-phase aggregation for skewed group keys: partial count per
    (keys, salt) → final sum per keys. The first shuffle spreads hot keys
    across ``salt`` reducers; the second moves only |groups|·salt rows."""
    partial = (
        with_salt(df, keys, salt)
        .groupBy(*keys, "__salt")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return partial.groupBy(*keys).agg(F.sum("__n").alias("n_rows"))
