"""Deduplication operators for training-data pipelines (SURVEY.md §2.11).

Scale design (the point of each method at 100 TB):

- **Exact**: hash-groupBy on the dedup key — one shuffle, map-side partial.
- **Normalized**: same, after a deterministic text normalization.
- **MinHash + LSH**: shingle → k minhashes → band into b buckets →
  self-join *within buckets only*. Candidate pairs are O(collisions), not
  O(n²); each stage is a narrow map + one shuffle on (band, signature).
- **SimHash**: 64-bit weighted-projection fingerprint; near-dups differ in
  few bits. Banding the 64 bits into 4×16-bit keys finds all pairs within
  Hamming distance 3 with 4 equi-joins — again no O(n²).

All hashing uses Spark built-ins (xxhash64 / crc32) — JVM-side, seeded,
deterministic; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def normalize_text(col) -> F.Column:
    """Deterministic normalization: lowercase, collapse non-alphanumerics
    to single spaces, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


def dedup_exact(df: DataFrame, keys: list[str], order_by: list) -> DataFrame:
    """Exact dedup keeping a deterministic representative per key group."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def shingles(col, n: int = 5) -> F.Column:
    """Word n-gram shingle array from normalized text (distinct shingles)."""
    toks = F.split(normalize_text(col), " ")
    k = F.size(toks) - F.lit(n - 1)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    shingle_n: int = 5,
) -> DataFrame:
    """MinHash signatures via explode → hash-aggregate.

    (id, shingle) rows → ``num_hashes`` seeded xxhash64 columns → one
    hash aggregate taking min per id. One shuffle keyed on id with
    map-side partial mins (shuffle rows = |ids| per partition, not
    |shingles|), and whole-stage-codegen'd hashing — the shape that holds
    at 100 TB, unlike a per-row nested loop over 32 array passes.
    Returns (``__id``, m0..m{num_hashes-1}).
    """
    exploded = df.select(
        F.col(id_col).alias("__id"),
        F.explode(shingles(text_col, shingle_n)).alias("__sh"),
    )
    return exploded.groupBy("__id").agg(
        *[
            F.min(F.xxhash64("__sh", F.lit(seed))).alias(f"m{seed}")
            for seed in range(num_hashes)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
) -> DataFrame:
    """Candidate near-dup pairs via MinHash banding.

    signatures → explode into ``bands`` band-keys → self-join on identical
    band hash → distinct (id_l < id_r) pairs. The only wide ops are the
    signature aggregate and the bucket join; bucket sizes bound the join
    fan-out, so skewed buckets (boilerplate docs) are the thing to monitor
    at scale — cap bucket size or salt if needed.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    banded = sig.select(
        "__id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.col(f"m{b * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("__id", "bk.band", "bk.bucket")
    l = banded.alias("l")
    r = banded.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .select(
            F.col("l.__id").alias("id_l"), F.col("r.__id").alias("id_r")
        )
        .distinct()
    )


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, ngram: int = 3
) -> DataFrame:
    """64-bit SimHash per document: for each bit, sum ±1 over shingle
    hashes; the sign becomes the bit. Explode → one hash aggregate with 64
    conditional sums → flat bit-packing projection. Same scale shape as
    MinHash: shuffle rows = |ids|, hashing whole-stage-codegen'd.
    Returns (id_col, simhash bigint).
    """
    exploded = df.select(
        F.col(id_col).alias("__id"),
        F.explode(shingles(text_col, ngram)).alias("__sh"),
    ).select("__id", F.xxhash64("__sh").alias("__h"))
    agg = exploded.groupBy("__id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright("__h", bit).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"b{bit}")
            for bit in range(64)
        ]
    )
    packed = None
    for bit in range(64):
        # two's-complement sign bit for bit 63 (avoid bigint overflow)
        val = F.lit(-(2**63) if bit == 63 else 2**bit).cast("bigint")
        term = F.when(F.col(f"b{bit}") > 0, val).otherwise(F.lit(0).cast("bigint"))
        packed = term if packed is None else packed + term
    return agg.select(F.col("__id").alias(id_col), packed.alias("simhash"))


def ngram_jaccard(text_l, text_r, n: int = 5) -> F.Column:
    """Exact word-n-gram Jaccard similarity between two text columns."""
    a = shingles(text_l, n)
    b = shingles(text_r, n)
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))
