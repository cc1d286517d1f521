"""Round-6 batch 34 (SURVEY.md §2 multimodal / dedup): EXACT BINARY
MEDIA DEDUP — content-hash deduplication of opaque media payloads
(the byte-level first pass every multimodal corpus runs before
perceptual near-dup like q_image_dhash). Rows-only with a planted-
duplicate witness: payload synthesis PLANTS exact duplicates at a
known pattern, and every reported cluster must match its planted
family bit-for-bit — codec bytes are not ANSI-SQL-expressible, so the
witness, not an oracle, carries the check (the q_multimodal_*
discipline, extras3.py:412)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# Every 5th doc re-encodes the SAME pixels as doc_id-4 (same seed →
# same deterministic PNG bytes): planted exact duplicates.
_FAMILY = 5


@query(
    "q_media_dedup",
    oracle="""
    WITH fam AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 4 THEN doc_id - 4 ELSE doc_id END AS seed
      FROM documents
    ), cl AS (
      SELECT seed,
             CAST(COUNT(*) AS BIGINT) AS n_members,
             CAST(MIN(doc_id) AS BIGINT) AS canonical_id
      FROM fam GROUP BY seed HAVING COUNT(*) > 1
    )
    SELECT canonical_id, n_members, TRUE AS witness_ok, TRUE AS digest_ok
    FROM cl ORDER BY canonical_id
    """,
)
def q_media_dedup(spark, sf_dir):
    """EXACT BINARY DEDUP of media payloads by content hash: group by
    sha2(payload), keep the smallest doc_id as canonical, report every
    duplicate cluster. Payloads are real PNGs (operators/codecs.py)
    whose pixels derive from a SEED = doc_id rounded down to its
    family start (doc_id%5==4 re-uses doc_id-4's seed) — so the
    planted truth is known per row and the witness ``witness_ok``
    asserts cluster-by-hash ≡ cluster-by-seed: same members, same
    canonical, same size. A hash collision, a non-deterministic
    encoder byte, or a grouping bug each break it.

    Round-11 PROMOTION to a hash-exact oracle: the seed law IS the
    cluster law (dedup-by-content ≡ dedup-by-seed when synthesis is
    injective in the seed), so DuckDB derives every cluster —
    canonical id, member count — from ``doc_id%5`` arithmetic alone,
    while Spark earns it from real bytes (encode → sha2 → groupBy).
    Injectivity is now GUARANTEED, not probabilistic: the first eight
    pixels carry the seed's little-endian bytes (the pure gradient
    collided for seeds 768 apart — same w/h and pixel values mod 256 —
    which would have merged distinct families at sf0.1 and beyond).
    The non-SQL digest column hashes as a boolean shape witness
    (``digest_ok`` = 64 hex chars); a collision, encoder flake, or
    grouping bug still breaks ``witness_ok`` and with it the driver
    hash.

    Scale shape: synthesis and hashing are Arrow-batched mapInPandas /
    JVM sha2 over one pass; the dedup is ONE partial-aggregated
    groupBy on the 64-hex digest (shuffle carries doc_id + digest,
    never payload bytes — the q_dedup_normalized fingerprint
    discipline); the witness joins the hash-cluster and seed-family
    aggregates on the canonical id (both cluster-grain)."""
    from pyspark.sql.functions import pandas_udf

    from self_healing_data_pipeline_spark.operators.multimodal import (
        png_bytes_with_pixels,
    )

    def _gradient(d: int, wi: int, hi: int):
        import numpy as np

        yy, xx = np.mgrid[0:hi, 0:wi]
        px = ((yy * 7 + xx * 13 + d) % 256).astype(np.uint8)
        # seed-injective stamp: first 8 pixels = seed little-endian
        # bytes (w >= 8 by construction), so distinct seeds can NEVER
        # encode to identical bytes — the oracle's seed-family law is
        # exact, not collision-probabilistic
        px[0, :8] = np.frombuffer(
            int(d).to_bytes(8, "little"), dtype=np.uint8
        )
        return px

    def _synth(seed, w, h):
        out = []
        for s, wi, hi in zip(seed, w, h):
            out.append(
                png_bytes_with_pixels(_gradient(int(s), int(wi), int(hi)))
            )
        return pd.Series(out)

    synth = pandas_udf(_synth, "binary")

    docs = (
        read_table(spark, sf_dir, "documents")
        .select(
            F.col("doc_id"),
            (
                F.col("doc_id")
                - F.when(F.pmod("doc_id", F.lit(_FAMILY)) == _FAMILY - 1,
                         F.lit(_FAMILY - 1)).otherwise(F.lit(0))
            ).alias("seed"),
        )
        .withColumn("w", (F.col("seed") % 24 + 8).cast("int"))
        .withColumn("h", (F.col("seed") % 16 + 8).cast("int"))
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    hashed = docs.select(
        "doc_id",
        "seed",
        F.sha2(synth(F.col("seed"), F.col("w"), F.col("h")), 256).alias(
            "digest"
        ),
    )
    by_hash = hashed.groupBy("digest").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.min("doc_id").cast("bigint").alias("canonical_id"),
        F.max("doc_id").cast("bigint").alias("max_id"),
    )
    by_seed = hashed.groupBy("seed").agg(
        F.count(F.lit(1)).cast("bigint").alias("family_size"),
        F.min("doc_id").cast("bigint").alias("family_canonical"),
        F.max("doc_id").cast("bigint").alias("family_max"),
    )
    return (
        by_hash.join(
            by_seed,
            by_hash["canonical_id"] == by_seed["family_canonical"],
            "left",
        )
        .select(
            "canonical_id",
            "n_members",
            (
                (F.col("n_members") == F.col("family_size"))
                & (F.col("max_id") == F.col("family_max"))
                & (F.col("canonical_id") == F.col("seed"))
            ).alias("witness_ok"),
            F.col("digest").rlike("^[0-9a-f]{64}$").alias("digest_ok"),
        )
        .where(F.col("n_members") > 1)
        .orderBy("canonical_id")
    )
