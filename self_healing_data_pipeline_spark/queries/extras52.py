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


@query("q_media_dedup")  # rows-only: binary payloads, witness in-row
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
        return ((yy * 7 + xx * 13 + d) % 256).astype(np.uint8)

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
            "digest",
            "n_members",
            "canonical_id",
            (
                (F.col("n_members") == F.col("family_size"))
                & (F.col("max_id") == F.col("family_max"))
                & (F.col("canonical_id") == F.col("seed"))
            ).alias("witness_ok"),
        )
        .where(F.col("n_members") > 1)
        .orderBy("canonical_id")
    )
