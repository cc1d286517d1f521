"""Round-6 batch 2 (SURVEY.md §2.11): compressed-vector search, visual
near-dup detection, and compliance plumbing — product-quantized ANN
(the storage-side companion to IVF), perceptual dHash image
de-duplication over the REAL image codecs, GDPR right-to-be-forgotten
cascade erasure, and a temporal train/test split with a user-leakage
audit.

The two approximate ops are rows-only by design (codebooks and pixel
decode aren't ANSI-SQL-expressible) and carry in-row witnesses:
PQ emits per-vector reconstruction MSE plus recall-vs-exact-top-k
flags; dHash emits the planted-twin flag and the Hamming distance per
surviving pair, and a round-trip bit on every image. The erasure and
split ops are exact and oracle-checked.

Reference parity: erasure/cascade is the destructive half of the
reference's ETL writeback surface (`automated-data-catalog-&-etl/
services/pgliteService.ts:36-49` — the delegated relational store
mutates by key); the split/leakage audit extends the q_split_assign
family."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.functions.vector import dot_product
from self_healing_data_pipeline_spark.operators.similarity import (
    pq_adc_topk,
    pq_encode_with_error,
    pq_train,
)
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query("q_embedding_pq")  # rows-only: codebook compression is not SQL
def q_embedding_pq(spark, sf_dir):
    """Product-quantized ANN (Jégou et al. 2011): 64-dim float32
    vectors (256 B) compress to 8 one-byte subspace codes (32×), and
    top-k retrieval scans CODES, not vectors, via an asymmetric-
    distance lookup table — the operator that makes a billion-vector
    index fit a 100 TB corpus (IVF prunes WHICH rows to score; PQ
    shrinks WHAT is stored and scored; production stacks them).

    Spark shape: codebook training is per-(subspace, code, dim) hash
    aggregates (shuffle = dim·k partial rows, never vectors); encoding
    is one narrow Arrow kernel; ADC scoring is FULLY JVM-side — the
    query's (m×k) inner-product table broadcasts as a literal and each
    row folds it over its codes with zip_with/element_at inside
    whole-stage codegen, ending in TakeOrderedAndProject.

    Retrieval is the production two-stage shape: the ADC scan produces
    a SHORTLIST (top-50 of the compressed codes — the cheap pass over
    everything), then only the shortlist's uncompressed vectors are
    fetched for an exact inner-product RE-RANK to the final top-10 —
    at 100 TB the refine step touches 50 vectors, not a billion.

    Witnesses per row: ``recon_mse`` (the quantization-quality number
    PQ reports) and ``in_exact_topk`` (membership in the exact
    inner-product top-10 from the uncompressed vectors — the recall
    witness, same discipline as q_sim_ivf / q_sim_ann_lsh)."""
    emb = read_table(spark, sf_dir, "embeddings")
    books = pq_train(emb, m=8, k=16, iters=2)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    encoded = pq_encode_with_error(emb, books)
    shortlist = pq_adc_topk(encoded, books, list(qvec), k_top=50)
    qlit = F.array(*[F.lit(float(v)).cast("float") for v in qvec])
    reranked = (
        shortlist.join(emb.select("vec_id", "embedding"), "vec_id")
        .select(
            "vec_id",
            "adc_score",
            "__recon_mse",
            dot_product(F.col("embedding"), qlit).alias("ip"),
        )
        .orderBy(F.col("ip").desc(), F.col("vec_id").asc())
        .limit(10)
    )
    exact = (
        emb.select(
            F.col("vec_id").alias("exact_id"),
            dot_product(F.col("embedding"), qlit).alias("ip_x"),
        )
        .orderBy(F.col("ip_x").desc(), F.col("exact_id").asc())
        .limit(10)
    )
    return (
        reranked.join(
            F.broadcast(exact), reranked["vec_id"] == F.col("exact_id"), "left"
        )
        .select(
            "vec_id",
            "adc_score",
            "ip",
            F.col("__recon_mse").alias("recon_mse"),
            F.col("exact_id").isNotNull().alias("in_exact_topk"),
        )
        .orderBy(F.col("ip").desc(), F.col("vec_id").asc())
    )


@query("q_image_dhash")  # rows-only: pixel decode is not SQL
def q_image_dhash(spark, sf_dir):
    """Perceptual near-duplicate IMAGE detection: difference-hash
    (dHash) over REAL decoded pixels — the visual twin of SimHash text
    dedup, closing the multimodal dedup story (the public method used
    by image-dedup tooling: 9×8 luminance grid, 64 horizontal-gradient
    sign bits, near-dups = small Hamming distance).

    Fixtures carry no media, so every 5th document synthesizes a 36×24
    grayscale PNG of doc_id-seeded pseudo-random pixels (encoder twin
    `operators/codecs.py` — the 1-in-5 sampling bounds the
    pure-Python codec cost of FIXTURE SYNTHESIS, not of the operator,
    which is linear in images and Arrow-parallel), and every 4th
    sampled doc plants a NEAR-DUP TWIN (same pixels ±1 noise). The pipeline then runs the honest path:
    decode the PNG (real zlib/filter decode), box-sum to the 9×8 grid
    in exact integers, build the 64-bit hash, band it 4×16 bits, and
    self-join per (band, bucket) — the SimHash pigeonhole shape: a
    twin within Hamming ≤ 8 MUST agree exactly on ≥ 1 of the 4 bands.
    Candidates verify with bit_count(xor) ≤ 8, JVM-side.

    Witnesses per row: ``is_planted`` (the pair is a planted twin) and
    ``hamming``; every image also carries a decode round-trip check
    inside the kernel (a failed round trip raises — lossless PNG).
    Scale: the shuffle carries (band, 16-bit bucket, id, hash) only;
    candidate volume is Σ|bucket|², driven to ~0 for non-dup images by
    the 2^16 bucket space exactly like q_dedup_simhash_pairs."""
    from self_healing_data_pipeline_spark.operators.multimodal import (
        decode_png_pixels,
        png_bytes_with_pixels,
    )

    docs = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % 5 == 0)
    )
    schema = "img_id long, dhash long"

    def hash_batches(it):
        h, w = 24, 36  # 9×8 grid of exact 4×3 boxes
        for pdf in it:
            ids, hashes = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                rng = np.random.RandomState(d % (2**31))
                base = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
                variants = [(d * 2, base)]
                if d % 20 == 0:  # plant a near-dup twin
                    noise = np.random.RandomState((d + 777) % (2**31)).randint(
                        -1, 2, size=(h, w)
                    )
                    twin = np.clip(base.astype(np.int16) + noise, 0, 255)
                    variants.append((d * 2 + 1, twin.astype(np.uint8)))
                for img_id, px in variants:
                    # filter-0 scanlines: the all-filters round trip is
                    # q_multimodal_features' job; here the codec is the
                    # transport, not the thing under test
                    blob = png_bytes_with_pixels(
                        px[:, :, None], filters=[0] * h
                    )
                    dec = decode_png_pixels(blob)
                    dec2 = dec[:, :, 0] if dec.ndim == 3 else dec
                    if not np.array_equal(dec2, px):  # round-trip witness
                        raise AssertionError(f"PNG round trip failed {img_id}")
                    # exact integer 4×3 box sums on the 9×8 grid
                    g = (
                        dec2.astype(np.int64)
                        .reshape(8, 3, 9, 4)
                        .sum(axis=(1, 3))
                    )
                    bits = (g[:, 1:] > g[:, :-1]).astype(np.uint8)
                    hv = int.from_bytes(
                        np.packbits(bits.reshape(-1)).tobytes(), "big"
                    )
                    ids.append(img_id)
                    hashes.append(np.int64(np.uint64(hv).astype(np.int64)))
            yield pd.DataFrame({"img_id": ids, "dhash": hashes})

    sigs = docs.mapInPandas(hash_batches, schema)
    bands = sigs.select(
        "img_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("dhash"), 16 * b)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bucket"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("img_id", "dhash", "bk.band", "bk.bucket")
    r = bands.select(
        F.col("band").alias("band_r"),
        F.col("bucket").alias("bucket_r"),
        F.col("img_id").alias("img_b"),
        F.col("dhash").alias("h_b"),
    )
    pairs = (
        bands.join(
            r,
            (F.col("band") == F.col("band_r"))
            & (F.col("bucket") == F.col("bucket_r"))
            & (F.col("img_id") < F.col("img_b")),
        )
        .select(
            F.col("img_id").alias("img_a"),
            "img_b",
            F.col("dhash").alias("h_a"),
            "h_b",
        )
        .distinct()
    )
    hamming = F.expr("bit_count(h_a ^ h_b)").cast("int")
    return (
        pairs.select("img_a", "img_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= 8)
        .withColumn(
            "is_planted",
            (F.col("img_b") == F.col("img_a") + 1)
            & (F.col("img_a") % 2 == 0)
            & ((F.col("img_a") / 2).cast("long") % 20 == 0),
        )
        .orderBy("img_a", "img_b")
    )


@query(
    "q_gdpr_erasure",
    oracle="""
    WITH del AS (
      SELECT c_custkey FROM customer WHERE c_custkey % 100 = 7
    ), o_purge AS (
      SELECT o_orderkey FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM del)
    )
    SELECT * FROM (
      SELECT 'customer' AS tbl,
             CAST((SELECT COUNT(*) FROM del) AS BIGINT) AS rows_purged,
             CAST((SELECT COUNT(*) FROM customer
                   WHERE c_custkey NOT IN (SELECT c_custkey FROM del))
                  AS BIGINT) AS rows_remaining,
             CAST(0 AS BIGINT) AS orphans_after
      UNION ALL
      SELECT 'orders',
             CAST((SELECT COUNT(*) FROM o_purge) AS BIGINT),
             CAST((SELECT COUNT(*) FROM orders
                   WHERE o_orderkey NOT IN (SELECT o_orderkey FROM o_purge))
                  AS BIGINT),
             CAST((SELECT COUNT(*) FROM orders
                   WHERE o_orderkey NOT IN (SELECT o_orderkey FROM o_purge)
                     AND o_custkey IN (SELECT c_custkey FROM del))
                  AS BIGINT)
      UNION ALL
      SELECT 'lineitem',
             CAST((SELECT COUNT(*) FROM lineitem
                   WHERE l_orderkey IN (SELECT o_orderkey FROM o_purge))
                  AS BIGINT),
             CAST((SELECT COUNT(*) FROM lineitem
                   WHERE l_orderkey NOT IN (SELECT o_orderkey FROM o_purge))
                  AS BIGINT),
             CAST((SELECT COUNT(*) FROM lineitem
                   WHERE l_orderkey NOT IN (SELECT o_orderkey FROM o_purge)
                     AND l_orderkey IN (SELECT o_orderkey FROM o_purge))
                  AS BIGINT)
    ) ORDER BY tbl
    """,
)
def q_gdpr_erasure(spark, sf_dir):
    """GDPR right-to-be-forgotten CASCADE erasure audit: given a
    delete-request set (customers with ``c_custkey % 100 = 7`` — the
    deterministic stand-in for a request table), purge the customers,
    their orders, and those orders' line items, and report per table
    the rows purged, rows remaining, and — the part a compliance
    review signs off on — the ORPHAN COUNT after erasure (remaining
    rows still referencing an erased key; must be 0 by construction).

    Scale shape: the delete-request set and the derived purge-key sets
    are tiny relative to the corpus, so every membership test is a
    LEFT SEMI / LEFT ANTI join that AQE plans as a broadcast; the
    cascade is two key-propagation joins (customer→orders on custkey,
    orders→lineitem on orderkey) — no row ever carries more than a
    key. The three per-table reports reduce to 1-row frames before
    the union. Erasure-as-rewrite (anti-join + snapshot swap) is the
    write path `sources.writers` already provides; this query is the
    audit that runs before and after it."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    del_keys = cust.filter(F.col("c_custkey") % 100 == 7).select("c_custkey")
    o_purge = orders.join(
        del_keys, orders.o_custkey == del_keys.c_custkey, "left_semi"
    ).select("o_orderkey")

    def report(tbl, purged_df, remaining_df, orphan_df):
        purged = purged_df.agg(F.count(F.lit(1)).cast("bigint").alias("rows_purged"))
        remaining = remaining_df.agg(
            F.count(F.lit(1)).cast("bigint").alias("rows_remaining")
        )
        orphans = orphan_df.agg(
            F.count(F.lit(1)).cast("bigint").alias("orphans_after")
        )
        return (
            purged.crossJoin(remaining)
            .crossJoin(orphans)
            .select(
                F.lit(tbl).alias("tbl"),
                "rows_purged",
                "rows_remaining",
                "orphans_after",
            )
        )

    cust_rem = cust.join(del_keys, "c_custkey", "left_anti")
    ord_rem = orders.join(o_purge, "o_orderkey", "left_anti")
    li_purged = li.join(
        o_purge, li.l_orderkey == o_purge.o_orderkey, "left_semi"
    )
    li_rem = li.join(o_purge, li.l_orderkey == o_purge.o_orderkey, "left_anti")
    out = (
        report(
            "customer",
            del_keys,
            cust_rem,
            cust_rem.join(del_keys, "c_custkey", "left_semi"),
        )
        .unionByName(
            report(
                "orders",
                o_purge,
                ord_rem,
                ord_rem.join(
                    del_keys, F.col("o_custkey") == F.col("c_custkey"), "left_semi"
                ),
            )
        )
        .unionByName(
            report(
                "lineitem",
                li_purged,
                li_rem,
                li_rem.join(
                    o_purge, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi"
                ),
            )
        )
    )
    return out.orderBy("tbl")


@query(
    "q_split_temporal",
    oracle="""
    WITH b AS (
      SELECT MIN(EPOCH_US(ts)) AS lo, MAX(EPOCH_US(ts)) AS hi FROM events
    ), tagged AS (
      SELECT CASE WHEN EPOCH_US(ts) < lo + (hi - lo) * 4 // 5
                  THEN 'train' ELSE 'test' END AS split,
             user_id
      FROM events, b
    ), per AS (
      SELECT split, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM tagged GROUP BY split
    ), overlap AS (
      SELECT 'user_overlap' AS split, CAST(0 AS BIGINT) AS n_events,
             CAST(COUNT(*) AS BIGINT) AS n_users
      FROM (SELECT user_id FROM tagged WHERE split = 'train'
            INTERSECT
            SELECT user_id FROM tagged WHERE split = 'test')
    )
    SELECT * FROM (SELECT * FROM per UNION ALL SELECT * FROM overlap)
    ORDER BY split
    """,
)
def q_split_temporal(spark, sf_dir):
    """TEMPORAL train/test split at the 80% point of the observed time
    span, with the USER-LEAKAGE audit every temporal split needs: how
    many users appear on BOTH sides of the cut (their test events are
    not out-of-distribution future for a per-user model — the quiet
    leak temporal splits are chosen to avoid). Completes the split
    family: hash split (q_split_assign), group-leakage check
    (q_split_leakage), temporal split (here).

    Determinism: the cutoff is exact integer µs arithmetic
    (``lo + (hi−lo)·4 // 5`` — floor division mirrored cross-engine
    on non-negative spans); no floats anywhere.

    Scale shape: the (lo, hi) bounds are a 1-row broadcast; tagging is
    a narrow map; per-split counts partial-aggregate; the overlap is a
    distinct-user semi-join that shuffles user ids only."""
    ev = read_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    b = ev.agg(
        F.min(us).alias("lo"),
        F.max(us).alias("hi"),
    )
    tagged = ev.crossJoin(F.broadcast(b)).select(
        F.when(
            us < F.col("lo") + F.expr("(hi - lo) * 4 div 5"), F.lit("train")
        )
        .otherwise(F.lit("test"))
        .alias("split"),
        "user_id",
    )
    per = tagged.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )
    tr = tagged.filter(F.col("split") == "train").select("user_id").distinct()
    te = tagged.filter(F.col("split") == "test").select("user_id").distinct()
    overlap = (
        tr.join(te, "user_id", "left_semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .select(
            F.lit("user_overlap").alias("split"),
            F.lit(0).cast("bigint").alias("n_events"),
            "n_users",
        )
    )
    return per.unionByName(overlap).orderBy("split")
