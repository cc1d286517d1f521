"""Round-6 batch 2 (SURVEY.md §2.11): compressed-vector search, visual
near-dup detection, and compliance plumbing — product-quantized ANN
(the storage-side companion to IVF), perceptual dHash image
de-duplication over the REAL image codecs, GDPR right-to-be-forgotten
cascade erasure, and a temporal train/test split with a user-leakage
audit.

Both formerly-approximate ops are now HASH-EXACT oracle-backed: dHash
via the closed-form pixel law (round-11 promotion), PQ via the
seed-codebook restructure with contracted fold orders (round-12
promotion — the Lloyd training run stays priced in the key as the
``trained_improves`` witness). The erasure and split ops are exact
and oracle-checked.

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
    adc_lut_replayable,
    adc_score,
    pq_encode_replayable,
    pq_encode_with_error,
    pq_train,
)
from self_healing_data_pipeline_spark.queries.extras55 import _dot32
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


_PQ_M, _PQ_K, _PQ_SUB = 8, 16, 8  # 64-dim → 8 subspaces × 8 dims


def _pq_oracle() -> str:
    """Full SQL replay of the SEED-codebook PQ retrieval (round-12
    promotion, the q_sim_ivf technique): seed codebooks are the 16
    lowest-id vectors resliced — pure arithmetic, no Lloyd aggregate —
    so encoding (argmin of sequential-fold squared L2 per subspace),
    the ADC lookup table, the code fold, the shortlist, the float32
    re-rank and the exact top-10 witness are all DuckDB-derivable.
    Fold orders mirror pq_encode_replayable / adc_lut_replayable /
    adc_score exactly (left folds over IEEE doubles)."""
    m, k, sub = _PQ_M, _PQ_K, _PQ_SUB
    return f"""
    WITH q AS (
      SELECT embedding AS qv,
             list_transform(embedding, v -> CAST(v AS DOUBLE)) AS qd
      FROM embeddings WHERE vec_id = 0
    ), ed AS (
      SELECT vec_id, embedding,
             list_transform(embedding, v -> CAST(v AS DOUBLE)) AS x
      FROM embeddings
    ), seeds AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, x AS cx
      FROM (SELECT vec_id, x FROM ed ORDER BY vec_id LIMIT {k})
    ), sp AS (
      SELECT CAST(i AS INT) AS sp FROM range(0, {m}) t(i)
    ), d2 AS (
      SELECT e.vec_id, s.sp, c.code,
             list_reduce(
               list_transform(range(1, {sub + 1}),
                 d -> (e.x[s.sp * {sub} + d] - c.cx[s.sp * {sub} + d])
                      * (e.x[s.sp * {sub} + d] - c.cx[s.sp * {sub} + d])),
               (a, b) -> a + b) AS dist2
      FROM ed e CROSS JOIN sp s CROSS JOIN seeds c
    ), codes AS (
      SELECT vec_id, sp, code, dist2 FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, sp
                   ORDER BY dist2 ASC, code ASC) AS rn
        FROM d2) WHERE rn = 1
    ), recon AS (
      SELECT vec_id,
             list_reduce(list(dist2 ORDER BY sp), (a, b) -> a + b)
               / {m * sub} AS recon_mse
      FROM codes GROUP BY vec_id
    ), lut AS (
      SELECT s.sp, c.code,
             list_reduce(
               list_transform(range(1, {sub + 1}),
                 d -> q.qd[s.sp * {sub} + d] * c.cx[s.sp * {sub} + d]),
               (a, b) -> a + b) AS ipn
      FROM sp s CROSS JOIN seeds c CROSS JOIN q
    ), adc AS (
      SELECT co.vec_id,
             list_reduce(list(l.ipn ORDER BY co.sp), (a, b) -> a + b)
               AS adc_score
      FROM codes co JOIN lut l ON l.sp = co.sp AND l.code = co.code
      GROUP BY co.vec_id
    ), shortlist AS (
      SELECT vec_id, adc_score FROM adc
      ORDER BY adc_score DESC, vec_id ASC LIMIT 50
    ), reranked AS (
      SELECT sl.vec_id, sl.adc_score, r.recon_mse,
             {_dot32('e.embedding', 'q.qv')} AS ip
      FROM shortlist sl
      JOIN ed e USING (vec_id)
      JOIN recon r USING (vec_id)
      CROSS JOIN q
      ORDER BY ip DESC, sl.vec_id ASC LIMIT 10
    ), exact AS (
      SELECT vec_id AS exact_id FROM (
        SELECT e.vec_id,
               ROW_NUMBER() OVER (
                 ORDER BY {_dot32('e.embedding', 'q.qv')} DESC,
                          e.vec_id) AS rn
        FROM embeddings e CROSS JOIN q) WHERE rn <= 10
    )
    SELECT rr.vec_id, rr.adc_score, rr.ip, rr.recon_mse,
           (x.exact_id IS NOT NULL) AS in_exact_topk,
           TRUE AS trained_improves
    FROM reranked rr LEFT JOIN exact x ON rr.vec_id = x.exact_id
    ORDER BY rr.ip DESC, rr.vec_id ASC
    """


@query("q_embedding_pq", oracle=_pq_oracle())
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

    Round-12 promotion to a HASH-EXACT oracle (the q_kmeans_assign
    restructure + the q_sim_ivf full-SQL-replay technique): the
    hash-gated retrieval path runs on the deterministic SEED codebooks
    (the 16 lowest-id vectors resliced — ``pq_train(iters=0)``), whose
    encoding/LUT/score arithmetic uses contracted sequential fold
    orders (``pq_encode_replayable`` / ``adc_lut_replayable``) that the
    DuckDB oracle replays bit-for-bit. The Lloyd TRAINING run stays in
    the key — this remains the priced codebook-training query — but
    its float outputs ride as the boolean ``trained_improves`` witness
    (two Lloyd iterations must not worsen the corpus mean recon MSE;
    Lloyd's objective is monotone non-increasing) instead of being
    hash-gated: the trained means come from cross-partition float
    aggregates whose merge order Spark does not contract.

    Witnesses per row: ``recon_mse`` (seed-book quantization quality,
    hash-exact), ``in_exact_topk`` (membership in the exact
    inner-product top-10 — the recall witness, same discipline as
    q_sim_ivf), and ``trained_improves`` (expected TRUE)."""
    emb = read_table(spark, sf_dir, "embeddings")
    seed_books = pq_train(emb, m=_PQ_M, k=_PQ_K, iters=0)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    encoded = pq_encode_replayable(emb, seed_books)
    lut = adc_lut_replayable(seed_books, list(qvec))
    lut_col = F.array(
        *[F.array(*[F.lit(v) for v in row]) for row in lut]
    )
    shortlist = (
        encoded.select(
            "vec_id",
            adc_score(F.col("__codes"), lut_col).alias("adc_score"),
            "__recon_mse",
        )
        .orderBy(F.col("adc_score").desc(), F.col("vec_id").asc())
        .limit(50)
    )
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
    # The priced training run: 2 Lloyd iterations, then the corpus mean
    # recon MSE under the trained books vs the seed books. Scalar
    # aggregates (one double each) — boolean-gated, not hash-gated.
    trained_books = pq_train(emb, m=_PQ_M, k=_PQ_K, iters=2)
    trained_mse = pq_encode_with_error(emb, trained_books).agg(
        F.avg("__recon_mse").alias("t_mse")
    )
    seed_mse = encoded.agg(F.avg("__recon_mse").alias("s_mse"))
    witness = (
        trained_mse.crossJoin(seed_mse)
        .select(
            (F.col("t_mse") <= F.col("s_mse") * 1.001).alias(
                "trained_improves"
            )
        )
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
        .crossJoin(F.broadcast(witness))
        .orderBy(F.col("ip").desc(), F.col("vec_id").asc())
    )


#: Closed-form pixel law for the dHash fixture (round-11 promotion —
#: the q_scan_binaryfile trick): base luminance and twin noise are
#: Knuth-multiplicative-hash mixes of (doc_id, row, col) that BOTH
#: engines can evaluate in exact 64-bit integer arithmetic, so the
#: DuckDB oracle derives every dhash bit straight from the law while
#: the Spark path still earns it the honest way (PNG encode -> real
#: zlib/filter decode -> box sums). All terms stay < 2^63.
_DHASH_H, _DHASH_W = 24, 36
# SQUARED mix (middle-square family), not a linear-times-constant one:
# with v = top8((s * K) % 2^32), two docs' s differ by a CONSTANT, so
# after the multiply the pixel deltas are near-constant and CANCEL in
# the dhash gradient compare — every image near-dups every other
# (measured: 880 pairs at sf0.001). Squaring makes the cross-doc delta
# 2*s*C + C^2 — varying with s — and a 250-image simulation yields
# exactly the 50 planted pairs and zero accidental ones.
# The square is computed mod 2^32 AFTER reducing the mix mod 2^32 —
# mathematically identical ((s*s) mod m == ((s mod m)*(s mod m)) mod m)
# but total for any fixture doc_id: squaring the raw mix overflows
# BIGINT/int64 once s > isqrt(2^63-1) = 3,037,000,499, i.e. doc_id >
# 28,662 for the noise mix (104729*d dominates) — numpy would wrap
# silently while DuckDB raises (r11 advisor). Reduced, the square is
# < 2^64 and exact in HUGEINT here / uint64 in the Spark kernel.
_PX_LAW = (
    "CAST((CAST((d * 7919 + r * 104729 + c * 1299709 + 12345)"
    " % 4294967296 AS HUGEINT)"
    " * ((d * 7919 + r * 104729 + c * 1299709 + 12345) % 4294967296))"
    " % 4294967296 AS BIGINT) // 16777216"
)
_NOISE_LAW = (
    "(CAST((CAST((d * 104729 + r * 7919 + c * 999331 + 54321)"
    " % 4294967296 AS HUGEINT)"
    " * ((d * 104729 + r * 7919 + c * 999331 + 54321) % 4294967296))"
    " % 4294967296 AS BIGINT) % 3) - 1"
)
# 9 uneven bands over 64 bits (8x7 + 1x8): 8 differing bits across 9
# bands leave >= 1 band clean by pigeonhole, so the banded join is
# LOSSLESS at Hamming <= 8 and the oracle may brute-force all pairs.
_DHASH_BANDS = [(b * 7, 7) for b in range(8)] + [(56, 8)]


@query(
    "q_image_dhash",
    oracle=f"""
    WITH imgs AS (
      SELECT doc_id AS d, doc_id * 2 AS img_id, 0 AS is_twin
      FROM documents WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id, doc_id * 2 + 1, 1
      FROM documents WHERE doc_id % 20 = 0
    ), px AS (
      SELECT img_id,
             r, c,
             CASE WHEN is_twin = 0 THEN {_PX_LAW}
                  ELSE LEAST(255, GREATEST(0, ({_PX_LAW}) + ({_NOISE_LAW})))
             END AS v
      FROM imgs,
           generate_series(0, {_DHASH_H - 1}) AS tr(r),
           generate_series(0, {_DHASH_W - 1}) AS tc(c)
    ), grid AS (
      SELECT img_id, r // 3 AS gr, c // 4 AS gc, SUM(v) AS s
      FROM px GROUP BY img_id, r // 3, c // 4
    ), bits AS (
      SELECT a.img_id, a.gr, a.gc,
             CASE WHEN b.s > a.s THEN 1 ELSE 0 END AS bit
      FROM grid a
      JOIN grid b ON a.img_id = b.img_id AND a.gr = b.gr
                 AND b.gc = a.gc + 1
    ), pairs AS (
      SELECT x.img_id AS img_a, y.img_id AS img_b,
             CAST(SUM(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) AS INT)
               AS hamming
      FROM bits x
      JOIN bits y ON x.gr = y.gr AND x.gc = y.gc AND x.img_id < y.img_id
      GROUP BY x.img_id, y.img_id
    )
    SELECT img_a, img_b, hamming,
           (img_b = img_a + 1 AND img_a % 2 = 0
            AND (img_a // 2) % 20 = 0) AS is_planted
    FROM pairs WHERE hamming <= 8 ORDER BY img_a, img_b
    """,
)
def q_image_dhash(spark, sf_dir):
    """Perceptual near-duplicate IMAGE detection: difference-hash
    (dHash) over REAL decoded pixels — the visual twin of SimHash text
    dedup, closing the multimodal dedup story (the public method used
    by image-dedup tooling: 9×8 luminance grid, 64 horizontal-gradient
    sign bits, near-dups = small Hamming distance).

    Fixtures carry no media, so every 5th document synthesizes a 36×24
    grayscale PNG (encoder twin `operators/codecs.py` — the 1-in-5
    sampling bounds the pure-Python codec cost of FIXTURE SYNTHESIS,
    not of the operator, which is linear in images and Arrow-parallel),
    and every 4th sampled doc plants a NEAR-DUP TWIN (same pixels ±1
    noise). Round-11 PROMOTION to hash-exact: pixels follow the
    CLOSED-FORM integer law ``_PX_LAW``/``_NOISE_LAW`` (a multiplicative
    -hash mix both engines evaluate exactly), so the DuckDB oracle
    derives every grid sum, dhash bit, and Hamming distance from the
    law alone — while the Spark path still runs the honest bytes:
    encode the PNG, decode it (real zlib/filter decode), box-sum to the
    9×8 grid in exact integers, build the 64-bit hash, band it into 9
    uneven bands (8×7 + 1×8 bits), and self-join per (band, bucket).
    Pigeonhole makes the banding LOSSLESS at the Hamming ≤ 8 gate
    (8 differing bits across 9 bands leave ≥ 1 band agreeing exactly),
    so banded-engine ≡ brute-force-oracle is an identity, not a recall
    bet — the same proof that promoted q_dedup_simhash_pairs. A codec
    or box-sum defect now breaks the driver hash, not just an in-row
    witness.

    Witnesses per row: ``is_planted`` (the pair is a planted twin) and
    ``hamming``; every image also carries a decode round-trip check
    inside the kernel (a failed round trip raises — lossless PNG).
    Scale: the shuffle carries (band, ≤8-bit bucket, id, hash) only;
    candidate volume is Σ|bucket|² per band — at corpus scale the
    128/256-value bucket space is the first stage of the standard
    multi-probe cascade (widen bands or add a second LSH level before
    the verify join; the verify gate itself stays bit_count(xor) ≤ 8,
    JVM-side)."""
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
        h, w = _DHASH_H, _DHASH_W  # 9×8 grid of exact 4×3 boxes
        rr, cc = np.mgrid[0:h, 0:w]
        rr = rr.astype(np.int64)
        cc = cc.astype(np.int64)
        for pdf in it:
            ids, hashes = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                # the closed-form laws the oracle mirrors (_PX_LAW /
                # _NOISE_LAW): reduce mod 2^32, square in uint64 —
                # (s mod 2^32)^2 < 2^64 so the product is exact, and
                # identical mod 2^32 to s*s for ANY doc_id (the raw
                # square overflows int64 past doc_id 28,662)
                s = d * 7919 + rr * 104729 + cc * 1299709 + 12345
                sm = (s % 2**32).astype(np.uint64)
                base = ((sm * sm) % 2**32 // 2**24).astype(np.uint8)
                variants = [(d * 2, base)]
                if d % 20 == 0:  # plant a near-dup twin
                    t = d * 104729 + rr * 7919 + cc * 999331 + 54321
                    tm = (t % 2**32).astype(np.uint64)
                    noise = (((tm * tm) % 2**32) % 3).astype(np.int64) - 1
                    twin = np.clip(base.astype(np.int64) + noise, 0, 255)
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
    # 9 uneven bands (8x7 + 1x8 bits): lossless at Hamming <= 8 by
    # pigeonhole, so the banded join returns EXACTLY the brute-force
    # pair set the oracle computes. Bit i (big-endian packbits) has
    # weight 2^(63-i); band at (start, width) covers bits
    # [start, start+width) -> shift right by 64 - start - width.
    bands = sigs.select(
        "img_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(
                            F.col("dhash"), 64 - start - width
                        )
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bucket"),
                    )
                    for b, (start, width) in enumerate(_DHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("img_id", "dhash", "bk.band", "bk.bucket")
    # Shared LSH skeleton with the LOUD bucket cap (round-11): the
    # 9-band split leaves only 7/8-bit bucket spaces, so a degenerate
    # corpus (many near-identical images) can concentrate a bucket;
    # the promoted COMPLETE-pairs oracle makes silence unacceptable —
    # on_oversize="error" fails the job (widen bands / raise the cap)
    # exactly like q_dedup_simhash_pairs.
    from self_healing_data_pipeline_spark.operators.dedup import (
        pairs_within_buckets,
    )

    pairs = pairs_within_buckets(
        bands.select(F.col("img_id").alias("__id"), "dhash", "band", "bucket"),
        ["band", "bucket"],
        max_bucket=10_000,
        payload="dhash",
        on_oversize="error",
    ).select(
        F.col("id_l").alias("img_a"),
        F.col("id_r").alias("img_b"),
        F.col("dhash_l").alias("h_a"),
        F.col("dhash_r").alias("h_b"),
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
