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

Signature computation (shingle → hash → min/sign-pack) is an Arrow-batched
numpy kernel, NOT Catalyst higher-order functions: Spark's array
``transform``/``aggregate`` lambdas are interpreted per element (measured
~60k shingle evals/s — pathological), while the vectorized kernel is a
narrow per-row map with no shuffle that runs at millions of shingles/s per
core. Banding, bucket joins, and verification stay JVM-side. Base hashing
is pandas' vectorized SipHash (fixed key) + affine re-hash — deterministic
across runs and machines (never Python's builtin ``hash``), and one C call
per Arrow batch instead of one digest call per shingle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


#: DuckDB twin of :func:`normalize_text` — THE oracle-side copy of the
#: normalization contract; query modules import this instead of
#: re-declaring it so engine and oracle can never drift.
NORMALIZE_TEXT_SQL = "TRIM(REGEXP_REPLACE(LOWER({c}), '[^a-z0-9]+', ' ', 'g'))"


def normalize_text(col) -> F.Column:
    """Deterministic normalization: lowercase, collapse non-alphanumerics
    to single spaces, trim. SQL twin: :data:`NORMALIZE_TEXT_SQL`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


def dedup_exact(df: DataFrame, keys: list[str], order_by: list) -> DataFrame:
    """Exact dedup keeping a deterministic representative per key group
    (delegates to the single keep-first implementation)."""
    from self_healing_data_pipeline_spark.operators.windows import keep_first

    return keep_first(df, keys, order_by)


def shingles(col, n: int = 5) -> F.Column:
    """Word n-gram shingle array from normalized text (distinct
    shingles; a doc with ≤n tokens yields its whole token join, and an
    empty doc the empty string — the _py_shingles contract).

    LINEAR form (round-10 --longdoc fix): the original
    ``transform(sequence(0, k-1), i -> slice(toks, i+1, n))`` placed
    the computed ``toks`` (a regex split) inside the lambda BODY, and a
    non-lambda-variable subexpression there re-evaluates PER ELEMENT —
    O(tokens²) per document (q_dedup_jaccard_prefix did not finish in
    10 min on the 100-300 KB long-doc tier; the same pathology measured
    167 s on q_doc_chunks' rejected rewrite). The chain below builds
    shingle *i* by n−1 ``zip_with`` steps against 1..n−1-shifted copies
    of the token array: HOF ARGUMENTS are evaluated once per row (the
    lambdas touch only their element pair), so the whole construction
    is O(n · tokens) per doc. ``concat_ws`` skips the NULLs zip_with
    pads at the tail, so trailing elements hold short joins — sliced
    off to the exact ``greatest(size − n + 1, 1)`` prefix the original
    emitted. Output arrays are element-identical to the old form,
    including NULL text: the text coalesces to '' up front so a NULL
    doc yields ``['']`` exactly like ``_py_shingles(None)`` (review
    finding — the bare zip_with chain would propagate NULL through the
    array ops and silently DROP null-text docs from the Catalyst-side
    set-similarity queries while the Arrow kernels still signed them)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(normalize_text(F.coalesce(c, F.lit(""))), " ")
    chain = toks
    for j in range(1, n):
        chain = F.zip_with(
            chain,
            # length clamps to >=1: slice rejects 0 lengths, and a
            # start past the array end already yields the empty array
            F.slice(toks, j + 1, F.greatest(F.size(toks) - j, F.lit(1))),
            lambda x, y: F.concat_ws(" ", x, y),
        )
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    return F.array_distinct(F.slice(chain, 1, k))


def shingle_exploded(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    out_col: str = "sh",
) -> DataFrame:
    """(id, shingle) grain: each doc's DISTINCT word n-gram shingles,
    one row per (doc, shingle). The single source of the explode used
    by every set-similarity query, so the normalization/shingling
    constants cannot drift between them."""
    return docs.select(
        id_col, F.explode(shingles(text_col, n)).alias(out_col)
    ).distinct()


def shingle_grain(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    sh_col: str = "sh",
) -> DataFrame:
    """(doc_id, sh, df, s): the shingle grain annotated with shingle
    document frequency ``df`` and per-doc set size ``s``.

    Scale shape (shared by all prefix-filter consumers): df and s
    attach as COUNT windows over their own partition keys — two
    exchanges of the shingle-grain total (hash(sh), then hash(doc_id),
    the latter reused by the prefix rank), instead of the
    groupBy-then-join-back form's five. Shuffles carry each shingle
    string at most twice."""
    sh = shingle_exploded(docs, id_col, text_col, n, sh_col)
    return sh.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy(sh_col))
    ).withColumn(
        "s", F.count(F.lit(1)).over(Window.partitionBy(id_col))
    )


def prefix_rows(
    grain: DataFrame,
    num: int,
    den: int,
    id_col: str = "doc_id",
    sh_col: str = "sh",
) -> DataFrame:
    """PPJoin prefix rows for threshold num/den over a
    :func:`shingle_grain` frame: keep each doc's
    ``s - ceil(num/den * s) + 1`` rarest shingles under the global
    rare-first (df, sh) order — two sets with J >= num/den (or
    containment >= num/den on the contained side) MUST share a prefix
    element, so the prefix-grain join loses no true pair.

    ceil is the EXACT integer ``(num*s + den-1) div den`` — a float
    ``num/den * s`` rounds up at multiples of den and would silently
    shrink the prefix (= false negatives, the one thing an exact join
    must never have)."""
    wrank = Window.partitionBy(id_col).orderBy("df", sh_col)
    ceil_ts = F.floor(
        (F.lit(num) * F.col("s") + F.lit(den - 1)) / F.lit(den)
    )
    return (
        grain.withColumn("rn", F.row_number().over(wrank))
        .where(F.col("rn") <= F.col("s") - ceil_ts + 1)
        .select(id_col, sh_col)
    )


def shingle_sets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """(doc_id, shs): each doc's sorted distinct shingle ARRAY — the
    verification side of the prefix-filter joins (array_intersect /
    array_union on candidate pairs only)."""
    return docs.select(
        id_col, F.array_sort(shingles(text_col, n)).alias("shs")
    )


import re as _re

_NORM_RE = _re.compile(r"[^a-z0-9]+")


def _py_shingles(text: str, n: int) -> set[str]:
    """Python twin of ``shingles`` (same normalization, distinct n-grams)."""
    toks = _NORM_RE.sub(" ", (text or "").lower()).strip().split()
    if len(toks) <= n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _batch_shingle_hashes(
    texts: pd.Series, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized base hashing for a whole Arrow batch: one deterministic
    64-bit hash per distinct shingle, across all docs at once.

    Returns ``(hashes, offsets)``: ``hashes`` concatenates each doc's
    distinct-shingle hashes in doc order; doc *i* owns
    ``hashes[offsets[i]:offsets[i+1]]``. ``pd.util.hash_array`` is
    SipHash-1-3 with a fixed key — stable across processes, machines, and
    partitionings (unlike builtin ``hash``), and a single C call replaces
    per-shingle Python digest calls (the former hot spot of signature
    computation)."""
    all_sh: list[str] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        sh = _py_shingles(t, n)
        counts[i] = len(sh)
        all_sh.extend(sh)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    if not all_sh:
        return np.empty(0, dtype=np.uint64), offsets
    hashes = pd.util.hash_array(
        np.asarray(all_sh, dtype=object), categorize=False
    ).astype(np.uint64)
    return hashes, offsets


def _minhash_params(num_hashes: int, seed: int = 42):
    """Affine re-hash parameters (odd multipliers, uint64 wraparound)."""
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(1, 2**63, size=num_hashes, dtype=np.uint64) * 2 + 1
    b = rng.integers(0, 2**63, size=num_hashes, dtype=np.uint64)
    return a, b


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    shingle_n: int = 5,
) -> DataFrame:
    """MinHash signatures: per doc, min over shingles of ``num_hashes``
    affine re-hashes of one base hash per shingle.

    Arrow-batched numpy kernel — narrow map, no shuffle; hashing cost is
    one blake2b per distinct shingle plus a (num_hashes × shingles) uint64
    GEMM-like min-reduce. Returns (``__id``, sig array<bigint>).
    """
    a, b = _minhash_params(num_hashes)

    @pandas_udf("array<long>")
    def sig_udf(texts: pd.Series) -> pd.Series:
        hs_all, offs = _batch_shingle_hashes(texts, shingle_n)
        out = []
        for i in range(len(texts)):
            hs = hs_all[offs[i] : offs[i + 1]]
            if hs.size == 0:
                out.append(np.zeros(num_hashes, dtype=np.int64))
                continue
            mins = (a[:, None] * hs[None, :] + b[:, None]).min(axis=1)
            out.append(mins.view(np.int64))
        return pd.Series(out)

    return df.select(
        F.col(id_col).alias("__id"), sig_udf(F.col(text_col)).alias("__sig")
    )


def pairs_within_buckets(
    banded: DataFrame,
    bucket_cols: list[str],
    max_bucket: int,
    payload: str | None = None,
    on_oversize: str = "drop",
) -> DataFrame:
    """Shared LSH-skeleton tail: group rows by bucket, emit all in-bucket
    (id_l < id_r) pairs, distinct.

    ``banded`` must have an ``__id`` column plus ``bucket_cols``;
    ``payload`` optionally names one extra column carried onto both sides
    (as ``<payload>_l`` / ``<payload>_r``). Buckets above ``max_bucket``
    (degenerate collisions — would emit O(size²) pairs) are handled per
    ``on_oversize``: ``"drop"`` (default — the probabilistic-LSH recall
    trade, bounded worst case) silently skips them; ``"error"`` fails
    the JOB via an in-plan ``assert_true`` (a filter predicate, so
    column pruning can't elide it) — the mode for callers whose
    CONTRACT asserts a complete pair set (q_dedup_simhash_pairs'
    lossless pigeonhole): incompleteness must be loud, never a silent
    recall loss the oracle would contradict. One shuffle; pair
    generation is an array transform over small, capped buckets.
    """
    if on_oversize not in ("drop", "error"):
        raise ValueError(f"on_oversize must be 'drop' or 'error', got {on_oversize!r}")
    if payload is None:
        agg_member = F.sort_array(F.collect_list(F.col("__id"))).alias("members")
        pair_struct = "struct(x AS id_l, y AS id_r)"
        out_cols = ["p.id_l", "p.id_r"]
    else:
        agg_member = F.sort_array(
            F.collect_list(F.struct(F.col("__id").alias("id"), F.col(payload)))
        ).alias("members")
        pair_struct = (
            f"struct(x.id AS id_l, y.id AS id_r,"
            f" x.{payload} AS {payload}_l, y.{payload} AS {payload}_r)"
        )
        out_cols = ["p.id_l", "p.id_r", f"p.{payload}_l", f"p.{payload}_r"]
    pair_expr = (
        "flatten(transform(members, (x, i) ->"
        " transform(slice(members, i + 2, size(members) - i - 1),"
        f" y -> {pair_struct})))"
    )
    grouped = banded.groupBy(*bucket_cols).agg(agg_member)
    if on_oversize == "error":
        grouped = grouped.filter(
            F.assert_true(
                F.size("members") <= max_bucket,
                F.lit(
                    f"LSH bucket exceeds max_bucket={max_bucket}: the "
                    "complete-pairs contract would silently lose pairs; "
                    "widen the bands or raise the cap"
                ),
            ).isNull()
        )
        buckets = grouped.filter(F.size("members") > 1)
    else:
        buckets = grouped.filter(
            (F.size("members") > 1) & (F.size("members") <= max_bucket)
        )
    return (
        buckets.select(F.explode(F.expr(pair_expr)).alias("p"))
        .select(*out_cols)
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 5,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Candidate near-dup pairs via MinHash banding.

    signatures → explode into ``bands`` band-keys → groupBy (band, bucket)
    collecting the id list → generate in-bucket pairs → distinct.
    One signature pass and ONE shuffle (the bucket groupBy) — no self-join,
    so the signature UDF is not evaluated twice. Buckets larger than
    ``max_bucket`` (degenerate boilerplate collisions — would produce
    O(size²) pairs) are dropped; at 100 TB that cap is what keeps the
    worst-case bounded. Pair generation inside a bucket uses array HOFs,
    fine because bucket sizes are capped.
    """
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands}); "
            "trailing signature values would silently be ignored"
        )
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
                                F.col("__sig").getItem(b * rows_per_band + r)
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("__id", "bk.band", "bk.bucket")
    return pairs_within_buckets(banded, ["band", "bucket"], max_bucket)


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, ngram: int = 3
) -> DataFrame:
    """64-bit SimHash per document: for each bit, sum ±1 over shingle
    hashes; the sign becomes the bit.

    Same Arrow-batched kernel shape as MinHash: per doc, unpack shingle
    hashes to a (shingles × 64) ±1 matrix, column-sum, sign, bit-pack —
    all numpy, narrow map, no shuffle. Returns (id_col, simhash bigint).
    """
    bit_positions = np.arange(64, dtype=np.uint64)

    @pandas_udf("long")
    def sim_udf(texts: pd.Series) -> pd.Series:
        hs_all, offs = _batch_shingle_hashes(texts, ngram)
        out = np.zeros(len(texts), dtype=np.int64)
        for i in range(len(texts)):
            hs = hs_all[offs[i] : offs[i + 1]]
            if hs.size == 0:
                continue
            bits = ((hs[:, None] >> bit_positions[None, :]) & 1).astype(np.int64)
            contrib = (2 * bits - 1).sum(axis=0)
            sign_bits = (contrib > 0).astype(np.uint64)
            packed = (sign_bits << bit_positions).sum(dtype=np.uint64)
            out[i] = np.asarray([packed], dtype=np.uint64).view(np.int64)[0]
        return pd.Series(out)

    return df.select(
        F.col(id_col), sim_udf(F.col(text_col)).alias("simhash")
    )


def simhash_signatures_md5(
    df: DataFrame, id_col: str, text_col: str, ngram: int = 3
) -> DataFrame:
    """64-bit SimHash with an md5-derived term hash — the oracle-portable
    twin of :func:`simhash_signatures` (round-10 promotion of
    ``q_dedup_simhash``).

    Same algorithm (per bit, sum ±1 over shingle-hash bits; sign becomes
    the bit), but the base hash is the first 16 hex digits of
    ``md5(shingle)`` — an algorithm DuckDB shares bit-for-bit — split as
    two 32-bit halves so every intermediate stays in signed-BIGINT range
    (bits 0-31 from hex chars 9-16, bits 32-63 from chars 1-8 -- i.e.
    the big-endian first 8 md5 bytes). Same Arrow-batched kernel shape
    as :func:`simhash_signatures` -- narrow map, NO shuffle; the only
    difference is the base hash (md5 instead of SipHash). An earlier
    all-JVM draft (64 partial-aggregated sign-sum columns over the
    exploded shingle grain) measured 9x slower at sf0.1 -- 64 aggregate
    exprs blow the codegen budget -- and was dropped for this form
    before commit. SQL twin: :func:`simhash_md5_sql`.
    """
    import hashlib

    bit_positions = np.arange(64, dtype=np.uint64)

    @pandas_udf("long")
    def sim_udf(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, text in enumerate(texts):
            shs = _py_shingles(text, ngram)
            if not shs:
                continue
            hs = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.md5(s.encode("utf-8")).digest()[:8], "big"
                    )
                    for s in shs
                ),
                dtype=np.uint64,
                count=len(shs),
            )
            bits = ((hs[:, None] >> bit_positions[None, :]) & 1).astype(
                np.int64
            )
            contrib = (2 * bits - 1).sum(axis=0)
            sign_bits = (contrib > 0).astype(np.uint64)
            packed = (sign_bits << bit_positions).sum(dtype=np.uint64)
            out[i] = np.asarray([packed], dtype=np.uint64).view(np.int64)[0]
        return pd.Series(out)

    return df.select(
        F.col(id_col), sim_udf(F.col(text_col)).alias("simhash")
    )


def simhash_md5_sql(table: str = "documents", ngram: int = 3) -> str:
    """DuckDB twin of :func:`simhash_signatures_md5`: same shingles, same
    md5 halves, same sign-sum, same packing (bit 63's ``1 << 63``
    overflows DuckDB's checked BIGINT shift, so that term is the
    two's-complement literal)."""
    norm = NORMALIZE_TEXT_SQL.format(c="text")
    k = ngram - 1
    sums = ",\n             ".join(
        f"SUM((({'lo' if b < 32 else 'hi'} >> {b % 32}) & 1) * 2 - 1)"
        f" AS s{b}"
        for b in range(64)
    )
    pack_terms = " | ".join(
        (
            f"(CASE WHEN s{b} > 0 THEN (-9223372036854775807 - 1) "
            "ELSE 0 END)"
            if b == 63
            else f"(CASE WHEN s{b} > 0 THEN (1::BIGINT << {b}) ELSE 0 END)"
        )
        for b in range(64)
    )
    return f"""
    WITH sh AS (
      SELECT DISTINCT doc_id,
             ARRAY_TO_STRING(a[CAST(i AS INT):CAST(i AS INT) + {k}], ' ')
               AS sh
      FROM (
        SELECT doc_id, a,
               UNNEST(GENERATE_SERIES(1, GREATEST(LEN(a) - {k}, 1))) AS i
        FROM (SELECT doc_id, STRING_SPLIT({norm}, ' ') AS a FROM {table})
      )
    ), grain AS (
      SELECT doc_id,
             CAST('0x' || SUBSTR(MD5(sh), 1, 8) AS BIGINT) AS hi,
             CAST('0x' || SUBSTR(MD5(sh), 9, 8) AS BIGINT) AS lo
      FROM sh
    ), sums AS (
      SELECT doc_id,
             {sums}
      FROM grain GROUP BY doc_id
    )
    SELECT doc_id, CAST({pack_terms} AS BIGINT) AS simhash FROM sums
    """


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    ngram: int = 3,
    max_bucket: int = 10_000,
    use_md5: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash: all (id_l, id_r, hamming) with Hamming
    distance ≤ ``max_hamming``.

    Pigeonhole banding: split the low ``(max_hamming + 1) · width`` bits
    into ``max_hamming + 1`` bands — any pair within the distance budget
    must agree exactly on ≥1 band (differences in unbanded high bits break
    zero bands, so recall is preserved even though 64 may not divide
    evenly), then grouping on (band, band-bits) finds every such pair with
    one shuffle and NO O(n²) compare. Final popcount (bit_count of XOR,
    JVM, over ALL 64 bits) verifies candidates exactly.

    Because the banding is a pigeonhole (not probabilistic MinHash-style
    banding), the pair set is COMPLETE below ``max_hamming`` whenever no
    bucket exceeds ``max_bucket``: with ``use_md5=True`` the signature is
    the md5-derived twin (:func:`simhash_signatures_md5`) DuckDB can
    replay, so an oracle may assert the full pair set by exact popcount
    self-join without over-claiming recall.
    """
    if not 0 <= max_hamming <= 31:
        # width = 64 // (h+1) must stay ≥ 2 for bands to discriminate
        raise ValueError(f"max_hamming must be in [0, 31], got {max_hamming}")
    n_bands = max_hamming + 1
    width = 64 // n_bands
    sig_fn = simhash_signatures_md5 if use_md5 else simhash_signatures
    sig = sig_fn(df, id_col, text_col, ngram)
    # The md5 form backs a COMPLETE-pairs oracle, so a capped bucket
    # must fail loudly instead of silently losing pairs (review
    # finding: 7-bit bands have 128 values — oversize is guaranteed at
    # large n, where the fix is wider bands, not silence).
    on_oversize = "error" if use_md5 else "drop"
    banded = sig.select(
        F.col(id_col).alias("__id"),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        # band b = bits [b*width, (b+1)*width); bits above
                        # n_bands*width stay unbanded (recall unaffected —
                        # see docstring) but ARE counted in the verify
                        F.shiftrightunsigned("simhash", b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bits"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("__id", "simhash", "bk.band", "bk.bits")
    cand = pairs_within_buckets(
        banded,
        ["band", "bits"],
        max_bucket,
        payload="simhash",
        on_oversize=on_oversize,
    )
    ham = F.bit_count(F.col("simhash_l").bitwiseXOR(F.col("simhash_r")))
    return (
        cand.select("id_l", "id_r", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard(text_l, text_r, n: int = 5) -> F.Column:
    """Exact word-n-gram Jaccard similarity between two text columns.

    Pure-Catalyst form (HOF shingling) — oracle-friendly but interpreted
    lambda evaluation makes it O(tokens) slow per row; prefer
    :func:`ngram_jaccard_udf` on any volume."""
    a = shingles(text_l, n)
    b = shingles(text_r, n)
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def ngram_jaccard_udf(n: int = 5):
    """Arrow-batched twin of :func:`ngram_jaccard` (identical results).

    Set intersection/union over ``_py_shingles`` — the same normalization
    and distinct-n-gram rule as the HOF ``shingles`` — per Arrow batch.
    Catalyst HOF lambdas are interpreted (~60k evals/s); shingling two
    long texts per candidate pair dominated the verify stage, while this
    kernel is one hash-set op per pair. IEEE double division matches the
    Catalyst expression bit-for-bit."""

    @pandas_udf("double")
    def jac(tl: pd.Series, tr: pd.Series) -> pd.Series:
        out = np.zeros(len(tl), dtype=np.float64)
        for i, (a, b) in enumerate(zip(tl, tr)):
            sa = _py_shingles(a, n)
            sb = _py_shingles(b, n)
            union = len(sa | sb)
            if union:
                out[i] = len(sa & sb) / union
        return pd.Series(out)

    return jac


def connected_components(
    edges: DataFrame,
    id_l: str = "id_l",
    id_r: str = "id_r",
    max_iter: int = 50,
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """Resolve pairwise duplicate edges into clusters: each node gets the
    MINIMUM id reachable from it (a canonical cluster representative).

    Two execution strategies, picked by edge count — the same size-based
    dispatch Spark itself applies when it swaps a shuffle join for a
    broadcast join:

    - **Small graphs** (≤ `driver_threshold` edges, i.e. broadcastable):
      collect the edge list and run linear-time union-find on the driver.
      Dozens of shuffle rounds collapse into one O(E α(E)) pass; exact
      same labels. Near-dup edge sets are tiny relative to the corpus
      (they only contain nodes that HAVE a duplicate), so this is the
      common case even on huge inputs.
    - **Large graphs**: iterative distributed min-label propagation with
      POINTER JUMPING — each round every node takes (1) the min label
      among its neighbors, then (2) its label's own label
      (`label = label[label]`), which halves the remaining diameter:
      O(log d) rounds instead of O(d). Convergence is detected from a
      carried `old` column on the checkpointed result — no extra join.

    Scale notes (100 TB): each distributed round is one shuffle of
    |edges| on the neighbor key plus two joins of |nodes|; labels are
    localCheckpoint-ed every round so plan lineage stays flat instead of
    growing exponentially. For web-scale graphs swap the propagation
    body for the large-star/small-star rewrite (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") — same outer loop
    and convergence test. Driver-side iteration is inherent to iterative
    algorithms on Spark (GraphX/Pregel drive the same loop); per-round
    work is fully distributed.
    """
    e = edges.select(
        F.col(id_l).alias("a"), F.col(id_r).alias("b")
    ).localCheckpoint(eager=True)  # upstream edge query computed exactly once

    n_edges = e.count()  # free: counts the checkpointed blocks
    if n_edges <= driver_threshold:
        # union-find treats edges as undirected — no symmetrization needed
        return _union_find_driver(e)

    # distributed path: the symmetric edge list is reused every round, so
    # materialize it once (a narrow union over the checkpointed edges)
    sym = e.union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    nodes = sym.select(F.col("a").alias("node")).distinct()
    labels = nodes.withColumn("label", F.col("node"))
    for _ in range(max_iter):
        neigh = (
            sym.join(
                labels.select(
                    F.col("node").alias("b"), F.col("label").alias("nl")
                ),
                "b",
            )
            .groupBy("a")
            .agg(F.min("nl").alias("min_neigh"))
        )
        cand = labels.join(neigh, labels["node"] == neigh["a"], "left").select(
            "node",
            F.least(
                F.col("label"),
                F.coalesce(F.col("min_neigh"), F.col("label")),
            ).alias("label"),
            F.col("label").alias("old"),
        )
        # pointer jumping: follow the label one hop (labels are node ids,
        # so the label table doubles as the parent table)
        parent = cand.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        new_labels = (
            cand.join(parent, cand["label"] == parent["p_node"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("p_label"), F.col("label")),
                ).alias("label"),
                "old",
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.filter(F.col("label") != F.col("old")).limit(1).count()
        )
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


def _union_find_driver(e: DataFrame) -> DataFrame:
    """Union-find over a driver-collected (broadcast-sized) undirected edge
    list. Path-halving + union-by-min gives near-linear time; labels are
    the minimum node id per component, identical to the distributed loop.

    collect() (one job) rather than toLocalIterator (one round-trip per
    partition): the caller already verified the edge count is driver-sized,
    so memory is bounded by construction."""
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in e.collect():
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min so the root IS the component minimum
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    out = [(n, find(n)) for n in parent]
    schema = e.select(
        F.col("a").alias("node"), F.col("b").alias("cluster_id")
    ).schema
    return e.sparkSession.createDataFrame(out, schema)
