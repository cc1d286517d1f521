"""Analytic surface extensions: grouping sets, exact correlation moments,
boolean aggregates, funnel/retention event analytics, calendar gap-fill,
fuzzy (edit-distance) matching, correlated-subquery decorrelation, and the
multimodal feature pipeline as a first-class query.

These extend SURVEY.md §2.4 (aggregation), §2.9 (event analytics) and
§2.11 (training-data ops). The reference delegates all of this to its
embedded Postgres via ``executeSql`` (``automated-data-catalog-&-etl/
services/pgliteService.ts:36-49``); here each is an idiomatic Catalyst
plan with a DuckDB oracle where SQL-expressible.

Scale notes (100 TB):
- grouping sets ride Spark's Expand operator — one scan, rows × |sets|
  before partial aggregation, so shuffle is bounded by group cardinality;
- correlation/covariance come from ONE pass of exact-decimal moments
  (sums commute → map-side partials; no second scan, no row reorder
  sensitivity — see functions.scalar on cross-engine float determinism);
- funnel/retention shuffle once on user_id (the natural key) and reduce
  to per-user rows before any join — never a per-event self-join;
- the fuzzy self-join blocks on lang before the quadratic comparator
  (same blocking discipline as the MinHash/SimHash dedup family).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.functions.scalar import dec, dsum
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    """,
)
def q_agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (beyond ROLLUP/CUBE): (status, priority),
    (status), and grand total in one Expand + hash-aggregate pass."""
    return (
        read_table(spark, sf_dir, "orders")
        .groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
            F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
            F.grouping("o_orderpriority").cast("bigint").alias("g_priority"),
        )
    )


# Exact-decimal moment fragments (x = l_quantity, y = l_extendedprice),
# scaled to INTEGRAL decimals (cents / cents²) before the double cast:
# fractional decimal→double conversion rounds twice in some engines
# (integer / 10^scale), so a decimal(38,4) sum can land 1 ulp away from
# another engine's conversion. An integral decimal converts in ONE
# rounding everywhere. corr is scale-invariant, covar is rescaled below.
_SX = "CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS DECIMAL(38,0)) AS DOUBLE)"
_SY = "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS DECIMAL(38,0)) AS DOUBLE)"
_SXX = (
    "CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))"
    " * CAST(l_quantity AS DECIMAL(18,2))) * 10000 AS DECIMAL(38,0)) AS DOUBLE)"
)
_SYY = (
    "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * CAST(l_extendedprice AS DECIMAL(18,2))) * 10000 AS DECIMAL(38,0)) AS DOUBLE)"
)
_SXY = (
    "CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))"
    " * CAST(l_extendedprice AS DECIMAL(18,2))) * 10000 AS DECIMAL(38,0)) AS DOUBLE)"
)


@query(
    "q_agg_corr",
    oracle=f"""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             {_SX} AS sx, {_SY} AS sy, {_SXX} AS sxx, {_SYY} AS syy, {_SXY} AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           (n * sxy - sx * sy)
             / (SQRT(GREATEST(n * sxx - sx * sx, 0.0))
                * SQRT(GREATEST(n * syy - sy * sy, 0.0))) AS corr_qty_price,
           (n * sxy - sx * sy) / (n * (n - 1.0)) / 10000.0
             AS covar_samp_qty_price
    FROM m ORDER BY l_returnflag
    """,
)
def q_agg_corr(spark, sf_dir):
    """Pearson correlation + sample covariance from one pass of
    exact-decimal moments. The built-in ``corr``/``covar_samp`` accumulate
    doubles in shuffle order (non-reproducible run-to-run at scale and
    engine-to-engine); decimal moments make every bit deterministic while
    keeping map-side partial aggregation."""
    li = read_table(spark, sf_dir, "lineitem")
    qty = dec("l_quantity", precision=18)
    price = dec("l_extendedprice", precision=18)

    def integral(s, scale_pow):  # decimal sum → integral decimal → double
        return (
            (s * F.lit(10**scale_pow))
            .cast("decimal(38,0)")
            .cast("double")
        )

    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        integral(F.sum(qty), 2).alias("sx"),
        integral(F.sum(price), 2).alias("sy"),
        integral(F.sum(qty * qty), 4).alias("sxx"),
        integral(F.sum(price * price), 4).alias("syy"),
        integral(F.sum(qty * price), 4).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return m.select(
        "l_returnflag",
        n.cast("bigint").alias("n_rows"),
        (
            (n * sxy - sx * sy)
            / (
                F.sqrt(F.greatest(n * sxx - sx * sx, F.lit(0.0)))
                * F.sqrt(F.greatest(n * syy - sy * sy, F.lit(0.0)))
            )
        ).alias("corr_qty_price"),
        # moments are in cents (×10² per variable) → covar carries 10⁴
        ((n * sxy - sx * sy) / (n * (n - F.lit(1.0))) / F.lit(10000.0)).alias(
            "covar_samp_qty_price"
        ),
    ).orderBy("l_returnflag")


@query(
    "q_agg_bool",
    oracle="""
    SELECT o_orderpriority,
           BOOL_AND(o_totalprice < 300000) AS all_below_300k,
           BOOL_OR(o_orderstatus = 'F') AS any_finished,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q_agg_bool(spark, sf_dir):
    """Boolean aggregates (BOOL_AND / BOOL_OR) — the SQL form of
    universally/existentially quantified data-quality assertions."""
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.bool_and(F.col("o_totalprice") < 300000).alias("all_below_300k"),
            F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_events_funnel",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS n_view,
           COUNT(CASE WHEN t_click > t_view THEN 1 END) AS n_view_then_click,
           COUNT(CASE WHEN t_click > t_view AND t_purchase > t_click THEN 1 END)
             AS n_full_funnel
    FROM per_user
    """,
)
def q_events_funnel(spark, sf_dir):
    """Ordered funnel (view → click → purchase): one shuffle on user_id to
    per-user first-touch times (conditional MIN), then a global conditional
    count. NULL-propagating comparisons drop users missing a step — no
    self-joins, so cost is O(events) + O(users) at any scale."""
    ev = read_table(spark, sf_dir, "events")

    def first_ts(etype: str):
        return F.min(F.when(F.col("event_type") == etype, F.col("ts")))

    per_user = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count(F.when(F.col("t_view").isNotNull(), 1)).alias("n_view"),
        F.count(F.when(F.col("t_click") > F.col("t_view"), 1)).alias(
            "n_view_then_click"
        ),
        F.count(
            F.when(
                (F.col("t_click") > F.col("t_view"))
                & (F.col("t_purchase") > F.col("t_click")),
                1,
            )
        ).alias("n_full_funnel"),
    )


@query(
    "q_events_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, DATE_TRUNC('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, DATE_TRUNC('week', ts) AS act_week FROM events
    )
    SELECT STRFTIME(f.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST((EPOCH(a.act_week) - EPOCH(f.cohort_week)) / 604800 AS BIGINT)
             AS week_offset,
           COUNT(*) AS n_active_users
    FROM firsts f JOIN activity a USING (user_id)
    GROUP BY 1, 2
    """,
)
def q_events_retention(spark, sf_dir):
    """Weekly cohort retention: cohort = ISO week of a user's first event;
    count distinct users active N weeks later. Both inputs reduce to
    per-user / per-(user, week) rows *before* the join, so the join input
    is |users|, not |events| — the shape that survives 100 TB."""
    ev = read_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_week")
    ).distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (
                (
                    F.unix_timestamp("act_week")
                    - F.unix_timestamp("cohort_week")
                )
                / 604800
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


@query(
    "q_date_series",
    oracle="""
    WITH bounds AS (
      SELECT MIN(CAST(o_orderdate AS DATE)) AS d0,
             MAX(CAST(o_orderdate AS DATE)) AS d1
      FROM orders
    ), days AS (
      SELECT CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ), daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n FROM orders GROUP BY 1
    )
    SELECT CAST(days.day AS VARCHAR) AS day,
           COALESCE(daily.n, 0) AS n_orders
    FROM days LEFT JOIN daily ON days.day = daily.day
    """,
)
def q_date_series(spark, sf_dir):
    """Calendar gap-fill: generate every day in the data's date range
    (sequence + explode — engine-side, no driver loop) and left-join the
    daily counts so zero-order days appear explicitly. The generated spine
    is broadcast (|days| rows) against the aggregated side (|days| rows),
    never against raw orders."""
    o = read_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("d0"),
        F.max(F.col("o_orderdate").cast("date")).alias("d1"),
    )
    days = bounds.select(
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        days.join(daily, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"),
        )
    )


@query(
    "q_fuzzy_match",
    oracle="""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang,
           CAST(levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40))
                AS BIGINT) AS edit_distance
    FROM documents a JOIN documents b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) <= 4
    """,
)
def q_fuzzy_match(spark, sf_dir):
    """Edit-distance fuzzy matching (Levenshtein <= 4 on the 40-char
    prefix, same language) via PIGEONHOLE SEGMENT BLOCKING — the
    PassJoin family (Li et al., VLDB 2011): split the indexed side's
    prefix into k+1 = 5 fixed 8-char segments; any pair within
    distance 4 MUST agree exactly on at least one segment, with the
    matching substring of the probe side starting within +-4 of that
    segment's position. Candidates therefore come from an equi-join on
    (lang, seg_idx, 8-char piece) — selective, shuffle carries 40-char
    prefixes at most — and only candidates pay the banded O(len*k)
    verify. The oracle is the complete lang-blocked formulation:
    equality proves the pigeonhole filter lost nothing.

    Threshold history: round 7 tightened 20 -> 4. At 20, random
    word-pool prefixes collide (the sf1 probe measured the RESULT SET
    growing ~n^2: 54 -> 5,033 pairs for 10x docs) — a quadratic answer
    no blocking can save, and useless as a dedup signal (the fixture's
    true duplicates sit at distance 0-4, the random tail starts at 9).
    At 4 the answer is the planted near-dup set and grows linearly.

    Every fixture doc has >= 44 chars, so prefixes are always exactly
    40 chars and one fixed segment scheme serves all rows; a corpus
    with shorter docs would bucket them into a per-length scheme (the
    general PassJoin form). Scale shape at 100 TB: 5 index rows + <= 37
    probe rows per doc, candidate generation bounded by 8-char-piece
    bucket sizes, verification candidate-bounded — never all-pairs."""
    _K = 4
    _PLEN = 40
    _NSEG = _K + 1
    _SLEN = _PLEN // _NSEG  # 8
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.substring("text", 1, _PLEN).alias("prefix"),
    )
    # Indexed side: the 5 fixed segments (1-based starts 1,9,17,25,33).
    seg_starts = [1 + i * _SLEN for i in range(_NSEG)]
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang").alias("lang_b"),
        F.col("prefix").alias("prefix_b"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("seg_idx"),
                        F.substring("prefix", st, _SLEN).alias("piece"),
                    )
                    for i, st in enumerate(seg_starts)
                ]
            )
        ).alias("sp"),
    ).select("doc_b", "lang_b", "prefix_b", "sp.seg_idx", "sp.piece")
    # Probe side: all substrings of length 8 starting within +-k of
    # each segment start (clamped to valid starts [1, 33]).
    probe_cells = []
    for i, st in enumerate(seg_starts):
        for shift in range(-_K, _K + 1):
            pos = st + shift
            if 1 <= pos <= _PLEN - _SLEN + 1:
                probe_cells.append(
                    F.struct(
                        F.lit(i).alias("seg_idx"),
                        F.substring("prefix", pos, _SLEN).alias("piece"),
                    )
                )
    a = d.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lang").alias("lang_a"),
        F.col("prefix").alias("prefix_a"),
        F.explode(F.array(*probe_cells)).alias("sp"),
    ).select("doc_a", "lang_a", "prefix_a", "sp.seg_idx", "sp.piece")
    cand = (
        a.join(
            b,
            (a["lang_a"] == b["lang_b"])
            & (a["seg_idx"] == b["seg_idx"])
            & (a["piece"] == b["piece"])
            & (a["doc_a"] < b["doc_b"]),
        )
        .select("doc_a", "doc_b", "lang_a", "prefix_a", "prefix_b")
        .distinct()
    )
    dist = F.levenshtein(F.col("prefix_a"), F.col("prefix_b"), _K)
    return (
        cand.select(
            "doc_a",
            "doc_b",
            F.col("lang_a").alias("lang"),
            dist.cast("bigint").alias("edit_distance"),
        )
        .filter(F.col("edit_distance") >= 0)
    )


@query(
    "q_subquery_correlated",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > 1.5 * (
      SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE)
      FROM orders o2 WHERE o2.o_custkey = o.o_custkey
    )
    """,
)
def q_subquery_correlated(spark, sf_dir):
    """Correlated scalar subquery (orders 1.5× above their customer's
    mean), decorrelated to a window aggregate — one shuffle on o_custkey
    instead of a per-row subquery. Exact-decimal mean keeps the float
    comparison bit-identical across engines (functions.scalar)."""
    from pyspark.sql import Window

    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    mean = (
        F.sum(dec("o_totalprice", precision=18)).over(w).cast("double")
        / F.count(F.lit(1)).over(w).cast("double")
    )
    return (
        o.withColumn("__mean", mean)
        .filter(F.col("o_totalprice") > 1.5 * F.col("__mean"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "q_multimodal_features",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             (n_chars % 24 + 8) AS w,
             (doc_id % 16 + 8) AS h,
             doc_id % 4 AS kind
      FROM documents
    ), px AS (
      SELECT media_id, kind, w, h,
             ((yy * 7 + xx * 13 + media_id) % 256) AS v
      FROM m,
           generate_series(0, 23) AS ty(yy),
           generate_series(0, 31) AS tx(xx)
      WHERE yy < h AND xx < w
    ), agg AS (
      SELECT media_id, kind, w, h,
             SUM(v) AS s_gray,
             SUM(v + (v * 3) % 256 + (v * 7) % 256) AS s_rgb
      FROM px GROUP BY media_id, kind, w, h
    )
    SELECT media_id,
           CASE kind WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                     WHEN 2 THEN 'jpeg' ELSE 'bmp' END AS format,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CASE WHEN kind = 2 THEN NULL
                WHEN kind = 1 THEN CAST(s_rgb AS DOUBLE) / (w * h * 3)
                ELSE CAST(s_gray AS DOUBLE) / (w * h)
           END AS pixel_mean_lossless,
           TRUE AS dims_ok, TRUE AS pixels_ok, TRUE AS entropy_ok,
           TRUE AS bytes_ok, TRUE AS feature_norm_ok
    FROM agg ORDER BY media_id
    """,
)
def q_multimodal_features(spark, sf_dir):
    """Multimodal feature-extraction pipeline as a query — with REAL
    pixel decode across all four formats (round 4), PROMOTED to a
    hash-exact oracle in round 11 via the closed-form-fixture trick
    (the q_scan_binaryfile pattern): the synthesized pixels follow the
    exact integer gradient law ``(y*7 + x*13 + doc_id) % 256`` (GIF
    additionally maps through the closed-form palette ``(v, 3v%256,
    7v%256)``), so the DuckDB oracle derives format, parsed dims, and
    the LOSSLESS formats' decoded pixel mean straight from the law —
    while the Spark side earns them from the real byte path
    (encode -> header parse -> full pixel decode). ``pixel_mean`` of a
    uint8 array is an exact-integer float64 sum (< 2^53) divided once,
    so Spark's numpy mean and the oracle's SUM::DOUBLE/count are
    bit-identical; JPEG is DCT-lossy, so its mean column is NULL on
    both sides and its accuracy lives in the ``pixels_ok`` witness
    (|decoded mean − law mean| <= 3). The byte-level quantities that
    are genuinely not SQL (stream size, byte entropy, fake-feature
    norm) hash as boolean range witnesses the oracle pins TRUE; their
    raw values stay asserted in tests/test_extras3.py. A codec, parse,
    or decode defect now breaks the driver hash, not just an in-row
    witness.

    The fixture set carries no real media, so each document is encoded
    as a genuine image whose pixels derive deterministically from the
    document (a gradient seeded by doc_id): PNG (doc_id%4==0, stdlib
    zlib), GIF (==1, real LZW), JPEG (==2 — rotating the FULL T.81
    matrix, one residue per cell: sequential ARITHMETIC SOF9
    (doc_id%16==2), PROGRESSIVE Huffman SOF2 (==6), progressive
    ARITHMETIC SOF10 (==10), BASELINE SOF0 (==14)), BMP (==3) —
    encoders in ``operators/codecs.py``. Extraction
    then runs the real path end to end: Arrow-batched mapInPandas parses
    headers (format/width/height), computes byte entropy, and DECODES
    THE ACTUAL PIXELS (``operators.multimodal.decode_pixels``) for
    pixel_mean / pixel_entropy. Witnesses per row: ``dims_ok`` (parsed
    dims == synthesized dims) and ``pixels_ok`` (decoded pixel mean
    within 3 counts of the mean the synthesizer computed from the true
    pixel array — exact for the lossless formats, DCT-rounding tolerance
    for JPEG).
    """
    from pyspark.sql.functions import pandas_udf

    from self_healing_data_pipeline_spark.operators.codecs import (
        bmp_bytes_with_pixels,
        gif_bytes_with_pixels,
        jpeg_arith_bytes_with_pixels,
        jpeg_arith_progressive_bytes_with_pixels,
        jpeg_bytes_with_pixels,
        jpeg_progressive_bytes_with_pixels,
    )
    from self_healing_data_pipeline_spark.operators.multimodal import (
        extract_features,
        png_bytes_with_pixels,
    )

    def _gradient(d: int, wi: int, hi: int):
        import numpy as np

        yy, xx = np.mgrid[0:hi, 0:wi]
        return ((yy * 7 + xx * 13 + d) % 256).astype(np.uint8)

    def _gif_palette():
        import numpy as np

        return np.stack(
            [np.arange(256), (np.arange(256) * 3) % 256,
             (np.arange(256) * 7) % 256], axis=1
        ).astype(np.uint8)

    def _synth(doc_id, w, h):
        payloads = []
        for d, wi, hi in zip(doc_id, w, h):
            d, wi, hi = int(d), int(wi), int(hi)
            px = _gradient(d, wi, hi)
            kind = d % 4
            if kind == 0:
                blob = png_bytes_with_pixels(px)
            elif kind == 1:
                blob = gif_bytes_with_pixels(
                    px, _gif_palette(), interlace=bool(d % 8 == 1)
                )
            elif kind == 2:
                # rotate the FULL JPEG matrix (round 8: the QM-coder
                # decodes for real, so all four {sequential,
                # progressive} x {Huffman, arithmetic} combinations run
                # through the in-pipeline decode path). kind==2 means
                # d%16 ∈ {2, 6, 10, 14}: map one residue to each cell
                # so every path — including baseline — stays reachable.
                if d % 16 == 2:
                    blob = jpeg_arith_bytes_with_pixels(px)
                elif d % 16 == 6:
                    blob = jpeg_progressive_bytes_with_pixels(px)
                elif d % 16 == 10:
                    blob = jpeg_arith_progressive_bytes_with_pixels(px)
                else:  # d % 16 == 14
                    blob = jpeg_bytes_with_pixels(px)
            else:
                blob = bmp_bytes_with_pixels(px)
            payloads.append(blob)
        return pd.Series(payloads)

    def _true_mean(doc_id, w, h):
        # expected pixel mean from the gradient alone — no encode pass, so
        # the witness branch of the join costs O(pixels) numpy, not codecs
        means = []
        for d, wi, hi in zip(doc_id, w, h):
            d, wi, hi = int(d), int(wi), int(hi)
            px = _gradient(d, wi, hi)
            if d % 4 == 1:
                px = _gif_palette()[px]
            means.append(float(px.mean()))
        return pd.Series(means)

    synth = pandas_udf(_synth, "binary")
    true_mean_udf = pandas_udf(_true_mean, "double")

    docs = (
        read_table(spark, sf_dir, "documents")
        .select(
            F.col("doc_id").alias("media_id"),
            F.lit("image").alias("kind"),
            # small real rasters: pure-Python JPEG entropy decode is the
            # slow path, so bound pixels/doc
            (F.col("n_chars") % 24 + 8).cast("int").alias("exp_width"),
            (F.col("doc_id") % 16 + 8).cast("int").alias("exp_height"),
        )
        # fixture parquet is one input split, which would serialize the
        # decode kernel on one core; at warehouse scale the scan itself
        # yields many splits and this repartition is a no-op cost-wise
        # (tiny pre-payload rows), so fan out before the pandas stages
        .repartition(spark.sparkContext.defaultParallelism, "media_id")
    )
    media = docs.select(
        "media_id",
        "kind",
        synth(F.col("media_id"), F.col("exp_width"), F.col("exp_height")).alias(
            "payload"
        ),
        F.struct(
            F.col("exp_width").alias("width"),
            F.col("exp_height").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.element_at(
                F.array(F.lit("png"), F.lit("gif"), F.lit("jpeg"), F.lit("bmp")),
                (F.col("media_id") % 4 + 1).cast("int"),
            ).alias("format"),
        ).alias("meta"),
    )
    feats = extract_features(media.select("media_id", "kind", "payload", "meta"))
    expected = docs.select(
        "media_id",
        "exp_width",
        "exp_height",
        true_mean_udf(
            F.col("media_id"), F.col("exp_width"), F.col("exp_height")
        ).alias("true_mean"),
    )
    # flat law-derivable output (round-11 promotion): exact columns the
    # oracle recomputes from the gradient law, plus boolean range
    # witnesses for the byte-level quantities that are not SQL
    return (
        feats.withColumn(
            "feature_norm",
            F.sqrt(
                F.aggregate(
                    "feature",
                    F.lit(0.0),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"),
                )
            ),
        )
        .join(expected, "media_id")
        .select(
            "media_id",
            "format",
            F.col("width").cast("int").alias("width"),
            F.col("height").cast("int").alias("height"),
            F.when(F.col("format") == "jpeg", F.lit(None).cast("double"))
            .otherwise(F.col("pixel_mean"))
            .alias("pixel_mean_lossless"),
            (
                (F.col("width") == F.col("exp_width"))
                & (F.col("height") == F.col("exp_height"))
            ).alias("dims_ok"),
            (
                F.col("pixel_mean").isNotNull()
                & (F.abs(F.col("pixel_mean") - F.col("true_mean")) <= 3.0)
            ).alias("pixels_ok"),
            (
                (F.col("byte_entropy") > 0.0) & (F.col("byte_entropy") <= 8.0)
            ).alias("entropy_ok"),
            (F.col("n_bytes") > 16).alias("bytes_ok"),
            (F.col("feature_norm") > 0.0).alias("feature_norm_ok"),
        )
        .orderBy("media_id")
    )


@query(
    "q_multimodal_audio",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             CASE CAST(doc_id % 3 AS INT)
                  WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100
             END AS rate,
             (n_chars % 500 + 100) * 4 AS n_samp,
             (doc_id % 2 + 1) AS ch,
             (n_chars % 500 + 100) * 4 * (doc_id % 2 + 1) AS n
      FROM documents
    ), v AS (
      SELECT media_id, n,
             (((i + media_id) % 256) - 128) * 100 AS val
      FROM m, generate_series(0, 4791) AS t(i)
      WHERE i < n
    ), agg AS (
      SELECT media_id, SUM(val * val) AS sum_sq, MAX(ABS(val)) AS vmax
      FROM v GROUP BY media_id
    )
    SELECT m.media_id,
           CAST(44 + 2 * n AS BIGINT) AS n_bytes,
           'wav' AS format,
           CAST(rate AS INT) AS sample_rate,
           CAST(ch AS INT) AS channels,
           CAST((n_samp * 1000) // rate AS INT) AS duration_ms,
           SQRT(CAST(sum_sq AS DOUBLE) / n) / 32768.0 AS rms,
           CAST(vmax AS DOUBLE) / 32768.0 AS peak,
           TRUE AS roundtrip_ok
    FROM m JOIN agg ON m.media_id = agg.media_id
    ORDER BY m.media_id
    """,
)
def q_multimodal_audio(spark, sf_dir):
    """Audio-column pipeline as a query — and unlike the image path, the
    decode here is FULLY REAL: payloads are valid RIFF/WAVE 16-bit PCM
    (deterministic sawtooth synthesized per document), and raw PCM needs
    no codec library, so metadata (chunk-walk header parse) AND signal
    features (RMS, normalized peak over the actual samples) both run the
    genuine path through Arrow-batched mapInPandas.

    Round-11 PROMOTION to a hash-exact oracle (the closed-form-fixture
    trick): the sawtooth sample law ``((i + media_id) % 256 − 128) ×
    100`` is exact integer arithmetic both engines can evaluate, so
    DuckDB derives n_bytes (44-byte RIFF header + 2 bytes/sample),
    parsed rate/channels/duration (data_ms = n_samp·1000 // rate — the
    chunk-walk's own integer law), and the signal stats straight from
    the law — while Spark earns them from the real byte path
    (struct-pack synth → chunk-walk parse → PCM decode). RMS is
    bit-identical because the kernel folds EXACT int64 squared samples
    and applies one correctly-rounded divide + sqrt + power-of-two
    scale (operators.multimodal.extract_audio_features); peak is an
    integer over 2^15, exact in float64 by construction. A synth,
    parse, or decode defect now breaks the driver hash, not just the
    in-row ``roundtrip_ok`` witness (retained, oracle-pinned TRUE)."""
    from pyspark.sql.functions import pandas_udf

    from self_healing_data_pipeline_spark.operators.multimodal import (
        extract_audio_features,
        wav_bytes,
    )

    def _synth(media_id, sr, n_samp, ch):
        return pd.Series(
            [
                wav_bytes(int(s), int(n), channels=int(c), seed=int(m))
                for m, s, n, c in zip(media_id, sr, n_samp, ch)
            ]
        )

    synth_payload = pandas_udf(_synth, "binary")

    docs = read_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.expr("element_at(array(8000, 16000, 44100), CAST(doc_id % 3 AS INT) + 1)")
        .cast("int")
        .alias("exp_rate"),
        ((F.col("n_chars") % 500 + 100) * 4).cast("int").alias("n_samp"),
        (F.col("doc_id") % 2 + 1).cast("int").alias("exp_channels"),
    )
    media = docs.select(
        "media_id",
        synth_payload(
            F.col("media_id"),
            F.col("exp_rate"),
            F.col("n_samp"),
            F.col("exp_channels"),
        ).alias("payload"),
    )
    feats = extract_audio_features(media)
    expected = docs.select(
        "media_id",
        "exp_rate",
        "exp_channels",
        # duration the synthesizer implies: n_samp frames at exp_rate
        (F.col("n_samp").cast("bigint") * 1000 / F.col("exp_rate"))
        .cast("int")
        .alias("exp_duration_ms"),
    )
    return feats.join(expected, "media_id").select(
        "media_id",
        "n_bytes",
        "format",
        "sample_rate",
        "channels",
        "duration_ms",
        "rms",
        "peak",
        (
            (F.col("sample_rate") == F.col("exp_rate"))
            & (F.col("channels") == F.col("exp_channels"))
            & (F.col("duration_ms") == F.col("exp_duration_ms"))
            & (F.col("rms") > 0.0)
        ).alias("roundtrip_ok"),
    )


@query(
    "q_multimodal_video",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             (doc_id % 3 * 8 + 16) AS w,
             (doc_id % 2 * 8 + 8) AS h,
             (doc_id % 5 + 4) AS nf
      FROM documents
    ), d AS (
      SELECT media_id, w, h, nf,
             w * h * 3 AS len,
             (nf + 1) // 2 AS n_sampled
      FROM m
    ), px AS (
      SELECT media_id,
             ((j + 7 * f + media_id) % 256) AS v
      FROM d,
           generate_series(0, 7) AS tf(f),
           generate_series(0, 1535) AS tj(j)
      WHERE f < nf AND f % 2 = 0 AND j < len
    ), agg AS (
      SELECT media_id, SUM(v) AS tot, COUNT(*) AS cnt
      FROM px GROUP BY media_id
    )
    SELECT d.media_id,
           CAST(100 + nf * (8 + len) AS BIGINT) AS n_bytes,
           'avi' AS format,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(nf AS INT) AS n_frames,
           CAST(100 AS INT) AS frame_ms,
           CAST(n_sampled AS INT) AS n_sampled,
           CAST(tot AS DOUBLE) / cnt AS mean_intensity,
           TRUE AS roundtrip_ok
    FROM d JOIN agg ON d.media_id = agg.media_id
    ORDER BY d.media_id
    """,
)
def q_multimodal_video(spark, sf_dir):
    """Video-column pipeline as a query — the third modality leg
    (image: header-parse + stubbed pixel decode; audio: real PCM; video:
    REAL container walk AND real frame sampling, since uncompressed DIB
    frames need no codec). Deterministic RIFF/AVI payloads are
    synthesized per document, then mapInPandas extracts container
    metadata (width/height/frame count/frame interval from the avih
    header) and samples every 2nd raw frame for mean pixel intensity.

    Round-11 PROMOTION to a hash-exact oracle (the closed-form-fixture
    trick): the frame pixel law ``(j + 7f + media_id) % 256`` is exact
    integer arithmetic, so DuckDB derives the container byte length
    (100 fixed header bytes + nf·(8 + w·h·3) frame chunks), the parsed
    avih metadata, the sampled-frame count, and the mean intensity
    straight from the law — while Spark earns them from the real byte
    path (struct-pack synth → container walk → raw-frame decode). The
    mean is bit-identical because sampled frames share one size, so
    mean-of-frames = (exact int pixel total) / (exact int count) — one
    correctly-rounded division on both engines
    (operators.multimodal.sample_video_frames now yields exact sums).
    A synth, parse, or frame-walk defect now breaks the driver hash,
    not just the in-row ``roundtrip_ok`` witness (retained,
    oracle-pinned TRUE)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from self_healing_data_pipeline_spark.operators.multimodal import (
        avi_bytes,
        extract_video_features,
    )

    def _synth(media_id, w, h, nf):
        return pd.Series(
            [
                avi_bytes(int(wi), int(hi), int(nfi), fps=10, seed=int(m))
                for m, wi, hi, nfi in zip(media_id, w, h, nf)
            ]
        )

    synth_payload = pandas_udf(_synth, "binary")

    docs = read_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") % 3 * 8 + 16).cast("int").alias("exp_w"),
        (F.col("doc_id") % 2 * 8 + 8).cast("int").alias("exp_h"),
        (F.col("doc_id") % 5 + 4).cast("int").alias("exp_frames"),
    )
    media = docs.select(
        "media_id",
        synth_payload(
            F.col("media_id"), F.col("exp_w"), F.col("exp_h"), F.col("exp_frames")
        ).alias("payload"),
    )
    feats = extract_video_features(media, every_k=2)
    return feats.join(docs, "media_id").select(
        "media_id",
        "n_bytes",
        "format",
        "width",
        "height",
        "n_frames",
        "frame_ms",
        "n_sampled",
        "mean_intensity",
        (
            (F.col("width") == F.col("exp_w"))
            & (F.col("height") == F.col("exp_h"))
            & (F.col("n_frames") == F.col("exp_frames"))
            & (F.col("n_sampled") == F.ceil(F.col("exp_frames") / 2).cast("int"))
            & F.col("mean_intensity").between(0.0001, 254.9999)
        ).alias("roundtrip_ok"),
    )
