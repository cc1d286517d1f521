"""Round-5 batch 3 (SURVEY.md §2.11): the search-engine-construction /
graph-analytics corner of the corpus surface — inverted-index posting
lists, co-occurrence-graph triangle counting, head-vocabulary coverage,
a prefix-filtered exact-Jaccard similarity join (the PPJoin family),
and a MinHash sketch-accuracy gate mirroring ``q_distinct_sketch_accuracy``.

Reference parity: the catalog/relationship-discovery vision
(``automated-data-catalog-&-etl/README.md:7,21``) plus the
training-data ops the task brief makes first-class.  Scale discipline
as everywhere else: exact integer masses, at most one IEEE division per
output row, no global windows, no all-pairs stage — candidate
generation is always bucket/prefix-bounded and verification is
candidate-bounded."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.operators.dedup import (
    NORMALIZE_TEXT_SQL as _NORM,
    minhash_signatures,
    normalize_text,
    shingles,
)
from self_healing_data_pipeline_spark.operators.graph import (
    CO_PAIR_CTE_SQL as _CO_PAIR_CTE,
    co_order_edges,
)
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# DuckDB twin of operators.dedup.shingles(col, 5): distinct word 5-grams,
# degenerating to the whole (short) doc exactly like the Spark side.
_SHINGLE5_SQL = f"""
    SELECT DISTINCT doc_id,
           ARRAY_TO_STRING(a[CAST(i AS INT):CAST(i AS INT) + 4], ' ') AS sh
    FROM (
      SELECT doc_id, a,
             UNNEST(GENERATE_SERIES(1, GREATEST(LEN(a) - 4, 1))) AS i
      FROM (
        SELECT doc_id, STRING_SPLIT({_NORM.format(c='text')}, ' ') AS a
        FROM documents
      )
    )
"""


@query(
    "q_inverted_index",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, UNNEST(STRING_SPLIT({_NORM.format(c='text')}, ' ')) AS term
      FROM documents
    ), grain AS (
      SELECT term, doc_id, COUNT(*) AS n
      FROM tok WHERE LENGTH(term) > 0 GROUP BY term, doc_id
    ), ranked AS (
      SELECT term, doc_id,
             ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn
      FROM grain
    ), heads AS (
      SELECT term,
             STRING_AGG(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
               AS postings_head
      FROM ranked WHERE rn <= 16 GROUP BY term
    )
    SELECT g.term AS term,
           CAST(COUNT(*) AS BIGINT) AS df,
           CAST(SUM(g.n) AS BIGINT) AS cf,
           MAX(h.postings_head) AS postings_head
    FROM grain g JOIN heads h ON g.term = h.term
    GROUP BY g.term ORDER BY g.term
    """,
)
def q_inverted_index(spark, sf_dir):
    """Inverted-index construction: per term, document frequency, corpus
    frequency, and the HEAD of the sorted doc_id posting list (first 16
    postings, comma-joined) — the search-engine build step over the
    corpus.

    Plan: one tokenize pass → (term, doc_id) grain with per-doc term
    counts (map-side partial agg) → df/cf in one aggregate. The posting
    head comes from a rank window PARTITIONED BY term (never global):
    rows beyond rank 16 are dropped BEFORE any list assembly, so no
    operator ever materializes a full posting list — at 100 TB a head
    term's postings are billions of doc_ids, and real systems shard the
    full lists; the capped head keeps the declared output bounded at
    16 ids/term while df/cf stay exact over the full grain."""
    docs = read_table(spark, sf_dir, "documents")
    toks = F.split(normalize_text("text"), " ")
    grain = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .where(F.length("term") > 0)
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # Single pass: the rank window partitions by term, so the groupBy
    # that follows reuses its hash(term) exchange — one tokenize scan,
    # no self-join. collect_list skips the NULLs the when() leaves for
    # rows past rank 16, keeping the assembled list <= 16 ids.
    w = Window.partitionBy("term").orderBy("doc_id")
    return (
        grain.select("term", "doc_id", "n", F.row_number().over(w).alias("rn"))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.sum("n").cast("bigint").alias("cf"),
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(F.col("rn") <= 16, F.col("doc_id"))
                        )
                    ),
                    lambda d: d.cast("string"),
                ),
            ).alias("postings_head"),
        )
        .orderBy("term")
    )


@query(
    "q_part_triangles",
    oracle=f"""
    WITH {_CO_PAIR_CTE}, e AS (
      SELECT p1, p2 FROM cop
    ), deg AS (
      SELECT p, COUNT(*) AS d FROM (
        SELECT p1 AS p FROM e UNION ALL SELECT p2 FROM e
      ) GROUP BY p
    ), tri AS (
      SELECT COUNT(*) AS t
      FROM e e1
      JOIN e e2 ON e1.p2 = e2.p1
      JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
    )
    SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT SUM(d * (d - 1) / 2) FROM deg) AS BIGINT) AS n_wedges,
           CAST((SELECT t FROM tri) AS BIGINT) AS n_triangles,
           CASE WHEN (SELECT SUM(d * (d - 1) / 2) FROM deg) > 0
                THEN 3.0 * (SELECT t FROM tri)
                     / (SELECT SUM(d * (d - 1) / 2) FROM deg)
           END AS clustering
    """,
)
def q_part_triangles(spark, sf_dir):
    """Triangle counting + global clustering coefficient on the part
    CO-OCCURRENCE graph (parts ordered together in >= 2 orders — the
    support filter keeps the graph at the density of real association
    graphs instead of the quadratic co-order blow-up).

    Scale shape: edges are DEGREE-ORIENTED before wedge enumeration —
    each undirected edge points from its lower-(degree, id) endpoint to
    the higher one, so every wedge is generated at its LOWEST-degree
    vertex and the join fan-out per vertex is bounded by oriented
    out-degree (O(sqrt(m)) on skewed graphs, the classic
    compact-forward bound) instead of raw degree — the difference
    between a hub node emitting deg^2 wedges and sqrt-bounded work at
    100 TB. The closing-edge probe is a join back on the SAME oriented
    edge list (orientation order makes each triangle counted exactly
    once); the oracle counts the identical triangles from the plain
    a<b<c formulation. Wedge mass and the 3T/W clustering ratio are
    exact integers with one final IEEE division."""
    li = read_table(spark, sf_dir, "lineitem")
    # Materialize the edge list ONCE (round 11, the q_pagerank/
    # q_khop_reach lineage-truncation convention): the comment below
    # used to claim ReuseExchange would dedup e's recurring aggregate,
    # but the measured plan showed ZERO reused exchanges and 72
    # parquet scans — AQE re-optimizes each subtree independently, so
    # identical subtrees stop canonicalizing equal. One eager
    # localCheckpoint of e (and of the oriented edge list below, read
    # by both the wedge and the closing-probe sides) replaces repeated
    # lineitem self-joins with reads of a materialized edge relation —
    # exactly what a cluster job would persist at this stage.
    e = co_order_edges(li).localCheckpoint(eager=True)
    deg = (
        e.select(F.col("p1").alias("p"))
        .unionAll(e.select(F.col("p2").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ed = e.join(
        deg.select(F.col("p").alias("p1"), F.col("d").alias("deg1")), "p1"
    ).join(deg.select(F.col("p").alias("p2"), F.col("d").alias("deg2")), "p2")
    lo_first = (F.col("deg1") < F.col("deg2")) | (
        (F.col("deg1") == F.col("deg2")) & (F.col("p1") < F.col("p2"))
    )
    oe = ed.select(
        F.when(lo_first, F.col("p1")).otherwise(F.col("p2")).alias("src"),
        F.when(lo_first, F.col("deg2")).otherwise(F.col("deg1")).alias("dd"),
        F.when(lo_first, F.col("p2")).otherwise(F.col("p1")).alias("dst"),
    ).localCheckpoint(eager=True)
    # Wedges at the oriented source: pairs of out-neighbours ordered by
    # the orientation key, so the closing edge is probed in its stored
    # direction and each triangle is counted exactly once.
    o2 = oe.select(
        F.col("src").alias("src2"), F.col("dd").alias("dd2"), F.col("dst").alias("dst2")
    )
    wedges = oe.join(o2, oe.src == o2.src2).where(
        (F.col("dd") < F.col("dd2"))
        | ((F.col("dd") == F.col("dd2")) & (F.col("dst") < F.col("dst2")))
    )
    closing = oe.select(F.col("src").alias("cu"), F.col("dst").alias("cv"))
    tri = wedges.join(
        closing, (wedges.dst == closing.cu) & (wedges.dst2 == closing.cv), "left_semi"
    ).agg(F.count(F.lit(1)).alias("t"))
    stats = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        (F.sum(F.col("d") * (F.col("d") - 1)) / 2).cast("bigint").alias("n_wedges"),
    )
    n_edges = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    return (
        stats.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            F.col("t").cast("bigint").alias("n_triangles"),
            F.when(
                F.col("n_wedges") > 0,
                F.lit(3.0) * F.col("t") / F.col("n_wedges"),
            ).alias("clustering"),
        )
    )


@query(
    "q_source_coverage",
    oracle=f"""
    WITH tok AS (
      SELECT source, UNNEST(STRING_SPLIT({_NORM.format(c='text')}, ' ')) AS term
      FROM documents
    ), cnt AS (
      SELECT source, term, COUNT(*) AS n
      FROM tok WHERE LENGTH(term) > 0 GROUP BY source, term
    ), top100 AS (
      SELECT term FROM (
        SELECT term, SUM(n) AS tot FROM cnt GROUP BY term
        ORDER BY tot DESC, term ASC LIMIT 100
      )
    )
    SELECT c.source,
           CAST(SUM(c.n) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN t.term IS NOT NULL THEN c.n ELSE 0 END)
                AS BIGINT) AS covered_tokens,
           CAST(SUM(CASE WHEN t.term IS NOT NULL THEN c.n ELSE 0 END)
                AS DOUBLE) / SUM(c.n) AS coverage
    FROM cnt c LEFT JOIN top100 t ON c.term = t.term
    GROUP BY c.source ORDER BY c.source
    """,
)
def q_source_coverage(spark, sf_dir):
    """Head-vocabulary coverage per source: what fraction of each
    source's token mass the global top-100 terms cover — the quick
    domain-shift / tokenizer-fit diagnostic (a source whose mass the
    corpus head vocabulary misses is out-of-distribution for a
    tokenizer trained on the corpus).

    Plan: one tokenize pass → (source, term) counted grain (map-side
    partials collapse duplicate terms before the shuffle); the global
    top-100 is a bounded TakeOrderedAndProject over the term rollup and
    BROADCASTS back into the grain — no second shuffle of the token
    stream, no global window. Masses exact; one division per source."""
    docs = read_table(spark, sf_dir, "documents")
    toks = F.split(normalize_text("text"), " ")
    cnt = (
        docs.select("source", F.explode(toks).alias("term"))
        .where(F.length("term") > 0)
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top100 = (
        cnt.groupBy("term")
        .agg(F.sum("n").alias("tot"))
        .orderBy(F.col("tot").desc(), F.col("term").asc())
        .limit(100)
        .select("term", F.lit(True).alias("is_top"))
    )
    return (
        cnt.join(F.broadcast(top100), "term", "left")
        .groupBy("source")
        .agg(
            F.sum("n").cast("bigint").alias("total_tokens"),
            F.sum(F.when(F.col("is_top"), F.col("n")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("covered_tokens"),
        )
        .select(
            "source",
            "total_tokens",
            "covered_tokens",
            (F.col("covered_tokens").cast("double") / F.col("total_tokens")).alias(
                "coverage"
            ),
        )
        .orderBy("source")
    )


@query(
    "q_dedup_jaccard_prefix",
    oracle=f"""
    WITH sh AS ({_SHINGLE5_SQL}),
    sz AS (SELECT doc_id, COUNT(*) AS s FROM sh GROUP BY doc_id),
    inter AS (
      SELECT x.doc_id AS d1, y.doc_id AS d2, COUNT(*) AS i
      FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    )
    SELECT d1, d2,
           CAST(i AS BIGINT) AS n_inter,
           CAST(s1.s + s2.s - i AS BIGINT) AS n_union,
           CAST(i AS DOUBLE) / (s1.s + s2.s - i) AS jaccard
    FROM inter
    JOIN sz s1 ON d1 = s1.doc_id
    JOIN sz s2 ON d2 = s2.doc_id
    WHERE 5 * i >= 4 * (s1.s + s2.s - i)
    ORDER BY d1, d2
    """,
)
def q_dedup_jaccard_prefix(spark, sf_dir):
    """EXACT Jaccard >= 0.8 near-duplicate pairs over word-5-gram
    shingle sets via PREFIX FILTERING (the PPJoin/AllPairs family,
    Xiao et al. 2008) — the exact counterpart of the MinHash/SimHash
    probabilistic dedup ops: no false negatives, no false positives.

    Candidate generation never goes all-pairs: shingles get a global
    total order (document frequency ascending, shingle ascending — the
    rare-first order that makes prefixes small), each doc keeps only
    its PREFIX (the s - ceil(0.8*s) + 1 smallest shingles under that
    order; two sets with J >= 0.8 MUST share a prefix element), and
    candidates come from the prefix-grain self-join — the blow-up is
    bounded by prefix-token bucket sizes, which rare-first ordering
    keeps small by construction. Verification is candidate-bounded:
    each surviving pair fetches the two docs' shingle ARRAYS and
    checks 5*|A∩B| >= 4*|A∪B| in exact integers (one IEEE division
    only for the reported jaccard). The oracle is the complete
    shared-shingle formulation — equality proves the prefix filter
    lost nothing."""
    from self_healing_data_pipeline_spark.operators.dedup import prefix_rows
    from self_healing_data_pipeline_spark.operators.shingle_pass import (
        shingle_frames,
    )

    docs = read_table(spark, sf_dir, "documents")
    # Shared shingle prep from ONE materialized pass (round-12:
    # shingle_frames — the separate grain/sets calls re-ran the
    # shingle chain 3x): (doc_id, sh, df, s) in two window exchanges;
    # prefix_rows keeps each doc's s - ceil(0.8*s) + 1 rarest shingles
    # with the exact-integer ceil.
    _, grain, sets = shingle_frames(docs)
    prefix = prefix_rows(grain, 4, 5)
    p2 = prefix.select(F.col("doc_id").alias("d2"), F.col("sh").alias("sh2"))
    cand = (
        prefix.join(p2, (prefix.sh == p2.sh2) & (prefix.doc_id < p2.d2))
        .select(F.col("doc_id").alias("d1"), "d2")
        .distinct()
    )
    verified = (
        cand.join(
            sets.select(F.col("doc_id").alias("d1"), F.col("shs").alias("a")), "d1"
        )
        .join(sets.select(F.col("doc_id").alias("d2"), F.col("shs").alias("b")), "d2")
        .select(
            "d1",
            "d2",
            F.size(F.array_intersect("a", "b")).cast("bigint").alias("n_inter"),
            F.size(F.array_union("a", "b")).cast("bigint").alias("n_union"),
        )
        .where(F.lit(5) * F.col("n_inter") >= F.lit(4) * F.col("n_union"))
    )
    return verified.select(
        "d1",
        "d2",
        "n_inter",
        "n_union",
        (F.col("n_inter").cast("double") / F.col("n_union")).alias("jaccard"),
    ).orderBy("d1", "d2")


@query(
    "q_stream_heavy_hitters",
    oracle="""
    WITH it AS (
      SELECT CASE WHEN value >= 20.0 THEN 'bulk' ELSE event_type END AS item
      FROM events
    ), f AS (
      SELECT item, COUNT(*) AS exact_cnt FROM it GROUP BY item
    ), t AS (
      SELECT CAST(SUM(exact_cnt) AS BIGINT) AS n FROM f
    )
    SELECT f.item AS item,
           CAST(f.exact_cnt AS BIGINT) AS exact_cnt,
           (SELECT n FROM t) AS stream_n,
           TRUE AS in_summary,
           TRUE AS bound_ok
    FROM f WHERE f.exact_cnt * 5 > (SELECT n FROM t)
    ORDER BY f.item
    """,
)
def q_stream_heavy_hitters(spark, sf_dir):
    """The continuous heavy-hitters summary's GUARANTEES, oracle-checked
    — the run-the-machinery pattern of ``q_dedup_registry`` applied to
    ``streaming.heavy_hitters``: the query drives three event_id-tercile
    epochs of a routing-key stream (the hot-key scenario: a 'bulk'
    class carrying ~2/3 of the events next to five ~7% cold classes)
    through the Misra-Gries maintenance with k=4 — six distinct items,
    so COMPRESSION REALLY FIRES at every merge — then reports the
    phi > 1/(k+1) heavy set from an exact re-count with three
    machinery witnesses the oracle expects TRUE: the heavy item is in
    the summary (guaranteed-superset), its summary count is a valid
    lower bound within n/(k+1) (mergeable-summaries error bound), and
    the summary's accumulated stream length equals the exact event
    count (every event folded exactly once across epochs)."""
    import os

    from self_healing_data_pipeline_spark.session import scratch_dir
    from self_healing_data_pipeline_spark.streaming.heavy_hitters import (
        apply_heavy_hitters_batch,
        read_summary,
    )

    k = 4
    sdir = os.path.join(scratch_dir("hh", sf_dir), "state")

    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("value") >= 20.0, F.lit("bulk"))
        .otherwise(F.col("event_type"))
        .alias("item"),
    )
    max_id = ev.agg(F.max("event_id")).collect()[0][0] or 0
    c1, c2 = max_id // 3, 2 * max_id // 3
    for epoch, pred in enumerate(
        (
            F.col("event_id") <= c1,
            (F.col("event_id") > c1) & (F.col("event_id") <= c2),
            F.col("event_id") > c2,
        )
    ):
        apply_heavy_hitters_batch(
            spark, ev.filter(pred), sdir, epoch, k=k, item_col="item"
        )
    summary, n_total = read_summary(spark, sdir)
    exact = ev.groupBy("item").agg(F.count(F.lit(1)).alias("exact_cnt"))
    n = exact.select(F.sum("exact_cnt").alias("n"))
    heavy = (
        exact.crossJoin(F.broadcast(n))
        .where(F.col("exact_cnt") * (k + 1) > F.col("n"))
    )
    return (
        heavy.join(
            F.broadcast(summary.withColumnRenamed("cnt", "mg_cnt")),
            "item",
            "left",
        )
        .select(
            "item",
            F.col("exact_cnt").cast("bigint").alias("exact_cnt"),
            F.col("n").cast("bigint").alias("stream_n"),
            F.col("mg_cnt").isNotNull().alias("in_summary"),
            (
                F.col("mg_cnt").isNotNull()
                & (F.col("mg_cnt") <= F.col("exact_cnt"))
                & (
                    (F.col("exact_cnt") - F.col("mg_cnt")) * (k + 1)
                    <= F.col("n")
                )
                & (F.lit(n_total) == F.col("n"))
            ).alias("bound_ok"),
        )
        .orderBy("item")
    )


@query(
    "q_minhash_accuracy",
    oracle=f"""
    WITH sh AS ({_SHINGLE5_SQL}),
    sz AS (SELECT doc_id, COUNT(*) AS s FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      WHERE a.doc_id % 5 = 0 AND a.doc_id < 125
    ), inter AS (
      SELECT x.doc_id AS d1, y.doc_id AS d2, COUNT(*) AS i
      FROM sh x JOIN sh y ON y.sh = x.sh AND y.doc_id = x.doc_id + 1
      GROUP BY 1, 2
    )
    SELECT p.d1, p.d2,
           CAST(COALESCE(i.i, 0) AS BIGINT) AS n_inter,
           CAST(s1.s + s2.s - COALESCE(i.i, 0) AS BIGINT) AS n_union,
           CAST(COALESCE(i.i, 0) AS DOUBLE)
             / (s1.s + s2.s - COALESCE(i.i, 0)) AS exact_jaccard,
           TRUE AS est_within_02
    FROM pairs p
    LEFT JOIN inter i ON p.d1 = i.d1 AND p.d2 = i.d2
    JOIN sz s1 ON p.d1 = s1.doc_id
    JOIN sz s2 ON p.d2 = s2.doc_id
    ORDER BY p.d1, p.d2
    """,
)
def q_minhash_accuracy(spark, sf_dir):
    """MinHash sketch-accuracy GATE (the ``q_distinct_sketch_accuracy``
    discipline applied to the dedup sketch): over 25 fixed doc pairs,
    the exact word-5-gram Jaccard (oracle-verified) alongside an in-row
    witness that the 256-permutation MinHash estimate lands within
    ±0.2 of it (sigma = sqrt(J(1-J)/256) <= 0.031, so the bound is
    >6 sigma — a false failure is a broken kernel, not bad luck). The
    oracle expects the witness TRUE, so sketch fidelity is pinned by
    the correctness gate at every SF the driver runs."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = (
        docs.where((F.col("doc_id") % 5 == 0) & (F.col("doc_id") < 125))
        .select(F.col("doc_id").alias("d1"), (F.col("doc_id") + 1).alias("d2"))
    )
    # Gate docs only: the %5 id filter pushes into the scan BEFORE the
    # signature kernel, so the sketch UDF runs on the fixed 50-doc gate
    # set — not the corpus — at every SF.
    gate = docs.where((F.col("doc_id") % 5 <= 1) & (F.col("doc_id") < 126))
    sets = gate.select("doc_id", shingles("text", 5).alias("shs"))
    sigs = minhash_signatures(gate, "doc_id", "text", num_hashes=256)
    j = (
        pairs.join(
            sets.select(F.col("doc_id").alias("d1"), F.col("shs").alias("a")), "d1"
        )
        .join(sets.select(F.col("doc_id").alias("d2"), F.col("shs").alias("b")), "d2")
        .join(sigs.select(F.col("__id").alias("d1"), F.col("__sig").alias("sa")), "d1")
        .join(sigs.select(F.col("__id").alias("d2"), F.col("__sig").alias("sb")), "d2")
    )
    est = (
        F.size(
            F.filter(
                F.zip_with("sa", "sb", lambda x, y: x == y), lambda v: v
            )
        ).cast("double")
        / F.lit(256.0)
    )
    exact = F.size(F.array_intersect("a", "b")).cast("double") / F.size(
        F.array_union("a", "b")
    )
    return j.select(
        "d1",
        "d2",
        F.size(F.array_intersect("a", "b")).cast("bigint").alias("n_inter"),
        F.size(F.array_union("a", "b")).cast("bigint").alias("n_union"),
        exact.alias("exact_jaccard"),
        (F.abs(est - exact) <= 0.2).alias("est_within_02"),
    ).orderBy("d1", "d2")
