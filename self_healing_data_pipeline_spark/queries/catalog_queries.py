"""Catalog / lineage queries — the reference's knowledge-graph vision
(reference ``README.md:7``: a catalog with lineage across datasets) made
queryable with the engine itself (SURVEY.md §2, Tier-A pipeline row).

``plans.lineage.LineageLog`` records one edge set per pipeline run; here a
deterministic corpus-build pipeline is DECLARED (lazily — recording
lineage needs schemas, not executions), its lineage lands in a DataFrame,
and the impact-analysis question lineage exists to answer — "what is
downstream of this dataset?" — runs as a distributed graph query over
those edges.

At scale: a production catalog holds one edge row per (stage, run) in a
parquet table partitioned by run date — millions of edges, tiny next to
the data itself. The closure below is a bounded frontier-expansion (one
hash join per pipeline-depth level, shuffling only the frontier); for
catalogs with deep graphs the pointer-jumping loop of
``operators.dedup.resolve_clusters`` is the O(log d) alternative.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.operators.dedup import normalize_text
from self_healing_data_pipeline_spark.plans.lineage import LineageLog
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

#: The declared pipeline: (stage, [inputs], output). Mirrored literally in
#: the oracle's edge VALUES — the stage graph is code, so the oracle twin
#: states the same static truth.
_PIPELINE_STAGES = [
    ("normalize", ["documents"], "docs_normalized"),
    ("fingerprint", ["docs_normalized"], "docs_fingerprinted"),
    ("dedup", ["docs_fingerprinted"], "docs_unique"),
    ("split", ["docs_unique"], "corpus_routed"),
    ("sessionize", ["events"], "event_sessions"),
    ("engagement", ["event_sessions"], "user_engagement"),
    ("report", ["corpus_routed", "user_engagement"], "corpus_report"),
]

_EDGE_VALUES = ", ".join(
    f"('{src}', '{out}')"
    for (_stage, inputs, out) in _PIPELINE_STAGES
    for src in inputs
)


def _build_lineage(spark, sf_dir) -> LineageLog:
    """Declare the corpus-build pipeline and capture its lineage.

    Every stage constructs a REAL (lazy) DataFrame over the fixtures —
    recording ``output_schema`` forces analysis only, never execution —
    so the lineage log is a genuine capture of a declared plan graph,
    not hand-typed metadata.
    """
    log = LineageLog(run_id="corpus-build")
    docs = read_table(spark, sf_dir, "documents")
    ev = read_table(spark, sf_dir, "events")

    normalized = docs.select(
        "doc_id", "lang", normalize_text("text").alias("nt")
    )
    fingerprinted = normalized.select(
        "doc_id",
        "lang",
        F.substring(F.md5("nt"), 1, 16).alias("fingerprint"),
    )
    unique = fingerprinted.dropDuplicates(["fingerprint"])
    routed = unique.withColumn(
        "split",
        F.when(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "cc",
            "train",
        ).otherwise("eval"),
    )
    sessions = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    engagement = sessions.agg(F.avg("n_events").alias("avg_events"))
    report = routed.groupBy("split").count().crossJoin(engagement)

    outputs = {
        "docs_normalized": normalized,
        "docs_fingerprinted": fingerprinted,
        "docs_unique": unique,
        "corpus_routed": routed,
        "event_sessions": sessions,
        "user_engagement": engagement,
        "corpus_report": report,
    }
    for stage, inputs, out in _PIPELINE_STAGES:
        log.record(stage, inputs, out, output_df=outputs[out])
    return log


@query(
    "q_lineage_downstream",
    oracle=f"""
    WITH RECURSIVE edges AS (
      SELECT * FROM (VALUES {_EDGE_VALUES}) AS t(src, dst)
    ),
    reach(dataset, depth) AS (
      SELECT dst, 1 FROM edges WHERE src = 'documents'
      UNION
      SELECT e.dst, r.depth + 1
      FROM reach r JOIN edges e ON e.src = r.dataset
    )
    SELECT dataset, CAST(MIN(depth) AS BIGINT) AS depth
    FROM reach GROUP BY dataset ORDER BY depth, dataset
    """,
)
def q_lineage_downstream(spark, sf_dir):
    """Impact analysis over the lineage graph: every dataset transitively
    downstream of ``documents``, with its minimum dependency depth — the
    question a catalog answers before a schema change or a backfill
    ("what breaks / what must rebuild if this table changes?").

    The lineage edges come from an actual ``LineageLog`` capture of the
    declared corpus-build pipeline (``plans/lineage.py:44-89``), exploded
    into (src, dst) rows. The closure is a bounded frontier expansion:
    one broadcast-sized hash join per depth level (the loop bound is the
    static stage count — no data-dependent driver control flow), then a
    min-depth aggregate. The DuckDB oracle walks the identical edge list
    with a recursive CTE, like q_dedup_clusters."""
    lineage = _build_lineage(spark, sf_dir).to_dataframe(spark)
    edges = lineage.select(
        F.explode("inputs").alias("src"), F.col("output").alias("dst")
    )
    frontier = edges.filter(F.col("src") == "documents").select(
        F.col("dst").alias("dataset"), F.lit(1).alias("depth")
    )
    reach = frontier
    for depth in range(2, len(_PIPELINE_STAGES) + 1):
        frontier = frontier.join(
            edges, frontier["dataset"] == edges["src"]
        ).select(F.col("dst").alias("dataset"), F.lit(depth).alias("depth"))
        reach = reach.unionByName(frontier)
    return (
        reach.groupBy("dataset")
        .agg(F.min("depth").cast("bigint").alias("depth"))
        .orderBy("depth", "dataset")
    )


@query(
    "q_profile_topk_values",
    oracle="""
    WITH vals AS (
      SELECT 'o_orderstatus' AS col, o_orderstatus AS val FROM orders
      UNION ALL
      SELECT 'o_orderpriority', o_orderpriority FROM orders
    ), counts AS (
      SELECT col, val, COUNT(*) AS n FROM vals GROUP BY col, val
    )
    SELECT col, val,
           CAST(n AS BIGINT) AS n_rows,
           CAST(rnk AS BIGINT) AS rnk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY col
                                       ORDER BY n DESC, val) AS rnk
          FROM counts)
    WHERE rnk <= 3
    ORDER BY col, rnk
    """,
)
def q_profile_topk_values(spark, sf_dir):
    """Frequent-values profile: the top-3 most common values of each
    profiled column with counts — the catalog's answer to "what does this
    column actually contain", the deterministic twin of the reference's
    LLM quality-issue hints (``APP/services/geminiService.ts:64``: enum
    detection, skewed-domain detection). Columns unpivot via stack (one
    scan for all profiled columns), counts aggregate map-side to
    |col|×|domain| rows, and the per-column top-3 is a rank window over
    that already-tiny aggregate — never over the raw table."""
    o = read_table(spark, sf_dir, "orders")
    vals = o.select(
        F.expr(
            "stack(2, 'o_orderstatus', o_orderstatus,"
            " 'o_orderpriority', o_orderpriority) AS (col, val)"
        )
    )
    counts = vals.groupBy("col", "val").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("col").orderBy(F.desc("n"), F.asc("val"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "col",
            "val",
            F.col("n").cast("bigint").alias("n_rows"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
        .orderBy("col", "rnk")
    )


@query(
    "q_dedup_keep_best",
    oracle="""
    WITH fp AS (
      SELECT doc_id, n_chars,
             SUBSTRING(MD5(TRIM(REGEXP_REPLACE(LOWER(text),
                                               '[^a-z0-9]+', ' ', 'g'))),
                       1, 16) AS fingerprint
      FROM documents
    )
    SELECT doc_id, fingerprint, n_chars
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY fingerprint
                                       ORDER BY n_chars DESC, doc_id) AS rn
          FROM fp)
    WHERE rn = 1
    """,
)
def q_dedup_keep_best(spark, sf_dir):
    """Dedup with a QUALITY-BASED canonical-selection policy: within each
    normalized-text fingerprint group keep the LONGEST variant (raw
    n_chars — normalization strips formatting, so raw length
    distinguishes otherwise-identical docs), doc_id as the total-order
    tie-break. The policy-parameterized sibling of keep-first: real
    corpus builds keep the best-quality duplicate, not the first-seen
    one. Same scale shape as all fingerprint dedup here: one window
    shuffle keyed on the 16-hex fingerprint, text never shuffles."""
    d = read_table(spark, sf_dir, "documents")
    fp = F.substring(F.md5(normalize_text("text")), 1, 16)
    w = Window.partitionBy("fingerprint").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        d.select("doc_id", "n_chars", fp.alias("fingerprint"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "fingerprint", "n_chars")
    )
