"""Round-6 batch 51 (SURVEY.md §2.11 corpus / dedup policy): CHUNK
COVERAGE AUDIT (proves the 200/150 chunker loses no characters and
quantifies its overlap cost — the RAG-pipeline DQ gate on
q_doc_chunks' output) and the DEDUP THRESHOLD SWEEP (how many
near-dup pairs each Jaccard threshold would remove, from ONE shared
candidate/verify pass — the sensitivity table a data steward reads
before picking 0.8).

Exactness: coverage arithmetic is pure integers from the chunking
closed form; sweep counts are exact pair counts per threshold."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

_W, _S = 200, 150  # q_doc_chunks' window/stride contract


@query(
    "q_chunk_coverage_audit",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source, LENGTH(text) AS n,
             CAST(CEIL(GREATEST(LENGTH(text) - 200, 0) / 150.0)
                  AS BIGINT) + 1 AS n_chunks
      FROM documents
    ), per_doc AS (
      SELECT doc_id, source, n, n_chunks,
             LEAST((n_chunks - 1) * 150 + 200, n) AS last_end,
             (n_chunks - 1) * 50 AS overlap_chars
      FROM base
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chunks) AS BIGINT) AS n_chunks,
           CAST(SUM(n) AS BIGINT) AS total_chars,
           CAST(SUM(CASE WHEN last_end >= n THEN 1 ELSE 0 END) AS BIGINT)
             AS fully_covered_docs,
           CAST(SUM(n - last_end) AS BIGINT) AS uncovered_chars,
           CAST(SUM(overlap_chars) AS BIGINT) AS overlap_chars,
           CAST(SUM(overlap_chars) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)
             AS overlap_ratio
    FROM per_doc GROUP BY source ORDER BY source
    """,
)
def q_chunk_coverage_audit(spark, sf_dir):
    """CHUNK COVERAGE AUDIT for the q_doc_chunks 200/150 contract:
    per source, the chunk count, the proof that the LAST chunk reaches
    the end of every document (fully_covered_docs must equal n_docs
    and uncovered_chars must be 0 — the oracle pins both), and the
    exact overlap cost (n_chunks−1)·(W−S): the duplicated characters
    a RAG index embeds twice. Designing this audit CAUGHT a real
    defect — the chunker's original floor-based count left up to
    S−1 = 149 uncovered tail characters on 349 of 500 fixture docs;
    the operator now uses ceil and this audit gates the contract.

    Scale shape: pure integer column expressions per doc from the
    chunking CLOSED FORM (no explode — auditing a trillion chunks
    costs one scan of the doc table) + a source-grain partial
    aggregate."""
    docs = read_table(spark, sf_dir, "documents")
    n = F.length("text")
    n_chunks = (
        F.ceil(F.greatest(n - _W, F.lit(0)) / float(_S)).cast("bigint") + 1
    )
    last_end = F.least((n_chunks - 1) * _S + _W, n)
    per_doc = docs.select(
        "source",
        n.alias("n"),
        n_chunks.alias("n_chunks"),
        last_end.alias("last_end"),
        ((n_chunks - 1) * (_W - _S)).alias("overlap_chars"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chunks").cast("bigint").alias("n_chunks"),
            F.sum("n").cast("bigint").alias("total_chars"),
            F.sum(
                F.when(F.col("last_end") >= F.col("n"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("fully_covered_docs"),
            F.sum(F.col("n") - F.col("last_end"))
            .cast("bigint")
            .alias("uncovered_chars"),
            F.sum("overlap_chars").cast("bigint").alias("overlap_chars"),
        )
        .select(
            "source",
            "n_docs",
            "n_chunks",
            "total_chars",
            "fully_covered_docs",
            "uncovered_chars",
            "overlap_chars",
            (
                F.col("overlap_chars").cast("double")
                / F.col("total_chars").cast("double")
            ).alias("overlap_ratio"),
        )
        .orderBy("source")
    )


@query(
    "q_dedup_threshold_sweep",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id,
             ARRAY_TO_STRING(a[CAST(i AS INT):CAST(i AS INT) + 4], ' ') AS sh
      FROM (
        SELECT doc_id, a,
               UNNEST(GENERATE_SERIES(1, GREATEST(LEN(a) - 4, 1))) AS i
        FROM (
          SELECT doc_id,
                 STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text),
                              '[^a-z0-9]+', ' ', 'g')), ' ') AS a
          FROM documents
        )
      )
    ), sz AS (SELECT doc_id, COUNT(*) AS s FROM sh GROUP BY doc_id),
    inter AS (
      SELECT x.doc_id AS d1, y.doc_id AS d2, COUNT(*) AS i
      FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    ), j AS (
      SELECT inter.i, s1.s + s2.s - inter.i AS u
      FROM inter
      JOIN sz s1 ON d1 = s1.doc_id
      JOIN sz s2 ON d2 = s2.doc_id
    )
    SELECT
           CAST(SUM(CASE WHEN 10 * i >= 7 * u THEN 1 ELSE 0 END) AS BIGINT)
             AS pairs_ge_70pct,
           CAST(SUM(CASE WHEN 10 * i >= 8 * u THEN 1 ELSE 0 END) AS BIGINT)
             AS pairs_ge_80pct,
           CAST(SUM(CASE WHEN 10 * i >= 9 * u THEN 1 ELSE 0 END) AS BIGINT)
             AS pairs_ge_90pct,
           CAST(SUM(CASE WHEN i = u THEN 1 ELSE 0 END) AS BIGINT)
             AS pairs_exact
    FROM j
    """,
)
def q_dedup_threshold_sweep(spark, sf_dir):
    """DEDUP THRESHOLD SWEEP: exact near-dup pair counts at Jaccard ≥
    0.7 / 0.8 / 0.9 / 1.0 from ONE shared candidate pass — the
    sensitivity table that says what each policy knob would delete
    before anyone runs the delete. Candidates come from the 0.7
    prefix filter (the loosest threshold swept — a superset of every
    tighter threshold's pairs, so one pass serves all four columns).

    Scale shape: identical to q_dedup_jaccard_prefix (rare-first
    prefix postings join, exact array verify) with the prefix sized
    for 0.7 — s − ceil(0.7·s) + 1 rarest shingles — then ONE
    conditional-aggregate collapse to a single row of four exact
    counters. No per-threshold rescans."""
    from self_healing_data_pipeline_spark.operators.dedup import prefix_rows
    from self_healing_data_pipeline_spark.operators.shingle_pass import (
        shingle_frames,
    )

    docs = read_table(spark, sf_dir, "documents")
    # Shared shingle prep from ONE materialized pass (round-12:
    # shingle_frames); prefix sized for J >= 0.7 (the loosest swept
    # threshold), exact integer ceil inside.
    _, grain, sets = shingle_frames(docs)
    prefix = prefix_rows(grain, 7, 10)
    p2 = prefix.select(F.col("doc_id").alias("d2"), F.col("sh").alias("sh2"))
    cand = (
        prefix.join(p2, (prefix.sh == p2.sh2) & (prefix.doc_id < p2.d2))
        .select(F.col("doc_id").alias("d1"), "d2")
        .distinct()
    )
    j = (
        cand.join(
            sets.select(F.col("doc_id").alias("d1"), F.col("shs").alias("a")),
            "d1",
        )
        .join(
            sets.select(F.col("doc_id").alias("d2"), F.col("shs").alias("b")),
            "d2",
        )
        .select(
            F.size(F.array_intersect("a", "b")).cast("bigint").alias("i"),
            F.size(F.array_union("a", "b")).cast("bigint").alias("u"),
        )
    )
    return j.agg(
        F.sum(F.when(10 * F.col("i") >= 7 * F.col("u"), 1).otherwise(0))
        .cast("bigint")
        .alias("pairs_ge_70pct"),
        F.sum(F.when(10 * F.col("i") >= 8 * F.col("u"), 1).otherwise(0))
        .cast("bigint")
        .alias("pairs_ge_80pct"),
        F.sum(F.when(10 * F.col("i") >= 9 * F.col("u"), 1).otherwise(0))
        .cast("bigint")
        .alias("pairs_ge_90pct"),
        F.sum(F.when(F.col("i") == F.col("u"), 1).otherwise(0))
        .cast("bigint")
        .alias("pairs_exact"),
    )
