"""One materialized shingle pass serving every frame of a prefix-filter
query (round-12 optimization).

Why this exists (round-12 plan audit): the prefix-join dedup family
(`q_dedup_containment`, `q_dedup_jaccard_prefix`,
`q_dedup_threshold_sweep`) built its prefix / posting / verification
frames by calling :func:`operators.dedup.shingle_exploded` /
``shingle_grain`` / ``shingle_sets`` independently, so the formatted
plans showed 8 parquet scans per query and the normalize+zip_with
shingle chain — the dominant per-row cost — executed 3-4x per run. At
100 TB that is 3-4 full corpus passes where one suffices (optimization
guide §1.2: fix the distributed algorithm first; §2.4: remove redundant
passes).

This module is deliberately SEPARATE from ``operators.dedup``: it only
ADDS a composition of dedup's public builders, and keeping it out of
that widely-imported module keeps the re-verification slate's
dependency co-flagging scoped to the four queries that actually changed
behavior-relevant bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.operators.dedup import shingle_exploded


def shingle_frames(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    sh_col: str = "sh",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns ``(exploded, grain, sets)``, all derived from ONE
    materialized ``(id, shingle)`` explode.

    The explode is computed once and eagerly ``localCheckpoint``-ed
    (the graph-family lineage convention: executor-local
    MEMORY_AND_DISK storage, traded against re-reading and re-shingling
    the corpus per consumer frame; reduced fault tolerance of the
    intermediate is the documented cost). Every frame derives from the
    materialized rows:

    - ``exploded``: the ``(id, sh)`` distinct-shingle grain of
      :func:`operators.dedup.shingle_exploded`, checkpointed.
    - ``grain``: the df/s count windows of
      :func:`operators.dedup.shingle_grain`, verbatim, over the
      checkpointed rows (two exchanges of the shingle grain total).
    - ``sets``: ``array_sort(collect_set(sh))`` per doc —
      element-identical to :func:`operators.dedup.shingle_sets`'s
      ``array_sort(shingles(text))``, because the exploded frame IS
      each doc's distinct shingle set (including the ``['']`` row a
      NULL/empty text yields) and ``array_sort`` makes the collect
      order immaterial. Per-group state is one doc's distinct
      shingles — the same bound as the arrays ``shingle_sets`` already
      built row-wise (audited in tools/lint_driver_bound.py).

    Preconditions and retention contract (round-12 advisor items):

    - ``id_col`` must be UNIQUE in ``docs``. ``sets`` groups by id, so
      duplicate input rows sharing an id would collapse into one merged
      shingle set, where the row-wise ``shingle_sets`` builder emitted
      one row per input row. The fixture corpus (and the oracle's
      ``GROUP BY doc_id`` grain) satisfy this; callers feeding dirty
      data must dedupe by id first.
    - The eager ``localCheckpoint`` pins the exploded rows in executor
      MEMORY_AND_DISK until the returned frames are garbage-collected
      driver-side (``bench.py`` runs ``gc.collect()`` between keys;
      long-lived library consumers should drop references — or call
      ``DataFrame.unpersist()`` on ``exploded`` — after the consuming
      action). A lost executor fails the query instead of recomputing:
      acceptable for a derived single-query intermediate, by the same
      trade the graph family documents.
    """
    exploded = shingle_exploded(docs, id_col, text_col, n, sh_col)
    exploded = exploded.localCheckpoint(eager=True)
    grain = exploded.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy(sh_col))
    ).withColumn("s", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
    sets = exploded.groupBy(id_col).agg(
        F.array_sort(F.collect_set(sh_col)).alias("shs")
    )
    return exploded, grain, sets
