"""Round-6 batch 48 (SURVEY.md §2.9 analytics / §2.11 corpus): ABC
CLASSIFICATION (parts split into A/B/C revenue classes at the 80%/95%
cumulative-share cuts — the inventory-management standard, computed
with the repo's two-phase banded rank so no global sort ever happens)
and DOCUMENT NOVELTY (per-source share of word-5-gram shingles a doc
introduces to the corpus — the "is this source adding new content or
recycling" signal that complements q_vocab_growth at source grain).

Exactness: revenue is exact cents; cumulative crossing uses integer
cross-multiplication; novelty counts are exact shingle integers."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

# Same fixed cents>>20 banding as q_gini_concentration / q_lorenz_curve.
_BAND_SHIFT = 20


@query(
    "q_abc_classification",
    oracle="""
    WITH rev AS (
      SELECT l_partkey AS partkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem GROUP BY 1
    ), ranked AS (
      SELECT partkey, cents,
             SUM(cents) OVER (ORDER BY cents DESC, partkey
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum,
             SUM(cents) OVER () AS total
      FROM rev
    ), classed AS (
      SELECT partkey, cents,
             CASE WHEN 100 * (cum - cents) < 80 * total THEN 'A'
                  WHEN 100 * (cum - cents) < 95 * total THEN 'B'
                  ELSE 'C' END AS abc
      FROM ranked
    )
    SELECT abc,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS class_cents,
           CAST(SUM(cents) AS DOUBLE)
             / CAST(SUM(SUM(cents)) OVER () AS DOUBLE) AS revenue_share
    FROM classed GROUP BY abc ORDER BY abc
    """,
)
def q_abc_classification(spark, sf_dir):
    """ABC CLASSIFICATION: parts ranked by revenue; a part is class A
    while the revenue strictly BEFORE it is under 80% of the total,
    B under 95%, else C (the standard prior-cumulative rule, so the
    first part is always A) — the inventory-policy split (count A
    daily, B weekly, C quarterly). Thresholds are exact integer
    cross-multiplications: 100·prior < 80·total.

    Scale shape: part-grain exact-cents aggregate, then the exact
    descending global rank WITHOUT a total-order sort — the q_gini /
    q_lorenz two-phase banded trick flipped descending: band counts
    and subtotals roll into cumulative offsets over BOUNDED band rows,
    within-band cumulative sums partition by band, and prior-revenue =
    band offset + within-band prefix. The oracle keeps the plain
    window formulation. Class rollup is a 3-row aggregate."""
    li = read_table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    ).withColumn("band", F.shiftright(F.col("cents"), _BAND_SHIFT))
    # Phase 1: per-band revenue subtotals -> offsets of revenue in
    # HIGHER bands (descending order), over bounded band rows.
    bands = rev.groupBy("band").agg(
        F.sum("cents").cast("bigint").alias("band_cents")
    )
    wb = Window.orderBy(F.col("band").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = bands.select(
        "band",
        (F.sum("band_cents").over(wb) - F.col("band_cents")).alias(
            "offset"
        ),
        F.sum("band_cents").over(wall).cast("bigint").alias("total"),
    )
    # Phase 2: within-band descending prefix (partitioned by band —
    # parallel), prior revenue = band offset + prefix before this row.
    ww = (
        Window.partitionBy("band")
        .orderBy(F.col("cents").desc(), "partkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    classed = (
        rev.join(F.broadcast(offsets), "band")
        .withColumn(
            "prior",
            F.col("offset") + F.sum("cents").over(ww) - F.col("cents"),
        )
        .withColumn(
            "abc",
            F.when(100 * F.col("prior") < 80 * F.col("total"), "A")
            .when(100 * F.col("prior") < 95 * F.col("total"), "B")
            .otherwise("C"),
        )
    )
    out = classed.groupBy("abc").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("cents").cast("bigint").alias("class_cents"),
    )
    return (
        out.select(
            "abc",
            "n_parts",
            "class_cents",
            (
                F.col("class_cents").cast("double")
                / F.sum("class_cents").over(wall).cast("double")
            ).alias("revenue_share"),
        )
        .orderBy("abc")
    )


@query(
    "q_doc_novelty",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT doc_id,
             ARRAY_TO_STRING(a[CAST(i AS INT):CAST(i AS INT) + 4], ' ') AS s
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
    ), first_seen AS (
      SELECT s, MIN(doc_id) AS fd FROM sh GROUP BY s
    ), per_doc AS (
      SELECT sh.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_shingles,
             CAST(SUM(CASE WHEN f.fd = sh.doc_id THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_novel
      FROM sh JOIN first_seen f ON sh.s = f.s
      GROUP BY 1
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(p.n_shingles) AS BIGINT) AS total_shingles,
           CAST(SUM(p.n_novel) AS BIGINT) AS novel_shingles,
           CAST(SUM(p.n_novel) AS DOUBLE)
             / CAST(SUM(p.n_shingles) AS DOUBLE) AS novelty
    FROM per_doc p JOIN documents d ON p.doc_id = d.doc_id
    GROUP BY d.source ORDER BY d.source
    """,
)
def q_doc_novelty(spark, sf_dir):
    """DOCUMENT NOVELTY per source: the share of each doc's word-
    5-gram shingles whose FIRST corpus appearance is that doc (under
    doc_id ingestion order), rolled up by source — the "is this feed
    adding new content or recycling boilerplate" score a corpus-build
    pipeline uses to weight sources, complementing q_vocab_growth
    (corpus-level curve) and q_dedup_containment (pairwise evidence).

    Scale shape: shingle first-seen is one MIN aggregate at the
    shingle grain (the q_vocab_growth trick on shingles); per-doc
    novel counts come from one join-back on the shingle key (shuffles
    carry shingle strings once), and the source rollup is a bounded
    aggregate. No pairwise comparisons anywhere."""
    from self_healing_data_pipeline_spark.operators.dedup import (
        shingle_exploded,
    )

    docs = read_table(spark, sf_dir, "documents")
    # The exploded frame feeds BOTH the first-seen MIN and the
    # join-back; materialize it once (round-12: without this the
    # normalize+shingle chain ran twice — one full extra corpus pass
    # at scale).
    sh = shingle_exploded(docs, out_col="s").localCheckpoint(eager=True)
    first_seen = sh.groupBy("s").agg(F.min("doc_id").alias("fd"))
    per_doc = (
        sh.join(first_seen, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(
                F.when(F.col("fd") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_novel"),
        )
    )
    return (
        per_doc.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_shingles").cast("bigint").alias("total_shingles"),
            F.sum("n_novel").cast("bigint").alias("novel_shingles"),
        )
        .select(
            "source",
            "n_docs",
            "total_shingles",
            "novel_shingles",
            (
                F.col("novel_shingles").cast("double")
                / F.col("total_shingles").cast("double")
            ).alias("novelty"),
        )
        .orderBy("source")
    )
