"""Round-5 batch 8 (SURVEY.md §2.7/§2.11): data reconciliation — the
migration-validation table diff (row-hash full-outer compare between a
table and its "migrated" twin), the op every warehouse cutover and
backfill audit runs.

The comparison twin derives DETERMINISTICALLY in-query (md5-threshold
row selection, exact-cents perturbation), so both engines reconstruct
the identical "after" table — no fixtures, no RNG — and the diff
itself is the thing under test."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_table_diff",
    oracle="""
    WITH before AS (
      SELECT o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderstatus
      FROM orders
    ), after AS (
      -- the "migrated" twin: ~1% of rows dropped, ~2% price-bumped by
      -- one cent — md5-threshold selection, identical on both engines
      SELECT o_orderkey,
             CASE WHEN SUBSTRING(MD5(CAST(o_orderkey AS VARCHAR)), 3, 2)
                       < '06'
                  THEN cents + 1 ELSE cents END AS cents,
             o_orderstatus
      FROM before
      WHERE SUBSTRING(MD5(CAST(o_orderkey AS VARCHAR)), 1, 2) >= '03'
    ), d AS (
      SELECT COALESCE(b.o_orderkey, a.o_orderkey) AS k,
             CASE WHEN a.o_orderkey IS NULL THEN 'missing_in_after'
                  WHEN b.o_orderkey IS NULL THEN 'extra_in_after'
                  WHEN b.cents != a.cents
                       OR b.o_orderstatus != a.o_orderstatus
                  THEN 'changed' ELSE 'equal' END AS verdict,
             CASE WHEN a.cents IS NOT NULL AND b.cents IS NOT NULL
                  THEN a.cents - b.cents ELSE 0 END AS cents_delta
      FROM before b FULL OUTER JOIN after a ON b.o_orderkey = a.o_orderkey
    )
    SELECT verdict,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents_delta) AS BIGINT) AS total_cents_delta,
           CAST(MIN(k) AS BIGINT) AS first_key,
           CAST(MAX(k) AS BIGINT) AS last_key
    FROM d GROUP BY verdict ORDER BY verdict
    """,
)
def q_table_diff(spark, sf_dir):
    """Migration-validation TABLE DIFF: full-outer key compare of a
    table against its migrated twin, classifying every key as equal /
    changed / missing_in_after / extra_in_after, with the exact-cents
    drift total per class and first/last affected keys — the
    reconciliation report a cutover audit signs off on.

    Plan: one full-outer equi-join on the table key (hash-partitioned
    both sides; at 100 TB both sides shuffle once on the key — the
    unavoidable cost of exact reconciliation; bucketed layouts on the
    key make it shuffle-free, see ``write_bucketed_table``), then a
    small per-verdict rollup via map-side partials. Value compare uses
    exact cents, never floats. The "after" side derives from the same
    scan by deterministic md5 thresholds (~1% deletes, ~2% one-cent
    bumps), so the oracle rebuilds the identical twin."""
    o = read_table(spark, sf_dir, "orders")
    before = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        "o_orderstatus",
    )
    h = F.md5(F.col("o_orderkey").cast("string"))
    after = (
        before.where(F.substring(h, 1, 2) >= "03")
        .select(
            "o_orderkey",
            F.when(
                F.substring(h, 3, 2) < "06", F.col("cents") + 1
            ).otherwise(F.col("cents")).alias("cents"),
            "o_orderstatus",
        )
    )
    b = before.select(
        F.col("o_orderkey").alias("bk"),
        F.col("cents").alias("bc"),
        F.col("o_orderstatus").alias("bs"),
    )
    a = after.select(
        F.col("o_orderkey").alias("ak"),
        F.col("cents").alias("ac"),
        F.col("o_orderstatus").alias("as_"),
    )
    d = b.join(a, b.bk == a.ak, "full_outer").select(
        F.coalesce("bk", "ak").alias("k"),
        F.when(F.col("ak").isNull(), F.lit("missing_in_after"))
        .when(F.col("bk").isNull(), F.lit("extra_in_after"))
        .when(
            (F.col("bc") != F.col("ac")) | (F.col("bs") != F.col("as_")),
            F.lit("changed"),
        )
        .otherwise(F.lit("equal"))
        .alias("verdict"),
        F.when(
            F.col("ac").isNotNull() & F.col("bc").isNotNull(),
            F.col("ac") - F.col("bc"),
        )
        .otherwise(F.lit(0))
        .alias("cents_delta"),
    )
    return (
        d.groupBy("verdict")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("cents_delta").cast("bigint").alias("total_cents_delta"),
            F.min("k").cast("bigint").alias("first_key"),
            F.max("k").cast("bigint").alias("last_key"),
        )
        .orderBy("verdict")
    )
