"""Round-8 batch 63 (SURVEY.md §2.4 / §2.11): multi-measure PIVOT
(§2.4 shipped single-aggregate pivot), GROUPING_ID exposure over
grouping sets (the bitmask a BI layer keys subtotal rows off), and
bit-exact embedding deduplication (the exact-duplicate-vector audit a
training pipeline runs before ANN indexing — re-ingested shards
produce byte-identical vectors under new ids).

Exactness: money in exact cents; the embedding digest quantizes each
float to a ROUND(x·1e5) long before hashing, so the key derivation is
integer-identical cross-engine (float FORMATTING never enters the
key); grouping bits are integers.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_pivot_multi_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS f_cents,
           CAST(COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT)
             AS f_n,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS o_cents,
           CAST(COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT)
             AS o_n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_pivot_multi_agg(spark, sf_dir):
    """PIVOT with MULTIPLE simultaneous measures (sum + count per
    pivoted column value) — §2.4 shipped the single-aggregate pivot;
    the multi-measure form is what migration from a BI tool's
    cross-tab actually needs, and Spark names the output columns
    ``<value>_<alias>`` so both measures must be aliased explicitly to
    stay oracle-comparable. Cents stay exact integers end-to-end.

    Scale shape: pivot compiles to one hash aggregate whose state is
    (groups × pivot values × measures) — all bounded domains — with
    map-side partials; the raw stream shuffles once at group grain."""
    li = read_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    p = (
        li.select("l_returnflag", "l_linestatus", cents.alias("cents"))
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.sum("cents").alias("cents"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    # Empty pivot cells come back NULL (Spark skips the aggregate for a
    # missing (group, value) cell entirely — a coalesce INSIDE the agg
    # never runs), while the oracle's CASE form yields 0: zero-fill
    # AFTER the pivot so absent combinations match at every SF.
    return p.select(
        "l_returnflag",
        F.coalesce("F_cents", F.lit(0)).alias("f_cents"),
        F.coalesce("F_n", F.lit(0)).alias("f_n"),
        F.coalesce("O_cents", F.lit(0)).alias("o_cents"),
        F.coalesce("O_n", F.lit(0)).alias("o_n"),
    ).orderBy("l_returnflag")


@query(
    "q_grouping_id",
    oracle="""
    SELECT o_orderstatus,
           o_orderpriority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS BIGINT) AS gid,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def q_grouping_id(spark, sf_dir):
    """GROUPING_ID over grouping sets — the bitmask that tells a
    consumer WHICH aggregation level each row belongs to (a NULL group
    value is otherwise ambiguous with a NULL in the data; §2.4 shipped
    grouping sets without the discriminator). Spark's grouping_id()
    bit order matches GROUPING(a)*2 + GROUPING(b), which is the
    portable spelling DuckDB agrees on.

    Scale shape: one expand + hash aggregate, exact cents."""
    o = read_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    return (
        o.select("o_orderstatus", "o_orderpriority", cents.alias("cents"))
        .groupingSets(
            [
                ["o_orderstatus", "o_orderpriority"],
                ["o_orderstatus"],
                [],
            ],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.sum("cents").alias("cents"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(
            "gid",
            F.asc_nulls_first("o_orderstatus"),
            F.asc_nulls_first("o_orderpriority"),
        )
    )


@query(
    "q_embedding_dedup_bitexact",
    oracle="""
    WITH planted AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, embedding FROM embeddings
      WHERE vec_id % 100 = 0
    ), keyed AS (
      SELECT vec_id,
             MD5(ARRAY_TO_STRING(
               LIST_TRANSFORM(embedding,
                 x -> CAST(CAST(ROUND(CAST(x AS DOUBLE) * 100000) AS BIGINT)
                      AS VARCHAR)),
               ',')) AS digest
      FROM planted
    )
    SELECT k.vec_id AS dup_id, c.canonical_id
    FROM keyed k
    JOIN (SELECT digest, CAST(MIN(vec_id) AS BIGINT) AS canonical_id
          FROM keyed GROUP BY digest) c
      ON c.digest = k.digest
    WHERE k.vec_id <> c.canonical_id
    ORDER BY dup_id
    """,
)
def q_embedding_dedup_bitexact(spark, sf_dir):
    """BIT-EXACT embedding dedup — the audit a training pipeline runs
    before ANN indexing: re-ingested shards carry byte-identical
    vectors under fresh ids, and exact duplicates poison both training
    mixes and recall evals. The fixture's random vectors have no
    natural dups, so the query PLANTS them deterministically (every
    100th vector re-appears under id+1e6) and must find exactly those.

    The join key is a digest of the QUANTIZED vector — each float
    becomes ROUND(x·1e5) as a long before md5 — so the shuffle carries
    16-byte digests instead of full vectors (the 100 TB shape: dedup
    n vectors with an n-row digest aggregate, never an array-keyed
    join), and the key derivation is integer-identical cross-engine.

    Scale shape: one narrow digest projection, one group-by on the
    digest (min id), one digest-keyed join back."""
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    planted = emb.unionByName(
        emb.filter(F.col("vec_id") % 100 == 0).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
        )
    )
    digest = F.md5(
        F.array_join(
            F.transform(
                F.col("embedding"),
                # float→double FIRST (exact), then double math: float32
                # arithmetic would round differently than the oracle's
                lambda x: F.round(x.cast("double") * 100000)
                .cast("bigint")
                .cast("string"),
            ),
            ",",
        )
    )
    keyed = planted.select("vec_id", digest.alias("digest"))
    canon = keyed.groupBy("digest").agg(
        F.min("vec_id").alias("canonical_id")
    )
    return (
        keyed.join(canon, "digest")
        .filter(F.col("vec_id") != F.col("canonical_id"))
        .select(F.col("vec_id").alias("dup_id"), "canonical_id")
        .orderBy("dup_id")
    )
