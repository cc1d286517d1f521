"""Round-6 batch 53 (SURVEY.md §2.11 DQ / warehouse integrity):
LEDGER RECONCILIATION (order-header totals tied against the sum of
their lines — the subledger-to-ledger tie-out every finance close
runs, reported as a signed magnitude-decade histogram of the exact
cent deltas) and SCD2 INTEGRITY (validity-interval audit over the
q_scd2_versions build: zero-length versions from same-day ties,
exactly-one-current per key, monotone starts — the contract checks a
dimension table must pass before anyone joins it point-in-time).

Exactness: all deltas and counters are exact integer cents/counts;
the only doubles are display-only shares."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_ledger_reconciliation",
    oracle="""
    WITH l AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                                 * (1 + l_tax) * 100) AS BIGINT))
                  AS BIGINT) AS line_cents
      FROM lineitem GROUP BY 1
    ), d AS (
      SELECT CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
               - COALESCE(l.line_cents, 0) AS delta
      FROM orders o LEFT JOIN l ON o.o_orderkey = l.l_orderkey
    ), b AS (
      SELECT CASE WHEN delta = 0 THEN 0
                  WHEN delta > 0 THEN CAST(FLOOR(LOG10(delta)) AS BIGINT) + 1
                  ELSE -(CAST(FLOOR(LOG10(-delta)) AS BIGINT) + 1) END
               AS decade,
             delta
      FROM d
    )
    SELECT decade,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(delta) AS BIGINT) AS total_delta_cents,
           CAST(MIN(delta) AS BIGINT) AS min_delta,
           CAST(MAX(delta) AS BIGINT) AS max_delta
    FROM b GROUP BY decade ORDER BY decade
    """,
)
def q_ledger_reconciliation(spark, sf_dir):
    """LEDGER RECONCILIATION: per order, header total minus the sum of
    its lines under the TPC-H pricing law extendedprice·(1−disc)·
    (1+tax), in exact cents, rolled into a SIGNED MAGNITUDE-DECADE
    histogram (decade 0 = ties exactly; +3 = off by $1–10 in the
    header's favor; …) — the subledger tie-out a finance close runs
    nightly. On this synthetic fixture the header totals do NOT tie
    to the lines (0 of ~15k orders at decade 0) — precisely the
    finding the report exists to surface; orders with no lines land
    in the full-header-delta decades via the LEFT join.

    Scale shape: one key-grain line aggregate, one co-partitionable
    LEFT join, one bounded (~20-row) decade rollup. Exact integers
    end to end; LOG10 of an exact positive integer buckets
    identically on both engines."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    l = li.groupBy("l_orderkey").agg(
        F.sum(
            F.round(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
                * 100
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("line_cents")
    )
    d = o.join(l, o.o_orderkey == l.l_orderkey, "left").select(
        (
            F.round(F.col("o_totalprice") * 100).cast("bigint")
            - F.coalesce(F.col("line_cents"), F.lit(0))
        ).alias("delta")
    )
    decade = (
        F.when(F.col("delta") == 0, F.lit(0))
        .when(
            F.col("delta") > 0,
            F.floor(F.log10(F.col("delta"))).cast("bigint") + 1,
        )
        .otherwise(-(F.floor(F.log10(-F.col("delta"))).cast("bigint") + 1))
    )
    return (
        d.select(decade.alias("decade"), "delta")
        .groupBy("decade")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("delta").cast("bigint").alias("total_delta_cents"),
            F.min("delta").cast("bigint").alias("min_delta"),
            F.max("delta").cast("bigint").alias("max_delta"),
        )
        .orderBy("decade")
    )


@query(
    "q_scd2_integrity",
    oracle="""
    WITH v AS (
      SELECT o_custkey AS k, o_orderdate AS eff_from,
             LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey)
               AS eff_to
      FROM orders
    ), per_key AS (
      SELECT k,
             CAST(COUNT(*) AS BIGINT) AS n_versions,
             CAST(SUM(CASE WHEN eff_to = eff_from THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_zero_len,
             CAST(SUM(CASE WHEN eff_to IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_current,
             CAST(SUM(CASE WHEN eff_to < eff_from THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_inverted
      FROM v GROUP BY k
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(n_versions) AS BIGINT) AS n_versions,
           CAST(SUM(n_zero_len) AS BIGINT) AS n_zero_length,
           CAST(SUM(CASE WHEN n_current <> 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS keys_bad_current,
           CAST(SUM(n_inverted) AS BIGINT) AS n_inverted,
           CAST(MAX(n_versions) AS BIGINT) AS max_versions_per_key,
           CAST(SUM(n_zero_len) AS DOUBLE) / CAST(SUM(n_versions) AS DOUBLE)
             AS zero_length_share
    FROM per_key
    """,
)
def q_scd2_integrity(spark, sf_dir):
    """SCD2 INTEGRITY AUDIT over the q_scd2_versions construction:
    zero-length versions (same-day ties make effective_from =
    effective_to — rows a point-in-time join can NEVER return, the
    silent data-loss mode of lead()-built SCD2), exactly-one-current
    per key (keys_bad_current must be 0 by construction — the oracle
    pins it), inverted intervals (must be 0 — lead over the sort key
    can't go backwards), and the version-count ceiling. These are the
    contract checks run before anyone trusts q_join_pit /
    q_bitemporal against a dimension.

    Scale shape: the same single per-key lead window the SCD2 build
    uses (parallel by key), one key-grain conditional aggregate, and
    a 1-row corpus rollup."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    v = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("eff_from"),
        F.lead("o_orderdate").over(w).alias("eff_to"),
    )
    per_key = v.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_versions"),
        F.sum(
            F.when(F.col("eff_to") == F.col("eff_from"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_zero_len"),
        F.sum(F.when(F.col("eff_to").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_current"),
        F.sum(
            F.when(F.col("eff_to") < F.col("eff_from"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_inverted"),
    )
    return per_key.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("n_versions").cast("bigint").alias("n_versions"),
        F.sum("n_zero_len").cast("bigint").alias("n_zero_length"),
        F.sum(F.when(F.col("n_current") != 1, 1).otherwise(0))
        .cast("bigint")
        .alias("keys_bad_current"),
        F.sum("n_inverted").cast("bigint").alias("n_inverted"),
        F.max("n_versions").cast("bigint").alias("max_versions_per_key"),
        (
            F.sum("n_zero_len").cast("double")
            / F.sum("n_versions").cast("double")
        ).alias("zero_length_share"),
    )
