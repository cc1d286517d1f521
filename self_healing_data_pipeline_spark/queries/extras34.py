"""Round-6 batch 16 (SURVEY.md §2.4 profiling / Tier-A healing): the
SELF-HEALING TRANSFORMS the repo is named for, as oracle-checked
queries — MISSING-VALUE IMPUTATION (a deterministically damaged column
healed with per-group exact medians, with a no-nulls-after witness)
and WINSORIZATION (outlier capping at exact p1/p99 with clipped-mass
accounting).

Reference scope: the catalog app's EP2 'self-healing' flow repairs
data before load (`APP/App.tsx:18-27` state machine,
`geminiService.ts:64` column analysis); these are the two repairs
every warehouse profiler recommends."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_impute_missing",
    oracle="""
    WITH dirty AS (
      -- deterministic damage: ~5% of lines lose their discount
      -- (md5-threshold on the composite line key, same on both engines)
      SELECT l_returnflag AS flag,
             CASE WHEN SUBSTR(MD5(CAST(l_orderkey AS VARCHAR) || '-'
                              || CAST(l_linenumber AS VARCHAR)), 1, 2)
                       < '0d'
                  THEN NULL
                  ELSE CAST(ROUND(l_discount * 100) AS BIGINT) END AS dc
      FROM lineitem
    ), grain AS (
      SELECT flag, dc, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM dirty WHERE dc IS NOT NULL GROUP BY 1, 2
    ), med AS (
      SELECT flag, CAST(MIN(dc) AS BIGINT) AS median_dc
      FROM (
        SELECT flag, dc,
               SUM(cnt) OVER (PARTITION BY flag ORDER BY dc
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cumw,
               SUM(cnt) OVER (PARTITION BY flag) AS total
        FROM grain
      ) WHERE 2 * cumw >= total GROUP BY flag
    )
    SELECT d.flag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN d.dc IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_missing,
           m.median_dc AS imputed_with,
           CAST(SUM(COALESCE(d.dc, m.median_dc)) AS BIGINT)
             AS healed_sum_cents,
           CAST(SUM(CASE WHEN COALESCE(d.dc, m.median_dc) IS NULL
                         THEN 1 ELSE 0 END) = 0 AS BOOLEAN)
             AS clean_after
    FROM dirty d JOIN med m ON d.flag = m.flag
    GROUP BY d.flag, m.median_dc ORDER BY d.flag
    """,
)
def q_impute_missing(spark, sf_dir):
    """MISSING-VALUE IMPUTATION — the headline self-healing repair: a
    deterministically damaged discount column (~5% of lines NULLed by
    md5-threshold, rebuildable on both engines) heals with each return
    flag's EXACT lower median of the surviving values, and the query
    reports per flag: rows, missing count, the imputed value, the
    healed exact-cents mass, and the `clean_after` witness the oracle
    expects TRUE — zero NULLs remain (the property the Tier-A pipeline
    gate signs off on).

    Determinism: the median is rank selection on the (flag, value)
    grain (2·cumw ≥ total, integer arithmetic — the q_weighted_median
    discipline); healed sums are exact integers.

    Scale shape: the value grain is DOMAIN-bounded (discounts have ~11
    distinct cents values), so the median pass is a toy frame; the
    repair itself is one broadcast join + narrow coalesce over the
    fact — embarrassingly parallel."""
    li = read_table(spark, sf_dir, "lineitem")
    h = F.md5(
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.lit("-"),
            F.col("l_linenumber").cast("string"),
        )
    )
    dirty = li.select(
        F.col("l_returnflag").alias("flag"),
        F.when(F.substring(h, 1, 2) < "0d", F.lit(None)).otherwise(
            F.round(F.col("l_discount") * 100).cast("bigint")
        ).alias("dc"),
    )
    grain = (
        dirty.filter(F.col("dc").isNotNull())
        .groupBy("flag", "dc")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    wo = Window.partitionBy("flag").orderBy("dc").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wt = Window.partitionBy("flag")
    med = (
        grain.select(
            "flag",
            "dc",
            F.sum("cnt").over(wo).alias("cumw"),
            F.sum("cnt").over(wt).alias("total"),
        )
        .filter(2 * F.col("cumw") >= F.col("total"))
        .groupBy("flag")
        .agg(F.min("dc").cast("bigint").alias("median_dc"))
    )
    healed = F.coalesce(F.col("dc"), F.col("median_dc"))
    return (
        dirty.join(F.broadcast(med), "flag")
        .groupBy("flag", F.col("median_dc").alias("imputed_with"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("dc").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_missing"),
            F.sum(healed).cast("bigint").alias("healed_sum_cents"),
            (
                F.sum(F.when(healed.isNull(), 1).otherwise(0)) == 0
            ).alias("clean_after"),
        )
        .select(
            "flag",
            "n_rows",
            "n_missing",
            "imputed_with",
            "healed_sum_cents",
            "clean_after",
        )
        .orderBy("flag")
    )


@query(
    "q_winsorize",
    oracle="""
    WITH vals AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v FROM orders
    ), grain AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM vals GROUP BY 1
    ), c AS (
      SELECT v, cnt,
             SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cumw,
             SUM(cnt) OVER () AS total
      FROM grain
    ), caps AS (
      SELECT MIN(CASE WHEN 100 * cumw >= total THEN v END) AS lo_cap,
             MIN(CASE WHEN 100 * cumw >= 99 * total THEN v END) AS hi_cap
      FROM c
    )
    SELECT CAST(caps.lo_cap AS BIGINT) AS lo_cap,
           CAST(caps.hi_cap AS BIGINT) AS hi_cap,
           CAST(SUM(CASE WHEN t.v < caps.lo_cap THEN 1 ELSE 0 END) AS BIGINT)
             AS n_below,
           CAST(SUM(CASE WHEN t.v > caps.hi_cap THEN 1 ELSE 0 END) AS BIGINT)
             AS n_above,
           CAST(SUM(t.v) AS BIGINT) AS sum_before,
           CAST(SUM(GREATEST(caps.lo_cap, LEAST(caps.hi_cap, t.v)))
                AS BIGINT) AS sum_after
    FROM vals t, caps GROUP BY caps.lo_cap, caps.hi_cap
    """,
)
def q_winsorize(spark, sf_dir):
    """WINSORIZATION — the outlier repair beside imputation: order
    totals clamp to the exact [p1, p99] band (caps by rank selection:
    the smallest value whose cumulative mass reaches ⌈p·N⌉, as the
    integer test 100·cumw ≥ p·total), reporting the caps, how many
    rows clipped on each side, and the exact-cents mass before/after —
    the audit trail a healing pipeline must publish when it rewrites
    values.

    Scale shape: cap-finding runs on the VALUE GRAIN (price-domain
    bounded — q_histogram_equidepth's argument; swap in its two-phase
    running sum if the domain ever outgrows one partition); the clamp
    is a broadcast 1-row caps frame + narrow greatest/least over the
    fact. All exact integers."""
    o = read_table(spark, sf_dir, "orders")
    vals = o.select(F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"))
    grain = vals.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    wo = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = grain.select(
        "v",
        F.sum("cnt").over(wo).alias("cumw"),
        F.sum("cnt").over(Window.partitionBy()).alias("total"),
    )
    caps = c.agg(
        F.min(
            F.when(100 * F.col("cumw") >= F.col("total"), F.col("v"))
        ).cast("bigint").alias("lo_cap"),
        F.min(
            F.when(100 * F.col("cumw") >= 99 * F.col("total"), F.col("v"))
        ).cast("bigint").alias("hi_cap"),
    )
    clamped = F.greatest(F.col("lo_cap"), F.least(F.col("hi_cap"), F.col("v")))
    return (
        vals.crossJoin(F.broadcast(caps))
        .groupBy("lo_cap", "hi_cap")
        .agg(
            F.sum(F.when(F.col("v") < F.col("lo_cap"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_below"),
            F.sum(F.when(F.col("v") > F.col("hi_cap"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_above"),
            F.sum("v").cast("bigint").alias("sum_before"),
            F.sum(clamped).cast("bigint").alias("sum_after"),
        )
        .select(
            "lo_cap", "hi_cap", "n_below", "n_above", "sum_before", "sum_after"
        )
    )
