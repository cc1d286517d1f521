"""Round-6 batch 10 (SURVEY.md §2.11 corpus ops / compliance):
TEMPERATURE-BASED multilingual sampling (the p^(1/T) corpus-mixing
rule from multilingual pretraining, in exact integer arithmetic at
T=2) and a K-ANONYMITY audit (quasi-identifier group-size risk — the
privacy check beside q_gdpr_erasure and q_pii_scan).

Reference scope: corpus curation and privacy sign-off are the two
gates every training-data pipeline clears before a crawl ships."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

_SAMPLE_BUDGET = 200
_K_ANON = 5


@query(
    "q_sample_temperature",
    oracle=f"""
    WITH n AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY 1
    ), w AS (
      SELECT lang, n_docs,
             CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE))) AS BIGINT) AS weight
      FROM n
    ), tot AS (
      SELECT CAST(SUM(weight) AS BIGINT) AS wsum FROM w
    ), q AS (
      SELECT w.lang, w.n_docs, w.weight,
             CAST({_SAMPLE_BUDGET} * w.weight // t.wsum AS BIGINT) AS quota
      FROM w, tot t
    ), ranked AS (
      SELECT d.lang,
             ROW_NUMBER() OVER (PARTITION BY d.lang
                                ORDER BY MD5(CAST(d.doc_id AS VARCHAR)),
                                         d.doc_id) AS rn
      FROM documents d
    ), sel AS (
      SELECT r.lang, CAST(COUNT(*) AS BIGINT) AS n_selected
      FROM ranked r JOIN q ON r.lang = q.lang
      WHERE r.rn <= q.quota
      GROUP BY 1
    )
    SELECT q.lang, q.n_docs, q.weight, q.quota,
           COALESCE(s.n_selected, 0) AS n_selected
    FROM q LEFT JOIN sel s ON q.lang = s.lang
    ORDER BY q.lang
    """,
)
def q_sample_temperature(spark, sf_dir):
    """TEMPERATURE SAMPLING for multilingual corpus mixing: per-language
    quotas ∝ n^(1/T) with T=2 — the standard rule that upsamples
    low-resource languages relative to proportional sampling (T=1)
    without the uniform extreme (T→∞). The pipeline: language mass →
    weight = ⌊√n⌋ → integer quota = budget·wᵢ // Σw → deterministic
    md5-ranked selection of exactly quota docs per language.

    Determinism: √ is IEEE-correctly-rounded on both engines (the
    reason T=2 — a general p^(1/T) pow is last-ulp engine-specific);
    floor → exact integers; quotas are integer floor-division; doc
    selection ranks by (md5, doc_id) — rebuild-stable like
    q_split_assign, no RNG.

    Scale shape: language masses are a tiny partial-aggregated rollup;
    weights/quotas are a broadcast few-row frame; selection is ONE
    rank window PARTITIONED by language (quota-bounded output). At
    100 TB the rank window's per-language order is the only big sort —
    shard it further with the md5-prefix bucket trick (rank within
    (lang, md5-prefix), quota per bucket) if a single language
    dominates."""
    docs = read_table(spark, sf_dir, "documents")
    n = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    w = n.withColumn(
        "weight",
        F.floor(F.sqrt(F.col("n_docs").cast("double"))).cast("bigint"),
    )
    tot = w.agg(F.sum("weight").cast("bigint").alias("wsum"))
    scaled = F.lit(_SAMPLE_BUDGET) * F.col("weight")
    quota = (
        (scaled - F.pmod(scaled, F.col("wsum"))) / F.col("wsum")
    ).cast("bigint")
    q = w.crossJoin(F.broadcast(tot)).withColumn("quota", quota).drop("wsum")

    rn = F.row_number().over(
        Window.partitionBy("lang").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
    )
    sel = (
        docs.select("lang", rn.alias("rn"))
        .join(F.broadcast(q.select("lang", "quota")), "lang")
        .filter(F.col("rn") <= F.col("quota"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_selected"))
    )
    return (
        q.join(sel, "lang", "left")
        .select(
            "lang",
            "n_docs",
            "weight",
            "quota",
            F.coalesce(F.col("n_selected"), F.lit(0))
            .cast("bigint")
            .alias("n_selected"),
        )
        .orderBy("lang")
    )


@query(
    "q_k_anonymity",
    oracle=f"""
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment,
             -- shift keeps the dividend non-negative: DuckDB's //
             -- truncates toward zero, Spark's pmod-form floors — they
             -- agree only for >= 0 (balances bottom out at -$10k)
             (CAST(ROUND(c_acctbal * 100) AS BIGINT) + 1000000) // 100000
               - 10 AS bal_band,
             CAST(COUNT(*) AS BIGINT) AS grp_size
      FROM customer GROUP BY 1, 2, 3
    ), bucketed AS (
      SELECT CASE WHEN grp_size >= {_K_ANON}
                  THEN '{_K_ANON}+' ELSE CAST(grp_size AS VARCHAR)
             END AS size_bucket,
             grp_size
      FROM qi
    )
    SELECT size_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(grp_size) AS BIGINT) AS n_rows,
           CAST(MIN(grp_size) < {_K_ANON} AS BOOLEAN) AS at_risk
    FROM bucketed GROUP BY 1 ORDER BY size_bucket
    """,
)
def q_k_anonymity(spark, sf_dir):
    """K-ANONYMITY audit (k=5) over the quasi-identifier tuple
    (nation, market segment, $1000 balance band): group-size
    distribution of the QI grain with every group of size < k flagged
    at-risk — the re-identification check a privacy review runs before
    a dataset leaves the warehouse, and the input to a suppression/
    generalization plan (rows in at-risk buckets are the suppression
    cost; widening bal_band is the generalization knob).

    Scale shape: ONE partial-aggregated QI-grain count (the only
    shuffle — on the QI key), collapsed to a ≤k+1-row size-bucket
    report. Exact integers; the band is integer floor-division of
    cents."""
    cust = read_table(spark, sf_dir, "customer")
    shifted = F.round(F.col("c_acctbal") * 100).cast("bigint") + F.lit(1000000)
    band = (
        (shifted - F.pmod(shifted, F.lit(100000))) / F.lit(100000)
    ).cast("bigint") - F.lit(10)
    qi = cust.groupBy(
        "c_nationkey", "c_mktsegment", band.alias("bal_band")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("grp_size"))
    bucket = F.when(
        F.col("grp_size") >= _K_ANON, F.lit(f"{_K_ANON}+")
    ).otherwise(F.col("grp_size").cast("string"))
    return (
        qi.select(bucket.alias("size_bucket"), "grp_size")
        .groupBy("size_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("grp_size").cast("bigint").alias("n_rows"),
            (F.min("grp_size") < _K_ANON).alias("at_risk"),
        )
        .orderBy("size_bucket")
    )
