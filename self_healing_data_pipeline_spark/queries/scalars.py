"""Scalar-function surface queries (SURVEY.md §2.8, build step 4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_string_funcs",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS seg_lower,
           SUBSTRING(c_name, 1, 50) AS name_trunc,
           LENGTH(c_name) AS name_len,
           REGEXP_REPLACE(c_name, '[^a-zA-Z0-9_]', '_', 'g') AS name_ident,
           TRIM(CONCAT(c_name, ' ')) AS name_trim,
           CONCAT_WS('|', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key,
           SPLIT_PART(c_name, '#', 1) AS name_prefix
    FROM customer
    """,
)
def q_string_funcs(spark, sf_dir):
    """String family: case, substring/truncate (reference DataTable.tsx:39
    50-char cut), regex sanitize (reference App.tsx:132 identifier rule),
    trim, concat, split."""
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 50).alias("name_trunc"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.regexp_replace("c_name", "[^a-zA-Z0-9_]", "_").alias("name_ident"),
        F.trim(F.concat(F.col("c_name"), F.lit(" "))).alias("name_trim"),
        F.concat_ws("|", F.col("c_mktsegment"), F.col("c_custkey").cast("string")).alias("seg_key"),
        F.split(F.col("c_name"), "#").getItem(0).alias("name_prefix"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS order_month,
           CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS order_day,
           STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS month_start,
           CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_epoch_start,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date_str
    FROM orders
    """,
)
def q_date_funcs(spark, sf_dir):
    """Date/time family: extract, trunc, diff, format (SURVEY.md §2.8)."""
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("order_day"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_epoch_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(l_discount AS DECIMAL(12,2)) AS DOUBLE) AS discount_amt,
           ABS(l_extendedprice - 1000.0) AS dist_from_1000,
           CAST(FLOOR(l_quantity / 10.0) AS BIGINT) AS qty_bucket,
           CAST(CEIL(l_tax * 100.0) AS BIGINT) AS tax_pct_ceil,
           MOD(l_orderkey, 7) AS key_mod,
           POWER(CAST(l_quantity AS DOUBLE), 2.0) AS qty_sq,
           SQRT(CAST(l_quantity AS DOUBLE)) AS qty_sqrt
    FROM lineitem
    """,
)
def q_math_funcs(spark, sf_dir):
    """Math family. The price·discount product goes through exact decimal
    (ROUND on doubles is not portable: Spark rounds the shortest-decimal
    representation, DuckDB the binary value — they split on .xx5 cases)."""
    li = read_table(spark, sf_dir, "lineitem")
    from self_healing_data_pipeline_spark.functions.scalar import dec

    return li.select(
        "l_orderkey",
        "l_linenumber",
        (dec("l_extendedprice") * dec("l_discount")).cast("double").alias("discount_amt"),
        F.abs(F.col("l_extendedprice") - 1000.0).alias("dist_from_1000"),
        F.floor(F.col("l_quantity") / 10.0).cast("bigint").alias("qty_bucket"),
        F.ceil(F.col("l_tax") * 100.0).cast("bigint").alias("tax_pct_ceil"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.pow(F.col("l_quantity").cast("double"), 2.0).alias("qty_sq"),
        F.sqrt(F.col("l_quantity").cast("double")).alias("qty_sqrt"),
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(LEN(embedding) AS BIGINT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_elem,
           CAST(embedding[64] AS DOUBLE) AS last_elem
    FROM embeddings
    """,
)
def q_array_funcs(spark, sf_dir):
    """Array family over the embedding column: size, element access.
    (Vector math lives in q_sim_* — functions.vector.)"""
    e = read_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.col("embedding").getItem(0).cast("double").alias("first_elem"),
        F.col("embedding").getItem(63).cast("double").alias("last_elem"),
    )


@query(
    "q_array_explode",
    oracle="""
    SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS elem
    FROM embeddings, generate_series(1, 4) AS t(i)
    """,
)
def q_array_explode(spark, sf_dir):
    """Array → rows (UNNEST/posexplode) with position, over the first 4
    embedding components (§2.8 array family, the lateral-view workhorse)."""
    e = read_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", F.posexplode(F.slice("embedding", 1, 4)).alias("pos", "elem")
    ).select("vec_id", "pos", F.col("elem").cast("double").alias("elem"))


@query("q_agg_approx_percentile")  # sketch-based: engines differ → rows-only
def q_agg_approx_percentile(spark, sf_dir):
    """approx_percentile (KLL-style sketch) — the 100 TB quantile profiler
    (exact percentile needs a global sort; the sketch merges map-side).

    The quantile array is posexploded to scalar (flag, idx, value) rows so
    the output stays flat (driver canonicalizers can't hash array cells).
    Self-witnessing at TWO strengths (round-4 upgrade, mirroring the HLL
    accuracy gate q_distinct_sketch_accuracy): ``within_bounds`` brackets
    each approx value by the group min/max, and ``rank_ok`` verifies the
    sketch's actual accuracy contract — the returned value's TRUE rank
    INTERVAL in the group, [count(< v)/n, count(<= v)/n] (measured by one
    exact conditional-count aggregate joined back), must bracket the
    requested quantile within 0.001, 10× looser than the configured
    1/10000 rank-error guarantee. The tie-aware interval matters: on a
    column with heavy value ties, count(<= v) alone overshoots the target
    by the tie mass of v even when the sketch meets its contract — the
    percentile of a tied value is the whole interval, so the gate tests
    interval membership, not a point. The verification join broadcasts
    the 12-row quantile table onto the fact side — the witness costs one
    extra aggregate, never a sort."""
    li = read_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.95], 10000).alias(
            "price_quantiles"
        ),
        F.min("l_extendedprice").alias("grp_min"),
        F.max("l_extendedprice").alias("grp_max"),
    )
    qrows = agg.select(
        "l_returnflag",
        F.posexplode("price_quantiles").alias("quantile_idx", "quantile_value"),
        "grp_min",
        "grp_max",
    ).withColumn(
        "target_p",
        F.element_at(
            F.array(F.lit(0.25), F.lit(0.5), F.lit(0.95)),
            F.col("quantile_idx").cast("int") + 1,
        ),
    )
    achieved = (
        li.select("l_returnflag", "l_extendedprice")
        .join(F.broadcast(qrows), "l_returnflag")
        .groupBy("l_returnflag", "quantile_idx")
        .agg(
            F.min("quantile_value").alias("quantile_value"),
            F.min("grp_min").alias("grp_min"),
            F.min("grp_max").alias("grp_max"),
            F.min("target_p").alias("target_p"),
            (
                F.sum(
                    F.when(
                        F.col("l_extendedprice") < F.col("quantile_value"), 1
                    ).otherwise(0)
                )
                / F.count(F.lit(1)).cast("double")
            ).alias("achieved_lo"),
            (
                F.sum(
                    F.when(
                        F.col("l_extendedprice") <= F.col("quantile_value"), 1
                    ).otherwise(0)
                )
                / F.count(F.lit(1)).cast("double")
            ).alias("achieved_hi"),
            F.count(F.lit(1)).alias("grp_n"),
        )
    )
    return achieved.select(
        "l_returnflag",
        F.col("quantile_idx").cast("bigint").alias("quantile_idx"),
        F.col("quantile_value").cast("double").alias("quantile_value"),
        (
            (F.col("quantile_value") >= F.col("grp_min"))
            & (F.col("quantile_value") <= F.col("grp_max"))
        ).alias("within_bounds"),
        (
            # tie-aware: target must fall within the value's rank
            # interval [count(< v)/n, count(<= v)/n], slackened by the
            # sketch guarantee (1e-4, 10× slack) OR one rank step
            # (1/n — achieved ranks are quantized on small groups)
            (
                F.col("target_p")
                >= F.col("achieved_lo")
                - F.greatest(F.lit(0.001), 1.0 / F.col("grp_n").cast("double"))
            )
            & (
                F.col("target_p")
                <= F.col("achieved_hi")
                + F.greatest(F.lit(0.001), 1.0 / F.col("grp_n").cast("double"))
            )
        ).alias("rank_ok"),
    )


@query(
    "q_json_funcs",
    oracle="""
    SELECT event_id,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def q_json_funcs(spark, sf_dir):
    """Semi-structured extraction from a JSON string column (the reference
    keeps JSON values opaque — dataProcessingService.ts:19-27; we extract
    with get_json_object, no UDF)."""
    ev = read_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
    )


@query(
    "q_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 100000 THEN 'large'
                WHEN o_totalprice >= 10000 THEN 'medium'
                ELSE 'small' END AS size_class,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label
    FROM orders
    """,
)
def q_conditional(spark, sf_dir):
    """CASE / COALESCE / NULLIF."""
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 100000, "large")
        .when(F.col("o_totalprice") >= 10000, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")
        ).alias("status_label"),
    )


@query(
    "q_regexp_funcs",
    oracle="""
    SELECT doc_id,
           REGEXP_EXTRACT(text, '([a-z]{6,})', 1) AS first_long_word,
           LENGTH(REGEXP_REPLACE(text, '[aeiou]', '', 'g')) AS consonant_len,
           REGEXP_MATCHES(text, '\\d') AS has_digit,
           LENGTH(text) - LENGTH(REGEXP_REPLACE(text, ' ', '', 'g'))
             AS n_spaces
    FROM documents
    ORDER BY doc_id
    """,
)
def q_regexp_funcs(spark, sf_dir):
    """Regexp family (the structured-extraction workhorses the reference's
    generated ETL SQL leans on): first capture-group extract, global
    replace, boolean match, and occurrence counting via replace-length
    delta (the one formulation whose semantics are byte-identical across
    engines — REGEXP_COUNT flavors disagree on overlap/empty matches).
    All four run JVM-side inside codegen; no UDF."""
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", "([a-z]{6,})", 1).alias("first_long_word"),
        F.length(F.regexp_replace("text", "[aeiou]", ""))
        .cast("bigint")
        .alias("consonant_len"),
        F.col("text").rlike("\\d").alias("has_digit"),
        (
            F.length("text") - F.length(F.regexp_replace("text", " ", ""))
        )
        .cast("bigint")
        .alias("n_spaces"),
    ).orderBy("doc_id")
