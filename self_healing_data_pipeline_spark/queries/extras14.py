"""Round-5 batch 9 (SURVEY.md §2.3/§2.11): the FEATURE-STORE surface —
point-in-time-correct feature retrieval against SCD2 version ranges
(the training-set assembly step whose absence causes label leakage),
and broadcast-stats feature standardization.

Scale discipline: the PIT join is an equi-join on the entity key with
the validity-range predicate as a residual (never a cross product);
standardization is one moment-sum pass broadcast back over the rows,
with every IEEE op in oracle-identical operand order (IEEE-754 sqrt is
correctly rounded, so even the sigma path is bit-exact)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_join_pit",
    oracle="""
    WITH v AS (
      SELECT o_custkey,
             o_orderkey AS version_key,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS feature_cents,
             o_orderdate AS eff_from,
             LEAD(o_orderdate) OVER
               (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS eff_to
      FROM orders
    )
    SELECT l.l_orderkey, l.l_linenumber, o.o_custkey,
           STRFTIME(l.l_shipdate, '%Y-%m-%d') AS ship_date,
           v.version_key, v.feature_cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    LEFT JOIN v ON v.o_custkey = o.o_custkey
          AND l.l_shipdate >= v.eff_from
          AND (v.eff_to IS NULL OR l.l_shipdate < v.eff_to)
    ORDER BY l.l_orderkey, l.l_linenumber
    """,
)
def q_join_pit(spark, sf_dir):
    """POINT-IN-TIME join (feature-store training-set assembly): each
    line item retrieves the customer feature version that was in effect
    ON ITS SHIP DATE — the q_scd2_versions validity ranges queried the
    way a feature store must query them, because joining "current"
    feature values onto historical facts leaks the future into
    training data. Versions derive from the customer's own order
    history (feature = the version-defining order's exact cents), facts
    are the customer's shipped lines; this generator ships many lines
    BEFORE their order date, so ~9% of facts predate the customer's
    first version — those keep NULL features via the LEFT join, which
    is the point-in-time-CORRECT answer (no feature existed yet; an
    inner join would silently drop training facts, a NULL row is an
    explicit "feature unavailable" the training pipeline can impute).

    Plan: facts reach their customer key via a broadcast-eligible
    equi-join, then ONE LEFT equi-join on o_custkey carries the
    validity predicate as a residual — range selection inside the
    matched key group, never a cross product. At most one version
    matches (ranges partition the timeline from the first version on),
    so output cardinality = fact cardinality exactly."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    v = o.select(
        F.col("o_custkey").alias("v_custkey"),
        F.col("o_orderkey").alias("version_key"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("feature_cents"),
        F.col("o_orderdate").alias("eff_from"),
        F.lead("o_orderdate").over(w).alias("eff_to"),
    )
    facts = li.select("l_orderkey", "l_linenumber", "l_shipdate").join(
        o.select("o_orderkey", "o_custkey"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return (
        facts.join(
            v,
            (v.v_custkey == facts.o_custkey)
            & (facts.l_shipdate >= v.eff_from)
            & (v.eff_to.isNull() | (facts.l_shipdate < v.eff_to)),
            "left",
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "o_custkey",
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
            "version_key",
            "feature_cents",
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q_feature_scale",
    oracle="""
    WITH c AS (
      SELECT o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS sx,
             SUM(CAST(cents AS DECIMAL(38,0)) * cents) AS sxx,
             CAST(MIN(cents) AS BIGINT) AS mn,
             CAST(MAX(cents) AS BIGINT) AS mx
      FROM c
    )
    SELECT c.o_orderkey,
           c.cents,
           (CAST(c.cents AS DOUBLE) - CAST(m.sx AS DOUBLE) / CAST(m.n AS DOUBLE))
             / (SQRT(CAST(CAST(m.n AS DECIMAL(38,0)) * m.sxx
                          - CAST(m.sx AS DECIMAL(38,0)) * m.sx AS DOUBLE))
                / CAST(m.n AS DOUBLE))
             AS zscore,
           CAST(c.cents - m.mn AS DOUBLE) / CAST(m.mx - m.mn AS DOUBLE)
             AS minmax
    FROM c, m
    """,
)
def q_feature_scale(spark, sf_dir):
    """Feature standardization (the preprocessing step before model
    training): per-order z-score and min-max scaling of the price
    feature from ONE moment-sum pass (n, Σx, Σx², min, max over exact
    cents) broadcast back over the row scan — two column-pruned scans
    total (stats + rows), never a global sort or per-row re-aggregation.

    Cross-engine exactness: population sigma = sqrt(n·Σx² − (Σx)²)/n
    with the SECOND MOMENT carried in exact DECIMAL(38) (cents² sums
    overflow int64 even at tiny SFs — Spark's ANSI mode rightly
    refuses; the decimal lane is the repo's ``dsum`` discipline applied
    to variance); the single decimal→double cast rounds identically on
    both engines, IEEE-754 sqrt is correctly rounded, and the remaining
    subtract/divide operand order mirrors the oracle — bit-exact."""
    o = read_table(spark, sf_dir, "orders")
    c = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    m = c.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("sx"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias("sxx"),
        F.min("cents").cast("bigint").alias("mn"),
        F.max("cents").cast("bigint").alias("mx"),
    )
    mu = F.col("sx").cast("double") / F.col("n").cast("double")
    sigma = F.sqrt(
        (
            F.col("n").cast("decimal(38,0)") * F.col("sxx")
            - F.col("sx").cast("decimal(38,0)") * F.col("sx")
        ).cast("double")
    ) / F.col("n").cast("double")
    return c.crossJoin(F.broadcast(m)).select(
        "o_orderkey",
        "cents",
        ((F.col("cents").cast("double") - mu) / sigma).alias("zscore"),
        (
            (F.col("cents") - F.col("mn")).cast("double")
            / (F.col("mx") - F.col("mn")).cast("double")
        ).alias("minmax"),
    )
