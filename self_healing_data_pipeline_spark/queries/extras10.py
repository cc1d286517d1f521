"""Round-5 batch 5 (SURVEY.md §2.9/§2.11): statistical analytics —
OLS trend fitting over daily revenue, market-basket association rules
(support / confidence / lift), and a contingency table with chi-square
cell contributions (categorical drift detection).

Scale discipline: every statistic reduces to EXACT integer moment sums
via map-side partial aggregation (x centered on the broadcast min day
so Σxy fits int64 even at 100 TB daily volumes), with the named IEEE
divisions applied in oracle-identical operand order at the very end —
never a float accumulated across rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.operators.graph import (
    CO_PAIR_CTE_SQL as _CO_PAIR_CTE,
    co_pairs_from_baskets,
    order_baskets,
)
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_revenue_trend",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ), based AS (
      SELECT event_type,
             CAST(d - (SELECT MIN(d) FROM daily) AS BIGINT) AS x,
             cents AS y
      FROM daily
    ), m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM based GROUP BY event_type
    )
    SELECT event_type, n, sx, sy,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_cents_per_day,
           (CAST(sy AS DOUBLE)
            - (CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) AS intercept_cents
    FROM m ORDER BY event_type
    """,
)
def q_revenue_trend(spark, sf_dir):
    """Per-type OLS linear trend of daily revenue — is each event
    type's revenue growing or shrinking, as a fitted slope in
    cents/day (the trend-detection analytic behind every KPI dashboard).

    Plan: daily exact-cents aggregate → moment sums (n, Σx, Σy, Σxy,
    Σx²) in ONE map-side-partial aggregate per type — the closed-form
    least-squares normal equations need nothing else. x is the day
    offset from the broadcast global min day, so Σxy stays far inside
    int64 at any corpus scale (raw epoch-days × 100 TB daily cents
    would overflow). slope and intercept are the only IEEE operations,
    in oracle-identical operand order."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    # global min day as a WINDOW OVER THE AGGREGATE (the one-scan
    # report policy, SCALE.md): the ordered stage touches only the
    # bounded types x days rollup, and events scan once
    from pyspark.sql import Window as _W

    based = daily.withColumn("d0", F.min("d").over(_W.partitionBy())).select(
        "event_type",
        F.datediff("d", "d0").cast("bigint").alias("x"),
        F.col("cents").alias("y"),
    )
    m = based.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return m.select(
        "event_type",
        "n",
        "sx",
        "sy",
        slope.alias("slope_cents_per_day"),
        (
            (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("intercept_cents"),
    ).orderBy("event_type")


@query(
    "q_basket_rules",
    oracle=f"""
    WITH {_CO_PAIR_CTE}, n_orders AS (
      SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS nb FROM pp
    ), item AS (
      SELECT l_partkey AS p, CAST(COUNT(*) AS BIGINT) AS np
      FROM pp GROUP BY 1
    ), rules AS (
      SELECT p1 AS antecedent, p2 AS consequent, w AS nab FROM cop
      UNION ALL
      SELECT p2, p1, w FROM cop
    )
    SELECT r.antecedent, r.consequent, r.nab AS n_both,
           ia.np AS n_ante, ic.np AS n_cons,
           CAST(r.nab AS DOUBLE) / CAST(ia.np AS DOUBLE) AS confidence,
           CAST(r.nab * (SELECT nb FROM n_orders) AS DOUBLE)
             / CAST(ia.np * ic.np AS DOUBLE) AS lift
    FROM rules r
    JOIN item ia ON r.antecedent = ia.p
    JOIN item ic ON r.consequent = ic.p
    ORDER BY confidence DESC, lift DESC, r.antecedent, r.consequent
    LIMIT 100
    """,
)
def q_basket_rules(spark, sf_dir):
    """Market-basket ASSOCIATION RULES over co-ordered parts: for each
    directed rule A→B with pair support >= 2 orders, confidence
    P(B|A) and lift P(AB)/(P(A)P(B)) — the Apriori output one level up
    from the existing ``q_basket_pairs`` co-occurrence counts.

    Plan (round-13): the BASKET grain (per-order sorted distinct part
    array, one collect_set shuffle) is materialized ONCE and serves all
    three masses — the basket total is its row count, per-item order
    counts explode it (each part appears once per basket, so this IS
    pp's per-part count), and pairs come from the bounded in-array
    explode (operators.graph.co_pairs_from_baskets) instead of the
    previous within-order self-join. One staging pass where the old
    plan derived the pp distinct three times. All masses exact
    integers; confidence and lift are one IEEE division each (integer
    cross-products as numerator/denominator). Top-100 with a full
    deterministic tie-break chain -> TakeOrdered, no global sort."""
    li = read_table(spark, sf_dir, "lineitem")
    baskets = order_baskets(li).localCheckpoint(eager=True)
    nb = baskets.agg(F.count(F.lit(1)).cast("bigint").alias("nb"))
    item = baskets.select(
        F.explode("parts").alias("p")
    ).groupBy("p").agg(F.count(F.lit(1)).cast("bigint").alias("np"))
    pair = co_pairs_from_baskets(baskets)
    rules = pair.select(
        F.col("p1").alias("antecedent"), F.col("p2").alias("consequent"),
        F.col("w").alias("nab"),
    ).unionAll(
        pair.select(
            F.col("p2").alias("antecedent"), F.col("p1").alias("consequent"),
            F.col("w").alias("nab"),
        )
    )
    out = (
        rules.join(
            item.select(F.col("p").alias("antecedent"), F.col("np").alias("n_ante")),
            "antecedent",
        )
        .join(
            item.select(F.col("p").alias("consequent"), F.col("np").alias("n_cons")),
            "consequent",
        )
        .crossJoin(F.broadcast(nb))
    )
    return (
        out.select(
            "antecedent",
            "consequent",
            F.col("nab").alias("n_both"),
            "n_ante",
            "n_cons",
            (F.col("nab").cast("double") / F.col("n_ante").cast("double")).alias(
                "confidence"
            ),
            (
                (F.col("nab") * F.col("nb")).cast("double")
                / (F.col("n_ante") * F.col("n_cons")).cast("double")
            ).alias("lift"),
        )
        .orderBy(
            F.col("confidence").desc(),
            F.col("lift").desc(),
            F.col("antecedent").asc(),
            F.col("consequent").asc(),
        )
        .limit(100)
    )


@query(
    "q_type_weekday_chisq",
    oracle="""
    WITH obs AS (
      SELECT event_type,
             CAST(DAYOFWEEK(CAST(ts AS DATE)) + 1 AS BIGINT) AS wd,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM events GROUP BY 1, 2
    ), tot AS (
      SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs
    ), rowt AS (
      SELECT event_type, CAST(SUM(o) AS BIGINT) AS r FROM obs GROUP BY 1
    ), colt AS (
      SELECT wd, CAST(SUM(o) AS BIGINT) AS c FROM obs GROUP BY 1
    )
    SELECT obs.event_type, obs.wd, obs.o, rowt.r AS row_total,
           colt.c AS col_total,
           CAST(CAST(rowt.r AS DECIMAL(38,0)) * colt.c AS DOUBLE)
             / CAST(tot.n AS DOUBLE) AS expected,
           CAST((CAST(obs.o AS DECIMAL(38,0)) * tot.n
                 - CAST(rowt.r AS DECIMAL(38,0)) * colt.c)
                * (CAST(obs.o AS DECIMAL(38,0)) * tot.n
                   - CAST(rowt.r AS DECIMAL(38,0)) * colt.c) AS DOUBLE)
             / CAST(CAST(tot.n AS DECIMAL(38,0)) * rowt.r * colt.c AS DOUBLE)
             AS chi_contrib
    FROM obs JOIN rowt USING (event_type) JOIN colt USING (wd), tot
    ORDER BY obs.event_type, obs.wd
    """,
)
def q_type_weekday_chisq(spark, sf_dir):
    """Contingency table event_type × weekday with per-cell chi-square
    contributions — the categorical-independence drift check ("did the
    weekly mix shift?") next to the numeric drift tests in the DQ
    suite. Per-cell statistic: (O·N − R·C)² / (N·R·C), all masses
    exact integers, one IEEE division per cell; the bounded cell grid
    (types × 7) is emitted instead of the order-sensitive float total,
    so the output is deterministic and the caller sums or thresholds
    as needed.

    Plan: ONE counted grain; marginals and the grand total attach as
    windows over the bounded cell grid (types x 7 rows — the
    window-over-aggregate policy), so the event stream is scanned and
    shuffled exactly once and no join appears at all."""
    ev = read_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type",
        F.dayofweek(F.to_date("ts")).cast("bigint").alias("wd"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    # marginals + grand total as WINDOWS OVER THE AGGREGATE (one-scan
    # report policy): three window passes over the bounded types x 7
    # cell grid replace three re-aggregation branches of the event scan
    from pyspark.sql import Window as _W

    j = obs.select(
        "*",
        F.sum("o").over(_W.partitionBy("event_type")).cast("bigint").alias("row_total"),
        F.sum("o").over(_W.partitionBy("wd")).cast("bigint").alias("col_total"),
        F.sum("o").over(_W.partitionBy()).cast("bigint").alias("n"),
    )
    # cross-products in DECIMAL(38): o*n and n*r*c are ~n^2 and ~n^3
    # masses that overflow int64 beyond ~1e7 events (dsum discipline)
    dev = F.col("o").cast("decimal(38,0)") * F.col("n") - F.col(
        "row_total"
    ).cast("decimal(38,0)") * F.col("col_total")
    return j.select(
        "event_type",
        "wd",
        "o",
        "row_total",
        "col_total",
        (
            (F.col("row_total").cast("decimal(38,0)") * F.col("col_total"))
            .cast("double")
            / F.col("n").cast("double")
        ).alias("expected"),
        (
            (dev * dev).cast("double")
            / (
                F.col("n").cast("decimal(38,0)")
                * F.col("row_total")
                * F.col("col_total")
            ).cast("double")
        ).alias("chi_contrib"),
    ).orderBy("event_type", "wd")
