"""Round-6 batch 36 (SURVEY.md §2.4 analytics / §2.9 events):
PRICE-VOLUME BRIDGE (the Bennet/midpoint decomposition of a revenue
move into price effect vs volume effect per brand — the "why did
revenue change" companion to q_revenue_bridge's customer waterfall)
and BOT-REGULARITY detection (users whose event inter-arrival gaps
are implausibly regular — low coefficient of variation — the
behavioral-abuse screen every event pipeline runs before counting
engagement).

Exactness: bridge effects are mirrored IEEE chains over exact yearly
integers; the bot verdict is an EXACT INTEGER cross-multiplied
comparison (100·(nΣg²−(Σg)²) < (Σg)² ⟺ cv < 0.1) — no float enters
the flag."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

_Y1, _Y2 = "1998", "1999"
_MIN_GAPS = 10


@query(
    "q_price_volume_bridge",
    oracle=f"""
    WITH j AS (
      SELECT p.p_brand AS brand,
             (l.l_shipdate < TIMESTAMP '{_Y2}-01-01') AS is_y1,
             CAST(ROUND(l.l_quantity) AS BIGINT) AS qty,
             CAST(ROUND(l.l_extendedprice) AS BIGINT) AS dollars
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate >= TIMESTAMP '{_Y1}-01-01'
        AND l.l_shipdate < TIMESTAMP '{int(_Y2) + 1}-01-01'
    ), per AS (
      SELECT brand,
             CAST(SUM(CASE WHEN is_y1 THEN qty ELSE 0 END) AS BIGINT) AS q1,
             CAST(SUM(CASE WHEN is_y1 THEN dollars ELSE 0 END) AS BIGINT)
               AS r1,
             CAST(SUM(CASE WHEN is_y1 THEN 0 ELSE qty END) AS BIGINT) AS q2,
             CAST(SUM(CASE WHEN is_y1 THEN 0 ELSE dollars END) AS BIGINT)
               AS r2
      FROM j GROUP BY 1
      HAVING SUM(CASE WHEN is_y1 THEN qty ELSE 0 END) > 0
         AND SUM(CASE WHEN is_y1 THEN 0 ELSE qty END) > 0
    )
    SELECT brand, q1, r1, q2, r2,
           CAST(r2 - r1 AS BIGINT) AS delta_dollars,
           (CAST(r2 AS DOUBLE) / CAST(q2 AS DOUBLE)
            - CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE))
             * (CAST(q1 AS DOUBLE) + CAST(q2 AS DOUBLE)) / 2.0
             AS price_effect,
           (CAST(q2 AS DOUBLE) - CAST(q1 AS DOUBLE))
             * (CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE)
                + CAST(r2 AS DOUBLE) / CAST(q2 AS DOUBLE)) / 2.0
             AS volume_effect
    FROM per ORDER BY brand
    """,
)
def q_price_volume_bridge(spark, sf_dir):
    """PRICE-VOLUME BRIDGE 1998→1999 per brand: the Bennet
    (midpoint) decomposition Δrevenue ≈ Δp·q̄ + Δq·p̄ with p̄, q̄ the
    two-period midpoints — identifying whether a brand's move came
    from unit economics or demand. The identity price_effect +
    volume_effect = Δrevenue holds exactly in the reals; both effects
    are emitted as mirrored IEEE chains beside the EXACT integer
    delta so the reader can audit the residual.

    Scale shape: one pushed two-year range scan, broadcast part dim,
    ONE brand-grain conditional aggregate (never a self-join of the
    two years) — the q_revenue_bridge single-pass discipline at brand
    grain. No window, no SinglePartition."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    j = (
        li.filter(
            (F.col("l_shipdate") >= F.lit(f"{_Y1}-01-01"))
            & (F.col("l_shipdate") < F.lit(f"{int(_Y2) + 1}-01-01"))
        )
        .join(
            part.select("p_partkey", "p_brand"),
            li["l_partkey"] == part["p_partkey"],
        )
        .select(
            F.col("p_brand").alias("brand"),
            (F.col("l_shipdate") < F.lit(f"{_Y2}-01-01")).alias("is_y1"),
            F.round("l_quantity").cast("bigint").alias("qty"),
            F.round("l_extendedprice").cast("bigint").alias("dollars"),
        )
    )
    per = (
        j.groupBy("brand")
        .agg(
            F.sum(F.when(F.col("is_y1"), F.col("qty")).otherwise(0))
            .cast("bigint")
            .alias("q1"),
            F.sum(F.when(F.col("is_y1"), F.col("dollars")).otherwise(0))
            .cast("bigint")
            .alias("r1"),
            F.sum(F.when(F.col("is_y1"), 0).otherwise(F.col("qty")))
            .cast("bigint")
            .alias("q2"),
            F.sum(F.when(F.col("is_y1"), 0).otherwise(F.col("dollars")))
            .cast("bigint")
            .alias("r2"),
        )
        .where((F.col("q1") > 0) & (F.col("q2") > 0))
    )
    q1d, q2d = F.col("q1").cast("double"), F.col("q2").cast("double")
    r1d, r2d = F.col("r1").cast("double"), F.col("r2").cast("double")
    return per.select(
        "brand",
        "q1",
        "r1",
        "q2",
        "r2",
        (F.col("r2") - F.col("r1")).cast("bigint").alias("delta_dollars"),
        ((r2d / q2d - r1d / q1d) * (q1d + q2d) / F.lit(2.0)).alias(
            "price_effect"
        ),
        ((q2d - q1d) * (r1d / q1d + r2d / q2d) / F.lit(2.0)).alias(
            "volume_effect"
        ),
    ).orderBy("brand")


@query(
    "q_bot_regularity",
    oracle=f"""
    WITH g AS (
      SELECT user_id,
             -- second-boundary diff (matches Spark's unix_timestamp
             -- truncation), floor-divided to whole minutes
             CAST(DATE_DIFF('second', LAG(ts) OVER w, ts) AS BIGINT) // 60
               AS gap_min
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id,
             CAST(COUNT(gap_min) AS BIGINT) AS n_gaps,
             CAST(SUM(gap_min) AS BIGINT) AS sum_gap,
             CAST(SUM(gap_min * gap_min) AS BIGINT) AS sum_sq
      FROM g WHERE gap_min IS NOT NULL
      GROUP BY 1
      HAVING COUNT(gap_min) >= {_MIN_GAPS} AND SUM(gap_min) > 0
    )
    SELECT user_id, n_gaps, sum_gap,
           CAST(n_gaps * sum_sq - sum_gap * sum_gap AS BIGINT) AS var_num,
           (100 * (n_gaps * sum_sq - sum_gap * sum_gap)
              < sum_gap * sum_gap) AS bot_like,
           CAST(n_gaps * sum_sq - sum_gap * sum_gap AS DOUBLE)
             / (CAST(sum_gap AS DOUBLE) * CAST(sum_gap AS DOUBLE)) AS cv2
    FROM s
    ORDER BY cv2, user_id LIMIT 20
    """,
)
def q_bot_regularity(spark, sf_dir):
    """BOT-REGULARITY screen: users whose inter-event gaps are too
    regular to be human — coefficient of variation cv = σ/μ of the
    per-user gap series, flagged when cv < 0.1. The verdict is an
    EXACT integer cross-multiplication: cv² < 0.01 ⟺ 100·(nΣg² −
    (Σg)²) < (Σg)² — no float touches the flag; the reported cv² is
    a mirrored IEEE ratio used only for the top-20 ordering (with
    user_id tie-break). Gaps in whole MINUTES keep nΣg² under the
    2^53 correct-rounding fence at any realistic per-user rate.

    Scale shape: one per-user lag window (the sessionize shuffle),
    one user-grain raw-moment aggregate — raw moments suffice here
    because gaps are small integers, so no centering pass is needed.
    TakeOrdered(20) for the report."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        F.floor(
            (
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(w))
            )
            / 60
        )
        .cast("bigint")
        .alias("gap_min"),
    )
    s = (
        g.where(F.col("gap_min").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("gap_min").cast("bigint").alias("n_gaps"),
            F.sum("gap_min").cast("bigint").alias("sum_gap"),
            F.sum(F.col("gap_min") * F.col("gap_min"))
            .cast("bigint")
            .alias("sum_sq"),
        )
        .where((F.col("n_gaps") >= _MIN_GAPS) & (F.col("sum_gap") > 0))
    )
    var_num = F.col("n_gaps") * F.col("sum_sq") - F.col("sum_gap") * F.col(
        "sum_gap"
    )
    return (
        s.select(
            "user_id",
            "n_gaps",
            "sum_gap",
            var_num.cast("bigint").alias("var_num"),
            (
                100 * var_num < F.col("sum_gap") * F.col("sum_gap")
            ).alias("bot_like"),
            (
                var_num.cast("double")
                / (
                    F.col("sum_gap").cast("double")
                    * F.col("sum_gap").cast("double")
                )
            ).alias("cv2"),
        )
        .orderBy("cv2", "user_id")
        .limit(20)
    )
