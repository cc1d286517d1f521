"""Window-function queries (SURVEY.md §2.5, build step 5).

Every ORDER BY inside a window carries a unique tie-break key
(o_orderkey / event_id) so ranks and offsets are total-ordered and
reproducible across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.functions.scalar import dec
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS price_rank,
           DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS prio_dense,
           NTILE(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def q_window_rank(spark, sf_dir):
    """Ranking family: row_number / rank / dense_rank / ntile."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    w_rank = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    w_dense = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w_rank).alias("price_rank"),
        F.dense_rank().over(w_dense).alias("prio_dense"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "q_window_lag",
    oracle="""
    SELECT event_id, user_id,
           STRFTIME(LAG(ts) OVER w, '%Y-%m-%d %H:%M:%S') AS prev_ts,
           STRFTIME(LEAD(ts) OVER w, '%Y-%m-%d %H:%M:%S') AS next_ts,
           LAG(event_type, 1) OVER w AS prev_type,
           FIRST_VALUE(event_id) OVER w AS first_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_lag(spark, sf_dir):
    """Analytic family: lag / lead / first_value."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "event_id",
        "user_id",
        F.date_format(F.lag("ts").over(w), "yyyy-MM-dd HH:mm:ss").alias("prev_ts"),
        F.date_format(F.lead("ts").over(w), "yyyy-MM-dd HH:mm:ss").alias("next_ts"),
        F.lag("event_type", 1).over(w).alias("prev_type"),
        F.first("event_id").over(w).alias("first_event"),
    )


@query(
    "q_window_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_3,
           CAST(COUNT(*) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS cnt_3
    FROM events
    """,
)
def q_window_frame(spark, sf_dir):
    """Explicit ROWS frames (moving window aggregate)."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "event_id",
        "user_id",
        F.sum(dec("value")).over(w.rowsBetween(-2, 0)).cast("double").alias("sum_3"),
        F.count(F.lit(1)).over(w.rowsBetween(-1, 1)).cast("bigint").alias("cnt_3"),
    )


@query(
    "q_window_running",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / CAST(COUNT(*) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_avg_10
    FROM events
    """,
)
def q_window_running(spark, sf_dir):
    """Running total + 10-row moving average (exact-decimal accumulation)."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    mov = w.rowsBetween(-9, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.sum(dec("value")).over(run).cast("double").alias("running_total"),
        (
            F.sum(dec("value")).over(mov).cast("double")
            / F.count(F.lit(1)).over(mov).cast("double")
        ).alias("moving_avg_10"),
    )


@query(
    "q_window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(COUNT(*) OVER
                (PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING)
                AS BIGINT) AS n_near,
           CAST(MIN(o_totalprice) OVER
                (PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS min_near_below
    FROM orders
    """,
)
def q_window_range_frame(spark, sf_dir):
    """RANGE (value-based) frames — peers chosen by ORDER-BY value
    distance, not row position: how many of the customer's orders fall
    within ±1000 of this one's price. Same single shuffle as a ROWS
    frame; the frame bound comparison is value arithmetic, deterministic
    on both engines (counts and MIN only — no float accumulation)."""
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1))
        .over(w.rangeBetween(-1000, 1000))
        .cast("bigint")
        .alias("n_near"),
        F.min("o_totalprice")
        .over(w.rangeBetween(-1000, Window.currentRow))
        .cast("double")
        .alias("min_near_below"),
    )


@query(
    "q_window_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(FIRST_VALUE(o_totalprice) OVER w AS DOUBLE) AS first_price,
           CAST(LAST_VALUE(o_totalprice) OVER w AS DOUBLE) AS last_price,
           CAST(NTH_VALUE(o_totalprice, 2) OVER w AS DOUBLE) AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q_window_first_last(spark, sf_dir):
    """Navigation windows: each order alongside its customer's first,
    last, and second order price (customer-lifetime context per row —
    the "vs their first purchase" analytic). The frame is explicitly
    UNBOUNDED..UNBOUNDED: LAST_VALUE under the default frame (..CURRENT
    ROW) is the current row — the classic window gotcha — so the full
    frame is stated identically on both engines. One shuffle on
    o_custkey; (o_orderdate, o_orderkey) totally orders each partition."""
    o = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).cast("double").alias("first_price"),
        F.last("o_totalprice").over(w).cast("double").alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).cast("double").alias(
            "second_price"
        ),
    )
