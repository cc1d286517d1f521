"""Round-6 batch 5 (SURVEY.md §2.9/§2.11): TIME TRAVEL over the CDC
snapshot store (as-of reads vs the live state, diffed and classified)
and a seasonal-naive FORECAST BACKTEST (the honest baseline every
forecasting system must beat, evaluated on a held-out window in exact
integers).

Both drive REAL machinery: time travel reads epoch-anchored snapshots
written by `streaming.cdc.apply_changes_batch` (the q_dedup_registry
convention — the query IS the integration test of the maintenance
path, oracle-checked against a derived batch twin)."""

from __future__ import annotations

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_time_travel",
    oracle="""
    WITH ch AS (
      SELECT o_custkey AS id, o_orderkey AS seq,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(o_orderdate AS DATE) AS d
      FROM orders
    ), av AS (
      SELECT id, MAX(seq) AS seq FROM ch
      WHERE d < DATE '1999-01-01' GROUP BY 1
    ), fin AS (
      SELECT id, MAX(seq) AS seq FROM ch GROUP BY 1
    ), cls AS (
      SELECT f.id,
             CASE WHEN a.seq IS NULL THEN 'created'
                  WHEN a.seq <> f.seq THEN 'updated'
                  ELSE 'unchanged' END AS class,
             COALESCE((SELECT c.cents FROM ch c
                       WHERE c.id = f.id AND c.seq = a.seq), 0)
               AS cents_asof_row,
             (SELECT c.cents FROM ch c
              WHERE c.id = f.id AND c.seq = f.seq) AS cents_final_row
      FROM fin f LEFT JOIN av a ON f.id = a.id
    )
    SELECT class,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents_asof_row) AS BIGINT) AS cents_asof,
           CAST(SUM(cents_final_row) AS BIGINT) AS cents_final
    FROM cls GROUP BY class ORDER BY class
    """,
)
def q_time_travel(spark, sf_dir):
    """TIME TRAVEL: the per-customer "latest order" CDC state read
    AS-OF an earlier epoch vs the live state, with every key classified
    as created / updated / unchanged between the two views — the
    what-changed-since-yesterday question snapshot stores exist to
    answer.

    The query drives the REAL pipeline: three change epochs (order
    history split at 1997/1999 date boundaries, change-sequence =
    orderkey) merge through `streaming.cdc.apply_changes_batch` into
    epoch-anchored snapshot dirs; the as-of view is
    `read_state(before_epoch=2)` — exactly the recovery-read API — and
    the oracle recomputes both views as batch MAX(seq) twins.

    Scale shape: per-epoch merge cost is |state| + |batch| (the CDC
    contract, probed in SCALE.md); the diff is ONE full-outer key join
    of two snapshots collapsing to a 3-row class rollup. Money is
    exact cents; winners are unique-seq argmax (no float, no ties)."""
    from self_healing_data_pipeline_spark.session import scratch_dir
    from self_healing_data_pipeline_spark.streaming.cdc import (
        apply_changes_batch,
        read_state,
    )

    o = read_table(spark, sf_dir, "orders")
    ch = o.select(
        F.lit("upsert").alias("op"),
        F.col("o_custkey").alias("id"),
        F.col("o_orderkey").alias("seq"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.col("o_orderdate").alias("d"),
    )
    cut1 = F.lit("1997-01-01").cast("timestamp_ntz")
    cut2 = F.lit("1999-01-01").cast("timestamp_ntz")
    epochs = [
        ch.filter(F.col("d") < cut1),
        ch.filter((F.col("d") >= cut1) & (F.col("d") < cut2)),
        ch.filter(F.col("d") >= cut2),
    ]
    sd = scratch_dir("timetravel", sf_dir)
    for e, batch in enumerate(epochs):
        apply_changes_batch(
            spark, batch.drop("d"), sd, key="id", seq="seq", epoch_id=e
        )
    asof = read_state(spark, sd, before_epoch=2).select(
        F.col("id"), F.col("seq").alias("a_seq"), F.col("cents").alias("a_cents")
    )
    final = read_state(spark, sd).select(
        F.col("id"), F.col("seq").alias("f_seq"), F.col("cents").alias("f_cents")
    )
    cls = final.join(asof, "id", "left").select(
        F.when(F.col("a_seq").isNull(), F.lit("created"))
        .when(F.col("a_seq") != F.col("f_seq"), F.lit("updated"))
        .otherwise(F.lit("unchanged"))
        .alias("class"),
        F.coalesce(F.col("a_cents"), F.lit(0)).alias("cents_asof_row"),
        F.col("f_cents").alias("cents_final_row"),
    )
    return (
        cls.groupBy("class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("cents_asof_row").cast("bigint").alias("cents_asof"),
            F.sum("cents_final_row").cast("bigint").alias("cents_final"),
        )
        .orderBy("class")
    )


@query(
    "q_forecast_backtest",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders GROUP BY 1
    ), mx AS (
      SELECT MAX(day) AS max_day FROM daily
    )
    SELECT STRFTIME(a.day, '%Y-%m-%d') AS day_str,
           a.cents AS actual_cents,
           f.cents AS forecast_cents,
           CAST(ABS(a.cents - f.cents) AS BIGINT) AS abs_err_cents
    FROM daily a
    JOIN daily f ON f.day = a.day - INTERVAL 7 DAY, mx
    WHERE a.day > mx.max_day - INTERVAL 28 DAY
    ORDER BY day_str
    """,
)
def q_forecast_backtest(spark, sf_dir):
    """Seasonal-naive FORECAST BACKTEST: predict each of the last 28
    days' revenue as "same weekday last week" and report per-day
    actual, forecast, and absolute error — the baseline every
    forecasting pipeline must publish before anything fancier ships
    (if a model can't beat same-day-last-week, it isn't a model).

    Determinism: the forecast join is exact DATE arithmetic
    (``day − 7 days`` equi-join — NOT ``LAG(7)``, which silently
    misforecasts across calendar gaps in sparse fixtures); errors are
    exact integer cents; no division anywhere.

    Scale shape: day-grain map-side collapse (calendar-bounded), one
    self-equi-join on the day key of that tiny frame, broadcast 1-row
    max-day bound. Constant-size output."""
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    mx = daily.agg(F.max("day").alias("max_day"))
    f = daily.select(
        F.col("day").alias("f_day"), F.col("cents").alias("forecast_cents")
    )
    return (
        daily.join(f, F.col("f_day") == F.date_sub(F.col("day"), 7))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("day") > F.date_sub(F.col("max_day"), 28))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day_str"),
            F.col("cents").alias("actual_cents"),
            "forecast_cents",
            F.abs(F.col("cents") - F.col("forecast_cents"))
            .cast("bigint")
            .alias("abs_err_cents"),
        )
        .orderBy("day_str")
    )
