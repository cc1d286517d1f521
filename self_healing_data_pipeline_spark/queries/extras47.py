"""Round-6 batch 29 (SURVEY.md §2.9 time series): the AUTOCORRELATION
FUNCTION (lag-1..7 ACF of the daily revenue series — the seasonality
detector that tells a forecaster which lags matter, complementing
q_seasonal_decompose's fixed weekly model) and OHLC BARS (per-hour
open/high/low/close/volume candles over the event stream — the
canonical downsampling operator for metric and tick series).

Exactness: revenues in integer dollars (products of centered daily
deviations stay under 2^53 so the BIGINT→DOUBLE hop is correctly
rounded in both engines — the q_corr_matrix fence), event values in
integer cents; open/close resolve ties by (ts, event_id) so the
bars are total-order deterministic."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

_MAX_LAG = 7


@query(
    "q_autocorrelation",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(ROUND(o_totalprice)) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ), m AS (
      SELECT SUM(x) // COUNT(*) AS mu,
             CAST(CAST(SUM((x - (SELECT SUM(x) // COUNT(*) FROM daily))
                   * (x - (SELECT SUM(x) // COUNT(*) FROM daily)))
               AS BIGINT) AS DOUBLE) AS denom
      FROM daily
    ), lags AS (
      SELECT k FROM UNNEST(GENERATE_SERIES(1, {_MAX_LAG})) AS t(k)
    ), pairs AS (
      SELECT lags.k,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(CAST(SUM((a.x - m.mu) * (b.x - m.mu)) AS BIGINT)
               AS DOUBLE) AS num
      FROM daily a
      CROSS JOIN lags
      JOIN daily b ON b.day = a.day + CAST(lags.k AS BIGINT) * INTERVAL 1 DAY
      CROSS JOIN m
      GROUP BY lags.k, m.denom
    )
    SELECT p.k AS lag, p.n_pairs, p.num / m.denom AS acf
    FROM pairs p CROSS JOIN m
    ORDER BY lag
    """,
)
def q_autocorrelation(spark, sf_dir):
    """SAMPLE ACF of daily order revenue at lags 1..7: r_k =
    Σ(x_t−μ)(x_{t+k}−μ) / Σ(x_t−μ)² with the full-series mean — the
    correlogram a forecaster reads before choosing seasonal terms
    (a weekly cycle shows as a lag-7 peak). Pairs join on calendar
    day + k, so gap days pair with nothing (honest irregular-series
    semantics, identical in both engines).

    Exactness: daily revenue in integer DOLLARS, centered by the
    integer floor mean — centered products ×|series| stay under 2^53,
    so every BIGINT→DOUBLE conversion is correctly rounded (cents
    overflowed that fence; the q_corr_matrix discipline chooses the
    unit). Final ACF is one mirrored IEEE division.

    Scale shape: the series aggregate is day-grain (bounded: years ×
    365); the lag join is an equi-join on day after a 7-way lag
    explode of the TINY day-grain frame — never a window over the raw
    fact table, never SinglePartition on the fact path."""
    orders = read_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.sum(F.round("o_totalprice")).cast("bigint").alias("x"))
    s, n_ = F.sum("x"), F.count(F.lit(1))
    m = daily.agg(((s - F.pmod(s, n_)) / n_).cast("bigint").alias("mu"))
    centered = daily.crossJoin(F.broadcast(m)).select(
        "day", (F.col("x") - F.col("mu")).alias("dev")
    )
    denom = centered.agg(
        F.sum(F.col("dev") * F.col("dev"))
        .cast("bigint")
        .cast("double")
        .alias("denom")
    )
    lags = centered.select(
        "day",
        "dev",
        F.explode(F.sequence(F.lit(1), F.lit(_MAX_LAG))).alias("lag"),
    ).select(
        "lag",
        F.date_add(F.col("day"), F.col("lag")).alias("pair_day"),
        F.col("dev").alias("dev_a"),
    )
    pairs = lags.join(
        centered.select(
            F.col("day").alias("pair_day"), F.col("dev").alias("dev_b")
        ),
        "pair_day",
    )
    num = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.col("dev_a") * F.col("dev_b"))
        .cast("bigint")
        .cast("double")
        .alias("num"),
    )
    return (
        num.crossJoin(F.broadcast(denom))
        .select(
            "lag",
            "n_pairs",
            (F.col("num") / F.col("denom")).alias("acf"),
        )
        .orderBy("lag")
    )


@query(
    "q_ohlc_bars",
    oracle="""
    WITH e AS (
      SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S')
               AS bar_hour,
             ts, event_id,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ), ordered AS (
      SELECT bar_hour, cents,
             ROW_NUMBER() OVER (PARTITION BY bar_hour
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY bar_hour
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM e
    )
    SELECT bar_hour,
           CAST(MIN(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open,
           CAST(MAX(cents) AS BIGINT) AS high,
           CAST(MIN(cents) AS BIGINT) AS low,
           CAST(MIN(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_trades,
           CAST(SUM(cents) AS BIGINT) AS volume_cents
    FROM ordered
    GROUP BY bar_hour
    ORDER BY bar_hour
    """,
)
def q_ohlc_bars(spark, sf_dir):
    """OHLC CANDLES: hourly open/high/low/close/count/volume bars over
    purchase-event values — the downsampling operator every metrics
    store and tick pipeline runs. Open/close are the first/last value
    by (ts, event_id) within the bar (composite tie-break = total
    order = deterministic bars).

    Scale shape: open/close come from ONE min/max over (ts, event_id,
    cents) structs — an ordinary partial-aggregated groupBy at bar
    grain, no within-bar window, no shuffle beyond the bar key (the
    oracle keeps the row_number formulation; struct min ≡ first by
    the same total order). Bars-per-partition is bounded by the time
    range, and the aggregate is map-side combinable."""
    ev = read_table(spark, sf_dir, "events")
    e = ev.filter(F.col("event_type") == "purchase").select(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
        .alias("bar_hour"),
        F.col("ts"),
        F.col("event_id"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    first_s = F.min(F.struct("ts", "event_id", "cents"))
    last_s = F.max(F.struct("ts", "event_id", "cents"))
    return (
        e.groupBy("bar_hour")
        .agg(
            first_s.getField("cents").cast("bigint").alias("open"),
            F.max("cents").cast("bigint").alias("high"),
            F.min("cents").cast("bigint").alias("low"),
            last_s.getField("cents").cast("bigint").alias("close"),
            F.count(F.lit(1)).cast("bigint").alias("n_trades"),
            F.sum("cents").cast("bigint").alias("volume_cents"),
        )
        .orderBy("bar_hour")
    )
