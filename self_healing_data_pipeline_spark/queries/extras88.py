"""Round-9 batch 71 (SURVEY.md §2.5 window parity closer): the
SQL:2011 GROUPS frame mode — the last of the standard window frame
features Spark's parser lacks (QUALIFY, DISTINCT ON and frame EXCLUDE
landed in batches 67–69). ``GROUPS BETWEEN 1 PRECEDING AND 1
FOLLOWING`` frames by PEER GROUPS of the ORDER BY value (current
group ± one whole neighboring group, however many rows each holds).

Neither engine parses GROUPS (DuckDB 1.0: "not implemented yet"), so
BOTH sides run the canonical two-phase rewrite — which is also the
100 TB-correct shape (same reasoning as q_window_exclude's fix):
collapse rows to (partition, order-value) GROUP grain, run a plain
ROWS frame over the group rows (1 group-row = 1 peer group, so ROWS
±1 over groups IS GROUPS ±1 over rows), and join rows back on the
group key. The window input is bounded by the value DOMAIN, not the
row count, and integer-cents sums make the twin hash-exact.

Because the DuckDB oracle executes the IDENTICAL rewrite (neither
engine parses GROUPS), the driver hash gate verifies cross-engine
arithmetic of the rewrite, not SQL:2011 GROUPS semantics themselves —
round-9 advisor item. The semantics are therefore pinned
independently: ``tests/test_extras84_witnesses.py::
test_groups_frame_hand_computed`` runs ``groups_frame_rewrite`` (the
exact code the registered query calls) on a tiny fixture against
HAND-computed GROUPS ±1 expectations from the SQL:2011 definition.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


def groups_frame_rewrite(e, part_col: str, order_col: str):
    """The GROUPS-mode rewrite itself, factored so the hand-computed
    fixture test exercises the SAME code as the registered query.

    Input: rows with at least (part_col, order_col) where order_col is
    an exact integer (the value being both ordered and summed). Output:
    input rows plus ``groups_sum_cents`` / ``rows_in_frame`` computed
    under ``GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING`` semantics —
    via group-grain collapse, ROWS ±1 over group rows, join-back."""
    g = e.groupBy(part_col, order_col).agg(
        F.sum(order_col).alias("peer_sum"),
        F.count(F.lit(1)).alias("peer_cnt"),
    )
    frame = (
        Window.partitionBy(part_col).orderBy(order_col).rowsBetween(-1, 1)
    )
    gf = g.select(
        part_col,
        order_col,
        F.sum("peer_sum").over(frame).cast("bigint").alias(
            "groups_sum_cents"
        ),
        F.sum("peer_cnt").over(frame).cast("bigint").alias(
            "rows_in_frame"
        ),
    )
    return e.join(gf, [part_col, order_col])


def groups_exclude_frame(e, part_col: str, order_col: str):
    """GROUPS ±1 frame COMPOSED with EXCLUDE GROUP / EXCLUDE TIES
    (batch-72 ``q_window_groups_exclude``; fixture-tested alongside
    :func:`groups_frame_rewrite`). Same group-grain collapse and ROWS
    ±1 window; the exclusions are closed-form arithmetic on the
    group's own aggregates:

      excl_group_sum = groups_sum − peer_sum   (NULL when the frame is
                        exactly the peer group — row-count guard, not a
                        sum guard, since sums can collide)
      excl_ties_sum  = groups_sum − peer_sum + value  (current row kept)
    """
    g = e.groupBy(part_col, order_col).agg(
        F.sum(order_col).alias("peer_sum"),
        F.count(F.lit(1)).alias("peer_cnt"),
    )
    frame = (
        Window.partitionBy(part_col).orderBy(order_col).rowsBetween(-1, 1)
    )
    gf = g.select(
        part_col,
        order_col,
        "peer_sum",
        "peer_cnt",
        F.sum("peer_sum").over(frame).cast("bigint").alias("groups_sum"),
        F.sum("peer_cnt").over(frame).cast("bigint").alias("groups_cnt"),
    )
    return e.join(gf, [part_col, order_col]).select(
        e["*"],
        F.when(
            F.col("groups_cnt") > F.col("peer_cnt"),
            F.col("groups_sum") - F.col("peer_sum"),
        ).alias("excl_group_sum"),
        (F.col("groups_sum") - F.col("peer_sum") + F.col(order_col))
        .cast("bigint")
        .alias("excl_ties_sum"),
    )


@query(
    "q_window_groups_mode",
    oracle="""
    WITH v AS (
      SELECT event_id, event_type,
             CAST(ROUND(value * 100) AS BIGINT) AS value_cents
      FROM events
      WHERE value IS NOT NULL
    ), g AS (
      SELECT event_type, value_cents,
             CAST(SUM(value_cents) AS BIGINT) AS peer_sum,
             CAST(COUNT(*) AS BIGINT) AS peer_cnt
      FROM v GROUP BY event_type, value_cents
    ), gf AS (
      SELECT event_type, value_cents,
             CAST(SUM(peer_sum) OVER (
                  PARTITION BY event_type ORDER BY value_cents
                  ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
                  AS BIGINT) AS groups_sum_cents,
             CAST(SUM(peer_cnt) OVER (
                  PARTITION BY event_type ORDER BY value_cents
                  ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
                  AS BIGINT) AS rows_in_frame
      FROM g
    )
    SELECT v.event_id, v.event_type, v.value_cents,
           gf.groups_sum_cents, gf.rows_in_frame
    FROM v JOIN gf
      ON v.event_type = gf.event_type
     AND v.value_cents = gf.value_cents
    ORDER BY v.event_id
    """,
)
def q_window_groups_mode(spark, sf_dir):
    """SQL:2011 GROUPS frame mode — per event, the sum (and row count)
    of its peer group ± one neighboring peer group of the value
    ordering. Spark has no GROUPS frames, so this is the canonical
    group-grain rewrite: one group-row per distinct (type, value), a
    plain ROWS ±1 frame over group rows (exactly GROUPS ±1 over the
    original rows), rows joined back on the group key. Same two-phase
    shape that fixed q_window_exclude — the window input is bounded by
    the value domain at any corpus size, and Spark's no-retraction
    sliding frames never see a dense row-grain buffer. NULL values are
    filtered explicitly on both sides (the join-back is null-unsafe).
    Integer cents throughout — hash-exact."""
    e = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_id",
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").alias(
                "value_cents"
            ),
        )
    )
    return (
        groups_frame_rewrite(e, "event_type", "value_cents")
        .select(
            "event_id",
            "event_type",
            "value_cents",
            "groups_sum_cents",
            "rows_in_frame",
        )
        .orderBy("event_id")
    )
