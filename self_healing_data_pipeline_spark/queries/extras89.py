"""Round-10 batch 72 (round-9 verdict task #7 — surface-parity
closers, next tranche): three Postgres-surface features the reference's
delegated SQL engine executes (`APP/services/pgliteService.ts:36-49`)
that had no registered key:

- **q_window_agg_filter** — FILTER on a *window* aggregate
  (``SUM(x) FILTER (WHERE …) OVER w``). Spark's parser rejects FILTER
  on window functions, so the engine side is the canonical
  CASE-with-no-ELSE rewrite (``SUM(CASE WHEN cond THEN x END) OVER w``
  — the missing ELSE matters: FILTER over zero matching rows yields
  NULL, and so does SUM over all-NULL, where ``ELSE 0`` would wrongly
  yield 0). DuckDB executes the NATIVE ``FILTER (WHERE …) OVER``
  clause, so the hash gate proves the rewrite against real FILTER
  semantics, not against itself.
- **q_unnest_ordinality** — ``UNNEST … WITH ORDINALITY`` (Postgres's
  positional lateral unnest). Spark's native ordinality surface is
  ``posexplode``; DuckDB lacks WITH ORDINALITY (1.0: "not
  implemented"), so the oracle derives ordinals independently via the
  GENERATE_SERIES index idiom — two independent formulations, one
  semantics.
- **q_window_groups_exclude** — SQL:2011 GROUPS frame mode COMPOSED
  with frame EXCLUDE (GROUP / TIES). The batch-69/71 rewrites compose
  in closed form at group grain: with a GROUPS ±1 frame the exclusion
  arithmetic is ``excl_group = groups_sum − peer_sum`` (NULL when the
  frame holds only the current group — the standard's empty-frame
  NULL) and ``excl_ties = groups_sum − peer_sum + value`` (current row
  always kept, never empty). Neither engine parses GROUPS, so the
  oracle replays the same arithmetic (rewrite-twin — annotated, same
  caveat as q_window_groups_mode) and the SEMANTICS are pinned by the
  hand-computed fixture in
  tests/test_extras84_witnesses.py::test_groups_exclude_hand_computed.

Exactness: money in ROUND(x*100) BIGINT cents; ordinals are BIGINT;
every window carries a unique tie-break key.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.operators.dedup import (
    NORMALIZE_TEXT_SQL as _NORM_SQL,
    normalize_text,
)
from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_window_agg_filter",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                FILTER (WHERE o_orderstatus = 'F') OVER w AS BIGINT)
             AS fulfilled_run_cents,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') OVER w
                AS BIGINT) AS fulfilled_run_cnt
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, o_orderkey
    """,
)
def q_window_agg_filter(spark, sf_dir):
    """FILTER clause on window aggregates — per customer, the running
    total and count of FULFILLED ('F') orders alongside every order.
    Spark has no window-FILTER syntax, so the engine runs the canonical
    rewrite: ``SUM(CASE WHEN cond THEN x END)`` with NO else branch —
    sum over all-NULL is NULL, exactly FILTER's empty-set result
    (``ELSE 0`` would diverge on customers whose prefix has no 'F'
    order yet). COUNT's faithful twin counts the CONDITION, not the
    summed value — ``COUNT(CASE WHEN cond THEN price END)`` would skip
    a matching row whose price is NULL while ``COUNT(*) FILTER`` counts
    it (review finding; latent on TPC-H's NOT-NULL totalprice, but the
    rewrite must be right in general). The oracle is DuckDB's NATIVE
    ``FILTER (WHERE …) OVER``, so equality proves the rewrite against
    genuine FILTER semantics. Plan: one scan, ONE shuffle on o_custkey shared by both
    windows (same partition+order), running frames are the cheap
    no-retraction kind; per-customer partitions are many and small —
    the shape that scales flat."""
    w = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias(
            "price_cents"
        ),
        "o_orderstatus",
        "o_orderdate",
    )
    fulfilled = F.when(
        F.col("o_orderstatus") == "F", F.col("price_cents")
    )  # no otherwise(): NULL, so an all-miss prefix sums to NULL like FILTER
    return o.select(
        "o_custkey",
        "o_orderkey",
        "price_cents",
        F.sum(fulfilled).over(w).cast("bigint").alias(
            "fulfilled_run_cents"
        ),
        F.count(F.when(F.col("o_orderstatus") == "F", F.lit(True)))
        .over(w)
        .cast("bigint")
        .alias("fulfilled_run_cnt"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "q_unnest_ordinality",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ') AS a
      FROM documents
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS ord,
           a[CAST(i AS INT)] AS token
    FROM toks, UNNEST(GENERATE_SERIES(1, LEN(a))) AS t(i)
    WHERE LEN(a) > 0
    ORDER BY doc_id, ord
    """,
)
def q_unnest_ordinality(spark, sf_dir):
    """``UNNEST … WITH ORDINALITY`` — tokenize each document and emit
    every token WITH its 1-based position. Spark's native ordinality
    surface is ``posexplode`` (0-based, +1 to match the standard);
    DuckDB has no WITH ORDINALITY, so the oracle derives ordinals
    independently by indexing the array over GENERATE_SERIES — two
    unrelated formulations agreeing on both the tokens and their
    positions. Plan: narrow generator expand, no shuffle (the ORDER BY
    is the driver-compare convention, not a plan stage at scale)."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.posexplode(F.split(normalize_text("text"), " ")).alias(
                "pos", "token"
            ),
        )
        .select(
            "doc_id",
            (F.col("pos") + 1).cast("bigint").alias("ord"),
            "token",
        )
        .orderBy("doc_id", "ord")
    )


@query(
    "q_window_groups_exclude",
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
      SELECT event_type, value_cents, peer_sum, peer_cnt,
             CAST(SUM(peer_sum) OVER w AS BIGINT) AS groups_sum,
             CAST(SUM(peer_cnt) OVER w AS BIGINT) AS groups_cnt
      FROM g
      WINDOW w AS (PARTITION BY event_type ORDER BY value_cents
                   ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
    )
    SELECT v.event_id, v.event_type, v.value_cents,
           CASE WHEN gf.groups_cnt > gf.peer_cnt
                THEN gf.groups_sum - gf.peer_sum END AS excl_group_sum,
           CAST(gf.groups_sum - gf.peer_sum + v.value_cents AS BIGINT)
             AS excl_ties_sum
    FROM v JOIN gf
      ON v.event_type = gf.event_type
     AND v.value_cents = gf.value_cents
    ORDER BY v.event_id
    """,
)
def q_window_groups_exclude(spark, sf_dir):
    """GROUPS frame mode composed with frame EXCLUDE — per event, the
    sum of the GROUPS ±1 neighborhood excluding its own peer group
    (EXCLUDE GROUP) and excluding its ties but keeping itself (EXCLUDE
    TIES). The two batch-69/71 rewrites compose in closed form at group
    grain, with no extra window: ``excl_group = groups_sum − peer_sum``
    (NULL when the neighborhood IS the peer group — the standard's
    empty-frame rule, guarded by comparing row counts, not sums, since
    negative cents can collide on sums) and ``excl_ties = groups_sum −
    peer_sum + value`` (never empty: the current row survives TIES
    exclusion). Neither engine parses GROUPS, so the oracle replays the
    identical arithmetic (rewrite-twin — the hash gate proves
    cross-engine arithmetic); the SEMANTICS of the composition are
    pinned by a hand-computed fixture test. Plan: the q_window_exclude
    two-phase shape — window input bounded by the value DOMAIN, one
    join-back on the group key; NULL values filtered explicitly on
    both sides (null-unsafe join-back)."""
    from self_healing_data_pipeline_spark.queries.extras88 import (
        groups_exclude_frame,
    )

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
        groups_exclude_frame(e, "event_type", "value_cents")
        .select(
            "event_id",
            "event_type",
            "value_cents",
            "excl_group_sum",
            "excl_ties_sum",
        )
        .orderBy("event_id")
    )
