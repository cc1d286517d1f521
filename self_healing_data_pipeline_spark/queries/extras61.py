"""Round-6 batch 44 (SURVEY.md §2.9 behavioral / §2.10 ML features):
SESSION CO-OCCURRENCE LIFT (which event types happen together within a
session more than chance — the behavioral association table, computed
on 30-minute gap sessions) and the FEATURE-HASHING COLLISION AUDIT
(the hashing-trick preflight: which buckets of a D=256 hashed
cross-feature space collide, and what share of raw crosses lose
identity — the audit run before shipping hashed features to a model).

Exactness: session ids come from integer µs gap comparisons; all
supports/counts are exact BIGINTs; lift is one final float chain.
Bucket ids parse the md5 prefix with the same position-in-hex-alphabet
arithmetic on both engines (no engine-specific hash)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table

_GAP_US = 1800 * 1_000_000  # 30-minute session gap
_MIN_PAIR = 5  # report pairs co-occurring in >= 5 sessions


@query(
    "q_session_cooccurrence",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, event_type, EPOCH_US(ts) AS us FROM events
    ), flagged AS (
      SELECT event_id, user_id, event_type, us,
             CASE WHEN us - LAG(us) OVER (PARTITION BY user_id
                                          ORDER BY us, event_id)
                       > {_GAP_US} OR
                  LAG(us) OVER (PARTITION BY user_id
                                ORDER BY us, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM e
    ), sess AS (
      SELECT user_id, event_type,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS sid
      FROM flagged
    ), st AS (
      SELECT DISTINCT user_id, sid, event_type FROM sess
    ), n AS (
      SELECT CAST(COUNT(DISTINCT (user_id, sid)) AS BIGINT) AS n_sessions
      FROM st
    ), supp AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM st GROUP BY 1
    ), pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM st a JOIN st b
        ON a.user_id = b.user_id AND a.sid = b.sid
       AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_both, sa.n AS n_a, sb.n AS n_b,
           CAST(n.n_sessions AS DOUBLE) * CAST(n_both AS DOUBLE)
             / (CAST(sa.n AS DOUBLE) * CAST(sb.n AS DOUBLE)) AS lift
    FROM pairs
    JOIN supp sa ON type_a = sa.event_type
    JOIN supp sb ON type_b = sb.event_type
    CROSS JOIN n
    WHERE n_both >= {_MIN_PAIR}
    ORDER BY type_a, type_b
    """,
)
def q_session_cooccurrence(spark, sf_dir):
    """SESSION CO-OCCURRENCE LIFT: event-type pairs that land in the
    same 30-minute-gap session, with lift = N·n(a,b) / (n(a)·n(b)) —
    the behavioral association table ("users who hit errors in a
    session also convert 0.4× as often") that q_basket_pairs computes
    for order baskets, here on sessionized clickstream.

    Scale shape: sessionization is the per-user lag/cumsum window
    (parallel across users, the q_sessionize shape) on exact integer
    microseconds; sessions collapse to the DISTINCT (session, type)
    grain — bounded at |sessions|·|types| with ≤9 types — so the
    pair self-join fans out at most 9× per session row and supports/
    totals are one partial-aggregated pass each. Lift divides three
    exact integers in one fixed-order float chain."""
    ev = read_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    # (us, event_id) total order: ts ties would otherwise make session
    # numbering engine-dependent (same rule as q_sessionize)
    wl = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = e.withColumn(
        "new_s",
        F.when(
            (F.col("us") - F.lag("us").over(wl) > _GAP_US)
            | F.lag("us").over(wl).isNull(),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sid",
        F.sum("new_s").over(
            wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    st = sess.select("user_id", "sid", "event_type").distinct()
    n = st.select("user_id", "sid").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )
    supp = st.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    b = st.select(
        F.col("user_id").alias("u2"),
        F.col("sid").alias("sid2"),
        F.col("event_type").alias("type_b"),
    )
    pairs = (
        st.join(
            b,
            (st.user_id == b.u2)
            & (st.sid == b.sid2)
            & (st.event_type < b.type_b),
        )
        .groupBy(F.col("event_type").alias("type_a"), "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
        .where(F.col("n_both") >= _MIN_PAIR)
    )
    sa = supp.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = supp.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(n))
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            (
                F.col("n_sessions").cast("double")
                * F.col("n_both").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("lift"),
        )
        .orderBy("type_a", "type_b")
    )


# Feature-hashing audit: D = 256 buckets from the first two md5 hex
# digits, parsed with position-in-alphabet arithmetic so both engines
# compute the identical bucket id without any engine-native hash.
_HEXABC = "0123456789abcdef"


@query(
    "q_feature_hash_audit",
    oracle=f"""
    WITH crossed AS (
      SELECT p.p_brand || '|' || l.l_returnflag || '|' || l.l_linestatus
               AS feature,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1
    ), hashed AS (
      SELECT feature, n_rows,
             (STRPOS('{_HEXABC}',
                     SUBSTRING(MD5(feature), 1, 1)) - 1) * 16
             + (STRPOS('{_HEXABC}',
                       SUBSTRING(MD5(feature), 2, 1)) - 1) AS bucket
      FROM crossed
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_features,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           STRING_AGG(feature, ',' ORDER BY feature) AS features
    FROM hashed
    GROUP BY bucket HAVING COUNT(*) > 1
    ORDER BY bucket
    """,
)
def q_feature_hash_audit(spark, sf_dir):
    """FEATURE-HASHING COLLISION AUDIT: the brand × returnflag ×
    linestatus cross (≈150 raw features) hashed into D=256 buckets
    (hashing trick, Weinberger et al. 2009), reporting every bucket
    where two or more DISTINCT raw crosses collide — the identity a
    hashed model silently merges. The audit a feature pipeline runs
    to size D before training.

    Scale shape: the cross collapses to the FEATURE grain first (one
    partial-aggregated pass over the fact ⋈ broadcast dim join), so
    hashing and the collision groupBy run on ~500 rows no matter the
    corpus size. The bucket id is the first two md5 hex digits parsed
    via position-in-alphabet arithmetic — portable, engine-identical,
    and the exact rule q_sample_hash's thresholds use. The colliding
    feature list is deterministic (sorted listagg)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_returnflag", "l_linestatus"
    )
    p = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    crossed = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.concat_ws(
                "|", "p_brand", "l_returnflag", "l_linestatus"
            ).alias("feature")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )
    bucket = F.expr(
        f"CAST((instr('{_HEXABC}', substring(md5(feature), 1, 1)) - 1) * 16"
        f" + (instr('{_HEXABC}', substring(md5(feature), 2, 1)) - 1)"
        " AS BIGINT)"
    )
    hashed = crossed.withColumn("bucket", bucket)
    return (
        hashed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_features"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.array_join(F.array_sort(F.collect_list("feature")), ",").alias(
                "features"
            ),
        )
        .where(F.col("n_features") > 1)
        .orderBy("bucket")
    )
