"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``self_healing_data_pipeline_spark`` (operators by
SURVEY.md §2 section); this module only adapts them to the contract.
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from self_healing_data_pipeline_spark import registry  # noqa: E402

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    return registry.QUERIES["q_agg_groupby"](spark, "/root/testdata/sf0.001")


def _latest_verdicts() -> dict[str, tuple[bool, int, bool]]:
    """Latest per-key driver verdict from CORRECTNESS_r*.json files, as
    ``key -> (green, round, rows_only)`` where ``round`` is the round
    of the MOST RECENT verdict (its vintage). green=True means
    hash-verified, or rows-only-by-design with rows recorded; False =
    the verdict failed. rows_only=True means that latest verdict was
    the weaker no-oracle record. Keys never checked are absent.
    """
    here = os.path.dirname(os.path.abspath(__file__))
    latest: dict[str, tuple[bool, int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        fname = os.path.basename(path)
        digits = "".join(c for c in fname if c.isdigit())
        rnd = int(digits) if digits else 0
        for key, v in data.items():
            if isinstance(v, dict):
                rows_only = (
                    v.get("err") == "no_oracle"
                    and v.get("spark_rows") is not None
                )
                green = bool(v.get("hash_match")) or rows_only
                latest[key] = (green, rnd, rows_only)
    return latest


#: Output contract or implementation changed since the key's latest
#: recorded verdict — re-verify ahead of the vintage queue (see
#: queries() docstring). Round 11 changed: the six graph keys gained
#: eager localCheckpoint lineage truncation (93df3cf), q_window_exclude
#: was rewritten as prefix-sum + boundary probes (eebe8e2),
#: q_window_range_interval / q_ann_ivfadc / q_catalog_graph(+_impact)
#: were restructured in the eval-tail trim (68d48b1). All are locally
#: hash-green via tools/check_oracle.py; the driver record is what
#: counts, so they head the r12 sample. (q_tablesample_stable, the r10
#: entry, got its fresh verdict in CORRECTNESS_r11 and dropped off.)
#: Maintained mechanically by tools/verify_slate.py.
_CHANGED_SINCE_VERDICT = (
    "q_khop_reach",
    "q_label_propagation",
    "q_part_triangles",
    "q_graph_neighbor_jaccard",
    "q_degree_distribution",
    "q_item_cf",
    "q_window_exclude",
    "q_window_range_interval",
    "q_ann_ivfadc",
    "q_catalog_graph",
    "q_catalog_graph_impact",
    # Round 12: the dhash law's square is now computed mod-2^32-reduced
    # in uint64/HUGEINT (identical values, total past doc_id 28,662 —
    # r11 advisor item). q_image_dhash's oracle text changed; the other
    # three are module-grain co-flags from tools/verify_slate.py.
    "q_image_dhash",
    "q_embedding_pq",
    "q_gdpr_erasure",
    "q_split_temporal",
    # Round 12: the driver-collect boundedness census
    # (tools/lint_driver_bound.py) found q_neardup_registry collecting
    # every accepted doc id (~n/4 rows) to the driver for a set-equality
    # witness; rewritten as two key-only anti-joins. extras6 module
    # co-flags follow.
    "q_neardup_registry",
    "q_dedup_registry",
    "q_embedding_quantize",
    "q_order_cadence",
    "q_percentile_bands",
    "q_sample_weighted",
    "q_time_to_convert",
    # Round 12: the full-registry sf0.1 oracle sweep caught
    # q_inventory_floor's window order not being total (the fixture's
    # (l_orderkey, l_linenumber) is not unique) — delta appended as
    # the final tie-break on both engines; q_events_heatmap is the
    # extras40 module co-flag.
    "q_inventory_floor",
    "q_events_heatmap",
    # Round 12: _catalog_key now fingerprints parquet directories one
    # level deep (r11 advisor item) — catalog_queries module co-flags.
    "q_join_discovery",
    "q_join_discovery_sketch",
    "q_lineage_downstream",
    "q_dedup_keep_best",
    "q_profile_topk_values",
    # Round 12: q_dedup_embedding moved to value-grain survivors after
    # the sf1 probe measured 15.8× wall at 10× data (same output,
    # vector-grain oracle unchanged); tier_c module co-flags follow.
    "q_dedup_embedding",
    "q_dedup_keep_first_docs",
    "q_dedup_minhash",
    "q_dedup_normalized",
    "q_dedup_pairs",
    "q_pandas_udf",
    "q_sim_ann_lsh",
    "q_sim_ivf",
    "q_sim_join",
    "q_sim_join_lsh",
    "q_sim_range",
    "q_sim_topk",
    "q_text_fingerprint",
    "q_text_langid",
    "q_text_quality",
    "q_text_rollup",
    "q_text_token_count",
    "q_text_tokens",
    # ---- Round 12 OPTIMIZATION batch (appended risk-ordered AFTER the
    # r11-verdict task-1 slate above, which keeps its driver-prefix
    # priority). All keys below are locally hash-verified against the
    # DuckDB oracle at sf0.01 this round (see OPTIMIZATION_r12.md);
    # the slate exceeds one 50-key driver sample, so the tail carries
    # to the next round's prefix — nothing falls back to the vintage
    # queue until a fresh driver verdict lands.
    # (1) real plan rewrites (results proven identical vs oracle):
    "q_join_range",  # theta BNLJ -> banded equi-join (range_join)
    "q_ann_recall_at_k",  # probe panel capped at _PANEL_CAP=40
    # (2) forced corpus-growing broadcast hints removed (join strategy
    # is result-invariant; AQE re-chooses broadcast at fixture SF):
    "q_assoc_pmi",
    "q_cohort_ltv",
    "q_did_uplift",
    "q_dq_fk_orphans",
    "q_feature_hash_audit",
    "q_gini_concentration",
    "q_hhi_concentration",
    "q_lorenz_curve",
    "q_price_relatives",
    "q_price_volume_bridge",
    "q_segment_migration",
    "q_supplier_scorecard",
    "q_target_encoding",
    "q_tpch_q11",
    "q_tpch_q14",
    "q_tpch_q15",
    "q_tpch_q16",
    "q_tpch_q2",
    "q_tpch_q20",
    "q_tpch_q21",
    "q_tpch_q5",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q9",
    "q_wilson_ranking",
    # (3) module/deps-hash co-flags of the edited files (byte-level
    # co-residents; their own callables and oracles are untouched):
    "q_bloom_join",
    "q_bot_regularity",
    "q_cumulative_distinct",
    "q_customer_rfm",
    "q_dq_benford",
    "q_dq_category_drift",
    "q_dq_expectations",
    "q_dq_freshness",
    "q_dq_outlier_mad",
    "q_dq_route_quarantine",
    "q_dq_temporal_consistency",
    "q_dq_type_inference",
    "q_dq_uniqueness",
    "q_ema",
    "q_events_attribution",
    "q_heavy_hitters",
    "q_incremental_join_view",
    "q_join_asof",
    "q_join_broadcast",
    "q_join_inner",
    "q_join_outer",
    "q_join_semi_anti",
    "q_l_diversity",
    "q_new_vs_returning",
    "q_pareto_frontier",
    "q_period_growth",
    "q_regr_slope",
    "q_revenue_bridge",
    "q_seasonal_anomaly",
    "q_semdedup",
    "q_sequence_match",
    "q_session_cooccurrence",
    "q_set_except",
    "q_set_intersect",
    "q_set_union",
    "q_sort_multi",
    "q_sparse_dot_topk",
    "q_topk",
    "q_tpch_q10",
    "q_tpch_q12",
    "q_tpch_q13",
    "q_tpch_q17",
    "q_tpch_q18",
    "q_tpch_q19",
    "q_tpch_q22",
    "q_tpch_q3",
    "q_tpch_q4",
    "q_tpch_q6",
    "q_weighted_median",
    "q_word_burstiness",
    # ---- Round 12 shingle-pass batch (one materialized explode per
    # prefix-filter query, operators/shingle_pass.py; results proven
    # identical vs oracle at sf0.001/0.01/0.1 — see OPTIMIZATION_r12.md).
    # (1) plan rewrites:
    "q_dedup_containment",
    "q_dedup_jaccard_prefix",
    "q_dedup_threshold_sweep",
    "q_doc_novelty",
    # (2) module/deps-hash co-flags of the edited files (extras8/59/
    # 65/68 co-residents; their callables and oracles are untouched):
    "q_abc_classification",
    "q_chunk_coverage_audit",
    "q_dict_candidates",
    "q_forecast_backtest",
    "q_inverted_index",
    "q_minhash_accuracy",
    "q_scan_api_source",
    "q_scan_binaryfile",
    "q_source_coverage",
    "q_stream_heavy_hitters",
    "q_stream_quantiles",
    "q_time_travel",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered so verification coverage rotates across driver rounds (the
    driver records verdicts for a prefix of this dict): keys whose last
    verdict failed come first, never-checked keys next (registration
    order), already-green keys last ORDERED BY VERDICT VINTAGE — the
    keys whose latest verdict is oldest re-verify first, so no key's
    verdict goes stale while the per-round budget keeps re-checking
    recent ones. Pure reordering — the key set is exactly
    ``registry.QUERIES``.
    """
    verdicts = _latest_verdicts()
    qs = registry.QUERIES
    failed = {k: f for k, f in qs.items() if k in verdicts and not verdicts[k][0]}
    # Within never-checked: oracle-backed keys (full hash check) before
    # rows-only keys (weaker check) — if the driver's per-round budget cuts
    # off mid-list, the stronger checks land first.
    unchecked_oracle = {
        k: f
        for k, f in qs.items()
        if k not in verdicts and k in registry.ORACLE
    }
    unchecked_rows_only = {
        k: f
        for k, f in qs.items()
        if k not in verdicts and k not in registry.ORACLE
    }
    # Keys PROMOTED to oracle-backed since their last verdict (latest
    # record is the weaker rows-only kind but the key now carries an
    # oracle) re-verify before vintage-ordered greens: their claimed
    # contract is stronger than their recorded evidence, so they'd
    # otherwise wait behind the whole r1/r2 tail for a hash verdict.
    promoted_keys = sorted(
        (
            k
            for k in qs
            if k in verdicts
            and verdicts[k][0]
            and verdicts[k][2]
            and k in registry.ORACLE
        ),
        key=lambda k: verdicts[k][1],
    )
    promoted = {k: qs[k] for k in promoted_keys}
    # Keys whose OUTPUT CONTRACT changed since their latest verdict
    # (schema or hash-gated semantics edited in this round's source)
    # also re-verify ahead of the vintage queue — the recorded verdict
    # describes a shape the code no longer produces, which is the
    # "promoted-but-stale" evidence gap in another guise. Maintained by
    # hand per round, emptied once the driver re-records them.
    changed = {
        k: qs[k]
        for k in _CHANGED_SINCE_VERDICT
        if k in qs and k in verdicts and k not in promoted
    }
    green_keys = sorted(
        (
            k
            for k in qs
            if k in verdicts
            and verdicts[k][0]
            and k not in promoted
            and k not in changed
        ),
        key=lambda k: verdicts[k][1],  # oldest vintage first; stable
    )
    green = {k: qs[k] for k in green_keys}
    return {
        **failed,
        **unchecked_oracle,
        **unchecked_rows_only,
        **promoted,
        **changed,
        **green,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each SQL-expressible query."""
    return dict(registry.ORACLE)
