"""Warehouse-ops tour: the round-6 planner / healing / retrieval surface.

Run: python examples/warehouse_ops_tour.py [sf_dir]

Every step is a registered, oracle-checked query:

1. plan      — key-histogram join-size/skew prediction (q_join_size_estimate)
2. stats     — equi-depth histogram for the planner (q_histogram_equidepth)
3. prune     — runtime bloom-filter join pruning (q_bloom_join)
4. heal      — median imputation with clean-after witness (q_impute_missing)
5. clamp     — winsorization audit trail (q_winsorize)
6. privacy   — k-anonymity group-size risk (q_k_anonymity)
7. search    — BM25 ranking + reciprocal-rank fusion (q_text_bm25, q_rrf_fusion)
8. explain   — shared-span dedup evidence (q_dedup_explain)
9. drill     — share-of-parent hierarchy report (q_share_of_parent)
10. watch    — watermark tuning audit (q_watermark_audit)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from self_healing_data_pipeline_spark import get_spark
from self_healing_data_pipeline_spark.registry import QUERIES, load_all

load_all()

_STEPS = [
    ("join-size / skew pre-flight", "q_join_size_estimate", 5),
    ("equi-depth histogram", "q_histogram_equidepth", 8),
    ("bloom-pruned join", "q_bloom_join", 5),
    ("median imputation (self-healing)", "q_impute_missing", 3),
    ("winsorization audit", "q_winsorize", 1),
    ("k-anonymity risk", "q_k_anonymity", 5),
    ("BM25 ranking", "q_text_bm25", 5),
    ("hybrid-search RRF fusion", "q_rrf_fusion", 5),
    ("dedup evidence (shared spans)", "q_dedup_explain", 1),
    ("share-of-parent drilldown", "q_share_of_parent", 6),
    ("watermark tuning audit", "q_watermark_audit", 6),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("warehouse-ops-tour")
    for title, key, n in _STEPS:
        print(f"== {title} ({key}) ==")
        QUERIES[key](spark, sf_dir).show(n, truncate=60)


if __name__ == "__main__":
    main()
