"""LLM-corpus tour: the training-data pipeline surface, start to ship.

Run: python examples/llm_corpus_tour.py [sf_dir]

The sequence a corpus release actually walks, every step a registered,
oracle-checked (or witnessed) query:

1. card        — the one-row datasheet front matter (q_dataset_card)
2. quality     — first-failing-rule routing funnel (q_quality_funnel)
3. sweep       — dedup threshold sensitivity table (q_dedup_threshold_sweep)
4. containment — sub-document / quote detection (q_dedup_containment)
5. novelty     — which sources add new content (q_doc_novelty)
6. vocab       — measured Heaps' law checkpoints (q_vocab_growth)
7. stopwords   — data-driven stopword discovery (q_stopword_discovery)
8. chunks      — chunk-coverage + overlap-cost audit (q_chunk_coverage_audit)
9. splits      — md5-bucket train/val/test assignment (q_split_assign)
10. leakage    — cross-split exact-dup check (q_split_leakage)
11. fairness   — hash-sample category-bias audit (q_sample_bias_audit)
12. fertility  — chars-per-BPE-token by language (q_tokenizer_fertility)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from self_healing_data_pipeline_spark import get_spark
from self_healing_data_pipeline_spark.registry import QUERIES, load_all

load_all()

_STEPS = [
    ("dataset card (datasheet front matter)", "q_dataset_card", 1),
    ("quality routing funnel", "q_quality_funnel", 6),
    ("dedup threshold sweep", "q_dedup_threshold_sweep", 1),
    ("containment (sub-document) pairs", "q_dedup_containment", 5),
    ("per-source novelty", "q_doc_novelty", 8),
    ("vocabulary growth (Heaps)", "q_vocab_growth", 6),
    ("stopword discovery", "q_stopword_discovery", 8),
    ("chunk coverage + overlap cost", "q_chunk_coverage_audit", 6),
    ("train/val/test assignment", "q_split_assign", 3),
    ("cross-split leakage", "q_split_leakage", 1),
    ("sample fairness by category", "q_sample_bias_audit", 5),
    ("tokenizer fertility by language", "q_tokenizer_fertility", 5),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("llm-corpus-tour")
    for title, key, n in _STEPS:
        print(f"== {title} ({key}) ==")
        QUERIES[key](spark, sf_dir).show(n, truncate=60)


if __name__ == "__main__":
    main()
