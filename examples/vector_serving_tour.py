"""Vector-serving tour: the ANN index stack from exact to IVFADC.

Run: python examples/vector_serving_tour.py [sf_dir]

Walks the embeddings fixture up the production vector-serving ladder —
every step a registered query with an oracle or an in-row witness:

1. space health — covariance/anisotropy (q_embedding_covariance),
   top principal component (q_embedding_pca), norm audit
2. exact       — brute-force top-k, the oracle for everything above it
   (q_sim_topk)
3. pruned      — IVF probed-lists ANN + recall harness
   (q_sim_ivf, q_ann_recall_at_k)
4. compressed  — product quantization: codes, ADC scan, reconstruction
   error (q_embedding_pq)
5. production  — IVFADC: coarse quantizer -> residual PQ -> code-only
   scan of probed lists -> exact refine, with the witness that
   compression lost nothing vs the same probe budget (q_ann_ivfadc)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from self_healing_data_pipeline_spark import get_spark
from self_healing_data_pipeline_spark.registry import QUERIES, load_all

load_all()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("vector-serving-tour")

    print("== space health: top principal component (head) ==")
    QUERIES["q_embedding_pca"](spark, sf_dir).orderBy(
        F.desc(F.abs(F.col("loading")))
    ).limit(5).show()

    print("== exact top-k (the ground truth) ==")
    QUERIES["q_sim_topk"](spark, sf_dir).show()

    print("== IVF probed-lists ANN (recall witness per row) ==")
    QUERIES["q_sim_ivf"](spark, sf_dir).show()

    print("== recall@10 harness over the probe panel ==")
    QUERIES["q_ann_recall_at_k"](spark, sf_dir).show()

    print("== PQ compression: ADC top-k with reconstruction error ==")
    QUERIES["q_embedding_pq"](spark, sf_dir).show()

    print("== IVFADC end-to-end (per-probe: ivf vs ivfadc recall) ==")
    QUERIES["q_ann_ivfadc"](spark, sf_dir).show()

    spark.stop()


if __name__ == "__main__":
    main()
