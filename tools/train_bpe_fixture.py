"""Regenerate operators/bpe.py's FROZEN_MERGES from the fixture corpus.

Usage: python tools/train_bpe_fixture.py [sf_dir] [n_merges]
Prints the literal list; paste (or auto-patch) into operators/bpe.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    from self_healing_data_pipeline_spark.operators.bpe import train_bpe_merges
    from self_healing_data_pipeline_spark.session import get_spark
    from self_healing_data_pipeline_spark.sources.readers import read_table

    spark = get_spark("train_bpe")
    docs = read_table(spark, sf_dir, "documents")
    merges = train_bpe_merges(docs, "text", n_merges=n_merges)
    print("FROZEN_MERGES: list[tuple[str, str]] = [")
    for a, b in merges:
        print(f"    ({a!r}, {b!r}),")
    print("]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
