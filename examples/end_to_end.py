"""End-to-end tour: the reference's ETL flow plus the scale extensions.

Run: python examples/end_to_end.py [sf_dir]

1. Self-healing ingest of a raw CSV (parse → profile → freeze → load →
   verify), with the catalog and lineage it produces.
2. Analytics over the loaded table + fixture tables (SQL passthrough).
3. Training-data ops: near-dup candidates, vector top-k, text quality.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from self_healing_data_pipeline_spark import get_spark
from self_healing_data_pipeline_spark.operators import (
    brute_force_topk,
    minhash_lsh_pairs,
    quality_score,
)
from self_healing_data_pipeline_spark.pipeline.runner import ingest_file_pipeline
from self_healing_data_pipeline_spark.plans.catalog import schema_to_struct, struct_to_ddl
from self_healing_data_pipeline_spark.plans.profiler import profile_dataframe
from self_healing_data_pipeline_spark.sources.readers import read_table
from self_healing_data_pipeline_spark.sql import execute_sql, register_fixture_views

CSV = """order_id,customer,amount,ordered_at,status
1001,Alice,250.00,2024-01-15,shipped
1002,Bob,99.50,2024-01-16,pending
1003,Carol,0.00,2024-01-17,shipped
1004,Dave,1200.75,invalid-date,pending
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("end_to_end_demo")

    # -- 1. Self-healing ingest ------------------------------------------
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "raw orders.csv")
        with open(path, "w") as f:
            f.write(CSV)
        result = ingest_file_pipeline(spark, path)
        print(f"ingest: ok={result.ok} step={result.step.value}")
        if not result.ok:
            for log in result.logs:
                print(f"  [{log.severity}] {log.step}: {log.message}")
            return
        for rec in result.lineage.records:
            print(f"  lineage {rec.stage}: {rec.inputs} -> {rec.output}")
        table = spark.table("raw_orders")
        prof = profile_dataframe(table, "raw_orders")
        print(struct_to_ddl("raw_orders", schema_to_struct(prof)))
        for c in prof.columns:
            if c.quality_issues:
                print(f"  quality[{c.column_name}]: {c.quality_issues}")

    # -- 2. Analytics: SQL passthrough over fixtures ---------------------
    register_fixture_views(spark, sf_dir)
    top = execute_sql(
        spark,
        """SELECT n.n_name, COUNT(*) AS n_suppliers
           FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
           GROUP BY n.n_name ORDER BY n_suppliers DESC, n.n_name LIMIT 5""",
    )
    print("top nations by suppliers:")
    top.show(truncate=False)

    # -- 3. Training-data ops --------------------------------------------
    docs = read_table(spark, sf_dir, "documents")
    cands = minhash_lsh_pairs(docs, "doc_id", "text")
    print(f"near-dup candidate pairs: {cands.count()}")

    from pyspark.sql import functions as F

    scored = docs.select(
        "doc_id", F.round(quality_score("text", "n_chars"), 3).alias("q")
    )
    print("lowest-quality docs:")
    scored.orderBy("q", "doc_id").show(3)

    emb = read_table(spark, sf_dir, "embeddings")
    first = emb.filter(F.col("vec_id") == 0).select("embedding").head()
    if first is not None:
        print("nearest neighbors of vec 0:")
        brute_force_topk(emb, list(first[0]), k=5).show()


if __name__ == "__main__":
    main()
