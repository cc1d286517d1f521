"""self_healing_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the capabilities of the reference
repo ``k70suK3-k06a7ash1/self-healing-data-pipeline`` (an LLM-assisted
self-healing ETL/catalog pipeline that delegates all SQL to embedded
Postgres — see SURVEY.md).  Three capability tiers:

- Tier A: ingestion (CSV/JSON parse + inference-and-freeze schema), sampling,
  preview, load/verify, and the self-healing staged pipeline runner
  (reference: ``automated-data-catalog-&-etl/App.tsx:18-27,89-204``).
- Tier B: the delegated analytic SQL surface (joins, aggregates, windows,
  set ops, scalar functions) — expressed as DataFrame/Spark SQL so Catalyst
  plans it (reference choke point:
  ``automated-data-catalog-&-etl/services/pgliteService.ts:36-49``).
- Tier C: 100 TB-scale training-data operators — dedup (exact/minhash/
  simhash), vector similarity search, text analysis, multimodal columns.

Everything is DataFrame-declarative; custom work is composition only
(as-of join, LSH banding, sessionization) — no custom Catalyst rules.
"""

from self_healing_data_pipeline_spark.session import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]

__version__ = "0.1.0"
