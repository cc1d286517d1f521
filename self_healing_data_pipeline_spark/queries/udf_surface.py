"""UDF/UDAF/UDTF surface queries (SURVEY.md §2.10) — one oracle-checked
query per Python-extension API beyond the scalar ``pandas_udf`` already
covered by ``q_pandas_udf``:

- grouped-aggregate ``pandas_udf`` (vectorized UDAF; partial-agg-free, so
  keep groups small — here |custkey| groups of ~15 rows),
- grouped-map ``applyInPandas`` (whole-group transform as one pandas
  frame),
- Python UDTF (arrow-optimized table function: one input row → many
  output rows).

Determinism rule for all three: Python floats are IEEE doubles and +,-,*,/
are exactly specified, but SUM ORDER is not — any float accumulation
inside a kernel first converts 2-decimal values to exact integer cents
(int64) so the sum is order-insensitive and matches the oracle's decimal
arithmetic bit-for-bit.

Scale notes: grouped-agg and grouped-map shuffle once on the group key and
stream one Arrow batch per group — executor memory is bounded by the
LARGEST GROUP, which is why the group keys here are high-cardinality keys
(customer), never low-cardinality ones (status). The UDTF is a narrow map:
no shuffle, rows fan out in place.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from self_healing_data_pipeline_spark.registry import query
from self_healing_data_pipeline_spark.sources.readers import read_table


@query(
    "q_udf_grouped_agg",
    oracle="""
    SELECT o_custkey % 256 AS cust_bucket,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                    * CAST(6 - CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT)
                           AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(SUM(6 - CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT))
                    AS DOUBLE) AS weighted_price
    FROM orders
    GROUP BY 1
    """,
)
def q_udf_grouped_agg(spark, sf_dir):
    """Vectorized UDAF (GROUPED_AGG pandas_udf): priority-weighted mean
    order price per customer bucket (weight 5 for '1-URGENT' down to 1
    for '5-LOW'). The kernel sums exact integer cents (int64), so the
    result is independent of row order within the group and matches the
    oracle's decimal arithmetic exactly.

    The group key is a 256-way bucket of the customer key, NOT the raw
    key: every GROUPED_AGG group costs one Python invocation, so
    per-customer grouping at scale means millions of tiny Python calls
    (measured 15s at sf0.1 vs ~1s bucketed). Bucketing keeps enough
    groups for full parallelism while amortizing the per-call overhead —
    the sizing rule for any grouped Python UDF."""
    from pyspark.sql.functions import pandas_udf

    def _weighted(price: pd.Series, weight: pd.Series) -> float:
        cents = (price * 100).round().astype("int64")
        w = weight.astype("int64")
        return float(int((cents * w).sum()) / 100.0 / int(w.sum()))

    weighted = pandas_udf(_weighted, "double", F.PandasUDFType.GROUPED_AGG)

    o = read_table(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 256).alias("cust_bucket"),
        "o_totalprice",
        (
            F.lit(6) - F.substring("o_orderpriority", 1, 1).cast("bigint")
        ).alias("w"),
    )
    return o.groupBy("cust_bucket").agg(
        weighted("o_totalprice", "w").alias("weighted_price")
    )


@query(
    "q_udf_grouped_map",
    oracle="""
    WITH m AS (
      SELECT c_mktsegment,
             MIN(CAST(c_acctbal AS DECIMAL(12,2))) AS seg_min
      FROM customer GROUP BY c_mktsegment
    )
    SELECT c.c_custkey, c.c_mktsegment,
           CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) - m.seg_min AS DOUBLE)
             AS bal_above_min
    FROM customer c JOIN m USING (c_mktsegment)
    """,
)
def q_udf_grouped_map(spark, sf_dir):
    """Grouped-map applyInPandas: re-base each customer's balance on its
    market segment's minimum — the whole-group-as-one-frame API (the
    shape used for per-group normalization / model scoring). All
    arithmetic happens in exact integer cents inside the kernel; only the
    final cent difference converts to double, so the oracle's decimal
    subtraction agrees bit-for-bit (a double mean would round differently
    between engines)."""
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )

    def rebase(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = (pdf["c_acctbal"] * 100).round().astype("int64")
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "bal_above_min": (cents - cents.min()) / 100.0,
            }
        )

    return c.groupBy("c_mktsegment").applyInPandas(
        rebase,
        schema="c_custkey bigint, c_mktsegment string, bal_above_min double",
    )


@query(
    "q_udtf_sentences",
    oracle="""
    WITH parts AS (
      SELECT doc_id, string_split(text, '.') AS ps FROM documents
    ), ex AS (
      SELECT doc_id, UNNEST(generate_series(1, len(ps))) AS i, ps
      FROM parts
    )
    SELECT doc_id,
           CAST(i - 1 AS BIGINT) AS sent_idx,
           CAST(LENGTH(TRIM(ps[i])) AS BIGINT) AS sent_chars
    FROM ex
    WHERE LENGTH(TRIM(ps[i])) > 0
    """,
)
def q_udtf_sentences(spark, sf_dir):
    """Python UDTF (table function): one document row fans out to one row
    per '.'-delimited sentence with its index and trimmed length — the
    §2.10 UDTF surface on a real corpus task (sentence segmentation for
    chunk-level scoring). Narrow map, no shuffle; the oracle mirrors the
    exact split-trim-filter semantics with DuckDB list functions."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx: bigint, sent_chars: bigint")
    class SentenceSplit:
        def eval(self, text: str):
            if text is None:
                return
            for i, part in enumerate(text.split(".")):
                # strip(' ') not strip(): DuckDB TRIM removes spaces only,
                # and the oracle comparison is bit-exact — both engines
                # must share one trimming definition.
                t = part.strip(" ")
                if t:
                    yield i, len(t)

    d = read_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("__udtf_docs")
    spark.udtf.register("sentence_split", SentenceSplit)
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sent_chars
        FROM __udtf_docs d, LATERAL sentence_split(d.text) s
        """
    )
