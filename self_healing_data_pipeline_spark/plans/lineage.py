"""Lineage records — the reference's knowledge-graph/lineage vision
(reference ``README.md:7``: catalog with lineage across datasets) as data.

Every pipeline stage emits a ``LineageRecord`` (stage, inputs, output,
output schema, wall time); the set of records IS a lineage graph
(edges input→output). Stored as a DataFrame so lineage is queryable with
the same engine — at scale these land in a parquet-backed catalog table
partitioned by run date.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("inputs", T.ArrayType(T.StringType()), False),
        T.StructField("output", T.StringType(), False),
        T.StructField("output_schema", T.StringType(), True),
        T.StructField("started_at", T.DoubleType(), False),
        T.StructField("elapsed_sec", T.DoubleType(), False),
    ]
)


@dataclass
class LineageRecord:
    run_id: str
    stage: str
    inputs: list[str]
    output: str
    output_schema: str | None
    started_at: float
    elapsed_sec: float


@dataclass
class LineageLog:
    """Collects lineage records for one pipeline run."""

    run_id: str
    records: list[LineageRecord] = field(default_factory=list)

    def record(
        self,
        stage: str,
        inputs: list[str],
        output: str,
        output_df: DataFrame | None = None,
        started_at: float | None = None,
    ) -> None:
        now = time.time()
        t0 = started_at if started_at is not None else now
        self.records.append(
            LineageRecord(
                run_id=self.run_id,
                stage=stage,
                inputs=list(inputs),
                output=output,
                output_schema=(
                    output_df.schema.simpleString() if output_df is not None else None
                ),
                started_at=t0,
                elapsed_sec=now - t0,
            )
        )

    def to_dataframe(self, spark: SparkSession) -> DataFrame:
        rows = [
            (
                r.run_id,
                r.stage,
                r.inputs,
                r.output,
                r.output_schema,
                r.started_at,
                r.elapsed_sec,
            )
            for r in self.records
        ]
        return spark.createDataFrame(rows, LINEAGE_SCHEMA)

    def downstream_of(self, name: str) -> list[str]:
        """Transitive closure of outputs depending on ``name`` (impact
        analysis — the catalog question lineage exists to answer)."""
        out: set[str] = set()
        frontier = {name}
        while frontier:
            nxt = {
                r.output
                for r in self.records
                if (set(r.inputs) & frontier) and r.output not in out
            }
            out |= nxt
            frontier = nxt
        return sorted(out)
