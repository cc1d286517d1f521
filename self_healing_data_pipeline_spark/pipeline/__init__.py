from self_healing_data_pipeline_spark.pipeline.runner import (
    EtlLogEntry,
    PipelineResult,
    PipelineStep,
    SelfHealingPipeline,
    StageError,
)

__all__ = [
    "EtlLogEntry",
    "PipelineResult",
    "PipelineStep",
    "SelfHealingPipeline",
    "StageError",
]
