from self_healing_data_pipeline_spark.functions.scalar import (
    dec,
    dsum,
    dsum_expr,
    davg,
    ts_str,
    sanitize_identifier,
)
from self_healing_data_pipeline_spark.functions.vector import (
    dot_product,
    l2_norm,
    cosine_similarity,
)

__all__ = [
    "dec",
    "dsum",
    "dsum_expr",
    "davg",
    "ts_str",
    "sanitize_identifier",
    "dot_product",
    "l2_norm",
    "cosine_similarity",
]
