"""Vector math over ``array<float>`` embedding columns — pure Catalyst.

No UDFs: ``zip_with`` + ``aggregate`` stay inside the JVM with codegen, so
similarity scoring scales linearly across executors with zero Python
serialization. Products are computed in float32 (matching the storage
precision), accumulated in float64 strictly left-to-right — deterministic
and reproducible against other engines that do the same.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<float> columns → double."""
    prods = F.zip_with(a, b, lambda x, y: x * y)  # float32 products
    return F.aggregate(
        prods, F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
