"""Vector math over ``array<float>`` embedding columns — all built-in higher-
order functions (zip_with / aggregate / transform), JVM-side, no UDFs.

Arithmetic is done in float64 (arrays are cast first) so results are
bit-comparable with the DuckDB oracle and stable under reordering-free
sequential accumulation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_normalize(v: Column) -> Column:
    n = norm(v)
    return F.transform(v, lambda x: x / n)
