"""Vector math over `array<float>` embedding columns.

Pure higher-order-function expression trees (`zip_with` + `aggregate`) —
the JVM-side path for dot products and norms. Inputs are cast to
array<double> first so accumulation happens in double precision
left-to-right (matching DuckDB's list_dot_product order for oracle checks).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(v: Column) -> Column:
    return F.sqrt(dot(v, v))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity, null on zero-norm inputs.

    The naive ratio yields NaN for a zero vector, and Spark orders NaN
    ABOVE every double — a single zero embedding would rank as the #1
    neighbor of every query and pass any `sim >= t` filter (NaN >= t is
    true in Spark SQL). Null instead: desc ordering puts nulls last and
    threshold filters drop them."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0.0, dot(a, b) / denom).otherwise(F.lit(None))
