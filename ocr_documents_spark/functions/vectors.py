"""Vector column expressions for the embedding operators.

Everything stays in native Catalyst higher-order functions
(zip_with/aggregate), evaluated inside codegen — no UDF for the hot path.
Cosine is computed in double with a strict left-to-right fold so the value
is reproducible; oracle comparisons round to 4 decimals to absorb the
float->double promotion difference vs DuckDB's list functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sign_bucket(a: Column, dims: int = 3) -> Column:
    """Deterministic spatial hash: sign pattern of the first `dims`
    coordinates.  The bucket key for the LSH-bucketed ANN path — at scale
    this is the shuffle key that keeps candidate generation local."""
    parts = [F.when(F.element_at(a, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
             for i in range(dims)]
    return F.concat(*parts)
