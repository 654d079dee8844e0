"""Vector math over ``array<float|double>`` embedding columns, as native
higher-order-function expressions (BASELINE.json north star: similarity
search). JVM-side fold — no Python boundary; for very wide vectors a Pandas
UDF kernel can be swapped in, but at 64-1024 dims the HOF fold wins by
skipping Arrow transfer entirely.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: str | Column) -> Column:
    c = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold — matches single-threaded oracle evaluation order
    as closely as floating point allows; downstream consumers round."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_rounded(a: Column, b: Column, dp: int = 6) -> Column:
    """Cosine rounded for cross-engine comparison and deterministic
    ranking (ties then break on an id column)."""
    return F.round(cosine(a, b), dp)
