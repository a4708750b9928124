"""Embedding vector math on ``array<float>`` columns (north star).

All expressions use Spark's higher-order functions (``zip_with`` +
``aggregate``) so the similarity hot path runs vectorized JVM code —
no Python UDF, no serialization of 100 TB of vectors through Arrow.
``operators.similarity`` builds brute-force and LSH-bucketed top-k on
these primitives.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _sum_array(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length float arrays."""
    return _sum_array(F.zip_with(a, b, lambda x, y: x * y))


def norm(a: Column) -> Column:
    """L2 norm."""
    return F.sqrt(_sum_array(F.transform(a, lambda x: x * x)))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def lit_vector(values: list[float]) -> Column:
    """A literal query vector as an array<double> column."""
    return F.array(*[F.lit(float(v)) for v in values])


def hyperplane_sign_bits(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: one sign bit per plane, packed
    into a bigint.  ``planes`` are driver-side constants (deterministic,
    seeded) so the expression is pure JVM arithmetic — the standard
    SimHash-for-vectors bucketing used by the ANN scale path."""
    bucket = F.lit(0).cast("long")
    for plane in planes:
        bit = (dot(vec, lit_vector(plane)) >= 0).cast("long")
        bucket = bucket * 2 + bit
    return bucket
