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


def _sql_doubles(values) -> str:
    """Render a (possibly nested) float list as one SQL ``array(...)``
    expression string.  Parsed JVM-side in a single call — both
    ``F.lit(nested_list)`` (element-wise py4j, ~6 s for a 3k-element
    plane tensor) and ``F.array(*[F.lit(v) ...])`` (per-scalar Catalyst
    nodes, seconds of analysis) are plan-build traps at this size."""
    if isinstance(values, (list, tuple)):
        return "array(" + ",".join(_sql_doubles(v) for v in values) + ")"
    v = float(values)
    if v != v:
        return "cast('NaN' as double)"
    if v == float("inf"):
        return "cast('Infinity' as double)"
    if v == float("-inf"):
        return "cast('-Infinity' as double)"
    return repr(v) + "D"


def lit_vector(values: list[float]) -> Column:
    """A literal query vector as an array<double> column."""
    return F.expr(_sql_doubles(list(values)))


def lit_matrix(rows: list[list[float]]) -> Column:
    """A literal matrix as ONE nested array<array<double>> literal — a
    single expression parsed JVM-side regardless of size (see
    ``_sql_doubles`` on why per-element literals are a plan-build trap)."""
    return F.expr(_sql_doubles([list(r) for r in rows]))


def hyperplane_sign_bits(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: one sign bit per plane, packed
    into a bigint.  ``planes`` are driver-side constants (deterministic,
    seeded) so the expression is pure JVM arithmetic — the standard
    SimHash-for-vectors bucketing used by the ANN scale path.

    The plane matrix is a single nested array *literal* folded with
    ``aggregate`` — one expression node, not bits×dims scalar literals.
    An earlier per-element-literal version cost multiple seconds of
    Catalyst analysis/codegen per query before any data moved."""
    planes_lit = lit_matrix(planes)
    return F.aggregate(
        planes_lit,
        F.lit(0).cast("long"),
        lambda acc, plane: acc * 2 + (dot(vec, plane) >= 0).cast("long"),
    )


def hyperplane_table_buckets(vec: Column, plane_sets: list[list[list[float]]]) -> Column:
    """All multi-probe LSH table buckets in ONE pass: returns
    ``array<long>`` with one packed sign-bucket per plane set.  Lets the
    ANN path scan the corpus once and ``posexplode`` into
    (table_id, bucket) rows instead of re-scanning per table."""
    sets_lit = F.expr(_sql_doubles([[list(p) for p in ps] for ps in plane_sets]))
    return F.transform(
        sets_lit,
        lambda ps: F.aggregate(
            ps,
            F.lit(0).cast("long"),
            lambda acc, plane: acc * 2 + (dot(vec, plane) >= 0).cast("long"),
        ),
    )
