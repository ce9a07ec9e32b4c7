"""Vector Column builders (pure built-in higher-order functions).

Dot products and cosine similarity over array<float> embedding
columns, computed in double via zip_with/aggregate — JVM-side,
codegen'd, no UDFs. Element-wise float→double casts are exact, and
both engines then fold the same sequence, so results match DuckDB's
list_* functions on DOUBLE[] casts (the oracle side).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DOT_DOUBLE = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "0D, (acc, v) -> acc + v)"
)


def dot_expr(a: str, b: str) -> Column:
    """Double-precision dot product of two float-array columns."""
    return F.expr(_DOT_DOUBLE.format(a=a, b=b))


def cosine_expr(a: str, b: str) -> Column:
    """Cosine similarity of two float-array columns, computed in
    double (matches DuckDB's list_cosine_similarity on DOUBLE[])."""
    dot = _DOT_DOUBLE.format(a=a, b=b)
    na = _DOT_DOUBLE.format(a=a, b=a)
    nb = _DOT_DOUBLE.format(a=b, b=b)
    return F.expr(f"({dot}) / (sqrt({na}) * sqrt({nb}))")
