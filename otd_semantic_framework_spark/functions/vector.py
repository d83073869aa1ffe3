"""Reusable vector column expressions over ``array<float|double>``.

All JVM-side higher-order functions — usable in any DataFrame plan and
whole-stage-codegen friendly for small/medium arrays. For bulk matrix
math (thousands of dims × millions of rows) prefer the numpy-backed
Arrow UDF paths in ``operators/simsearch.py`` / ``operators/linking.py``;
these expressions are the SQL-checkable baseline the DuckDB oracle can
mirror.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col) -> Column:
    """Cast array<float> → array<double> elementwise (Spark HOFs keep
    float32 otherwise, which diverges from float64 oracles)."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    """Dot product of two equal-length numeric arrays."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(col) -> Column:
    return F.sqrt(F.aggregate(F.transform(col, lambda x: x * x),
                              F.lit(0.0), lambda a, v: a + v))


def cosine(a, b, decimals: int | None = 6) -> Column:
    """Cosine similarity; rounded to ``decimals`` for cross-engine
    hash-stable comparison (None = unrounded)."""
    c = dot(a, b) / (l2_norm(a) * l2_norm(b))
    return F.round(c, decimals) if decimals is not None else c
