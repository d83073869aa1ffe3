"""Shared column-expression library (JVM-side, no UDFs)."""

from .vector import as_double, cosine, dot, l2_norm  # noqa: F401
