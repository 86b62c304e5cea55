"""Vector math over ArrayType(FloatType) embedding columns.

Embeddings stay plain ``array<float>`` (cast to double for math) — no
custom types, pure PySpark (SURVEY §4c). Dot products use
``aggregate``/``zip_with`` builtins: JVM-side, codegen'd, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (left-to-right sum, portable)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def round_half_away(x, decimals: int = 6):
    """Round half away from zero — the mode Spark ``F.round`` and DuckDB
    ``ROUND`` share. numpy's ``np.round`` / Python's ``round`` use
    banker's rounding, a latent parity flake for values landing exactly
    on a .5 tie at the rounded digit; every numpy/Arrow kernel in the
    repo must round through this helper instead. Accepts scalars or
    ndarrays; preserves ±inf.
    """
    import numpy as np

    m = 10.0 ** decimals
    return np.sign(x) * np.floor(np.abs(x) * m + 0.5) / m
