"""In-row upper-triangle pair generation for bucket-grouped self-joins.

The repo-standard replacement for two-sided self-joins (see the
module docstrings in operators/dedup.py): after a groupBy collects a
key's members into a sorted array, every unordered pair is emitted by
pure codegen'd ``transform``/``slice``/``flatten`` — no join operator,
no second shuffle, per-bucket memory bounded by the bucket cap. Used by
the LSH/SimHash band joins, fuzzy blocking, triangle/wedge edge builds,
market-basket pairs, and cross-language overlap.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def upper_triangle_pairs(
    arr: Column, pair_builder: Callable[[Column, Column], Column]
) -> Column:
    """array<pair> of ``pair_builder(x, y)`` for every i < j of ``arr``.

    ``pair_builder`` receives the (x=arr[i], y=arr[j]) elements and
    returns the struct to emit — letting callers score pairs DURING
    generation (hamming, levenshtein) so losers die in-row without ever
    being materialized as rows."""
    return F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + F.lit(2), F.size(arr)),
                lambda y: pair_builder(x, y),
            ),
        )
    )


def id_pairs(arr: Column, a: str = "id_a", b: str = "id_b") -> Column:
    """Plain (a, b) id pairs — the common no-score case. ``arr`` must be
    sorted ascending so a < b holds by construction."""
    return upper_triangle_pairs(
        arr, lambda x, y: F.struct(x.alias(a), y.alias(b))
    )
