"""Vectorized (Arrow/pandas) UDFs — the engine's user-extension surface.

NOTE: no ``from __future__ import annotations`` here — pandas_udf
resolves real type hints, and stringified annotations break signature
inference.

The reference's extension points are Mapper/Reducer plug-in classes
(SURVEY §2.11); a scalar ``@pandas_udf`` is the Spark-native analog:
Arrow-batched, ~10-100× faster than row-at-a-time Python UDFs. Built-in
expressions remain the first choice — UDFs only where JVM expressions
genuinely can't express the logic.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def normalize_text(s: pd.Series) -> pd.Series:
    """Lowercase + squeeze runs of whitespace + strip."""
    return s.str.lower().str.replace(r"\s+", " ", regex=True).str.strip()


@pandas_udf("double")
def geomean(v: pd.Series) -> float:
    """Grouped-aggregate (UDAF) pandas UDF: geometric mean of a positive
    series. Spark feeds each group's column as one Arrow batch; the
    return is the group's scalar. Partial aggregation does NOT apply to
    grouped-agg UDFs — the whole group ships to Python — so reserve
    this surface for aggregates SQL can't express; geomean itself has
    the exp(avg(ln)) identity, which is what the DuckDB oracle uses to
    cross-check the UDF path end-to-end.
    """
    import numpy as np

    return float(np.exp(np.log(v.to_numpy()).mean()))
