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
