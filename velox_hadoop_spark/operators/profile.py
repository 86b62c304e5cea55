"""Table profiling — per-column null counts, exact distinct counts,
min/max. [extension]

The ANALYZE/statistics surface every engine ships: one row per column
with (n_nulls, n_distinct, min, max), used for optimizer stats, data
QA gates, and drift monitoring. The reference has no statistics layer
(its splits are byte-ranged, reference: src/main/java/org/dicl/velox/
mapreduce/LeanInputFormat.java:41-63); this is a first-class operator
here.

Scale notes: the profile is a UNION of per-column one-row aggregates,
one narrow scan per column. On columnar parquet each scan reads ONLY
its column (verified column pruning), so total bytes read equal one
full-table scan while every aggregation pipeline stays a 1-column
partial+final agg — no Expand. The alternative single-pass
multi-distinct aggregate expands every row ``n_cols``× before the
shuffle (Spark plans multi-countDistinct via Expand), shuffling 6×
the table — strictly worse at 100 TB. Exact distinct counts are kept
for oracle parity; at petabyte scale swap ``countDistinct`` for
``approx_count_distinct`` per column (same plan shape, no shuffle
growth), as the HLL queries in ``tpch_more.py`` demonstrate.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from velox_hadoop_spark.plans.registry import register

# (column, kind) — kind picks the engine-portable min/max string form:
# doubles go through DECIMAL(18,2) so both engines print '857.71',
# timestamps through DATE so both print '1995-03-15'.
_ORDERS_COLS: tuple[tuple[str, str], ...] = (
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "double"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
)


def _minmax_spark(col: str, kind: str, agg: str) -> Column:
    fn = F.min if agg == "min" else F.max
    if kind == "double":
        return fn(col).cast("decimal(18,2)").cast("string")
    if kind == "ts":
        return fn(F.col(col).cast("date")).cast("string")
    return fn(col).cast("string")


def profile_columns(df: DataFrame, cols: tuple[tuple[str, str], ...]) -> DataFrame:
    """One row per column: (col_name, n_nulls, n_distinct, min_val,
    max_val) — a union of narrow per-column aggregates (see module
    docstring for why this beats a single multi-distinct pass)."""
    parts = []
    for c, kind in cols:
        parts.append(
            df.select(c).agg(
                F.lit(c).alias("col_name"),
                F.sum(F.col(c).isNull().cast("long")).alias("n_nulls"),
                F.countDistinct(c).alias("n_distinct"),
                _minmax_spark(c, kind, "min").alias("min_val"),
                _minmax_spark(c, kind, "max").alias("max_val"),
            )
        )
    return reduce(DataFrame.unionAll, parts)


def _minmax_duck(col: str, kind: str, agg: str) -> str:
    if kind == "double":
        return f"CAST(CAST({agg}({col}) AS DECIMAL(18,2)) AS VARCHAR)"
    if kind == "ts":
        return f"CAST({agg}(CAST({col} AS DATE)) AS VARCHAR)"
    return f"CAST({agg}({col}) AS VARCHAR)"


def _profile_oracle(table: str, cols: tuple[tuple[str, str], ...]) -> str:
    selects = [
        f"""SELECT '{c}' AS col_name,
                   count(CASE WHEN {c} IS NULL THEN 1 END) AS n_nulls,
                   count(DISTINCT {c}) AS n_distinct,
                   {_minmax_duck(c, kind, 'min')} AS min_val,
                   {_minmax_duck(c, kind, 'max')} AS max_val
            FROM {table}"""
        for c, kind in cols
    ]
    return "\nUNION ALL\n".join(selects)


@register(
    "profile_columns_orders",
    oracle=_profile_oracle("orders", _ORDERS_COLS),
    tags=("profiling", "statistics", "extension"),
)
def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column statistics profile of the orders table."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return profile_columns(orders, _ORDERS_COLS)
