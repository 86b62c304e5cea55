"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``velox_hadoop_spark.plans.registry`` — the engine's
named-query registry. Every operator family in SURVEY.md §2 registers
its queries (Spark plan + DuckDB oracle SQL) there.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from velox_hadoop_spark.plans import registry  # noqa: E402


def _utc(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    """Pin the session to UTC: LTZ timestamps must render identically to
    DuckDB's naive (UTC-wall-clock) timestamps regardless of the host
    timezone of whatever session the driver passes in."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Grep-style pipeline (reference: Grep.java:62-100 semantics on table
    data): regex extract + grouped count + total-order sort.
    """
    return _utc(registry.queries()["grep"])(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _utc(fn) for name, fn in registry.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    non-SQL-expressible iterative/stateful ops)."""
    return registry.oracles()
