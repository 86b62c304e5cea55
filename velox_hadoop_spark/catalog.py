"""Table catalog: sf-dir parquet -> named DataFrames / temp views.

The reference encodes table identity in file paths and re-parses text
lines per mapper (reference: src/main/java/org/dicl/velox/benchmark/
PreMapper.java:19-48 tags tables by `path.indexOf("action")`). Here a
table is a named, schema-carrying DataFrame over self-describing
parquet; provenance needs no path sniffing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Tables small enough (at any SF — they scale sub-linearly or are
# bounded) to broadcast in joins. At 100 TB the fact tables (lineitem,
# orders, events, documents) are the only ones that should ever shuffle.
BROADCASTABLE = frozenset({"region", "nation", "supplier", "part", "customer"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one catalog table; normalizes storage quirks.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects outright. We read it as a long (legacy conf) and
    truncate to microseconds with integer division — the same
    truncation DuckDB applies when it narrows ns → µs, so both engines
    see identical timestamps.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
        if dict(raw.dtypes).get("ts") == "bigint":
            raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return raw
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every catalog table from ``sf_dir`` as a DataFrame."""
    return {name: read_table(spark, sf_dir, name) for name in TABLES}


class Catalog:
    """Named-table access with temp-view registration for spark.sql."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir
        self._tables = load_tables(spark, sf_dir)

    def table(self, name: str) -> DataFrame:
        return self._tables[name]

    def __getitem__(self, name: str) -> DataFrame:
        return self._tables[name]

    def register_views(self) -> None:
        for name, df in self._tables.items():
            df.createOrReplaceTempView(name)
