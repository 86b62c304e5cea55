"""Set operations: union-all with provenance, intersect, except, distinct.

Re-expresses the reference's multi-input union Spark-first:

  * tagged UNION ALL — reference: src/main/java/org/dicl/velox/benchmark/
    LeanJoin.java:85-86 (two input dirs into one mapper) +
    PreMapper.java:33-48 (provenance recovered by sniffing the file
    path). Here provenance is an explicit literal column on each branch
    before `unionByName` — no path sniffing.
  * INTERSECT / EXCEPT / DISTINCT — "not present" in the reference
    (SURVEY §2.7), exposed as first-class operators.

Scale notes: intersect/except hash-aggregate on the compared columns —
same shuffle profile as a groupBy; distinct-by-key prefers the
aggregate form (`groupBy().agg(first)`) over `dropDuplicates` when a
deterministic representative is required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from velox_hadoop_spark.plans.registry import register


def tagged_union(branches: list[tuple[str, DataFrame]], tag_col: str = "src") -> DataFrame:
    """UNION ALL with an explicit provenance tag per branch."""
    tagged = [df.withColumn(tag_col, F.lit(tag)) for tag, df in branches]
    out = tagged[0]
    for df in tagged[1:]:
        out = out.unionByName(df)
    return out


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------


@register(
    "union_provenance",
    oracle="""
        SELECT src, count(*) AS n, CAST(count(DISTINCT key) AS BIGINT) AS n_keys
        FROM (
            SELECT 'orders' AS src, o_custkey AS key FROM orders
            UNION ALL
            SELECT 'customer' AS src, c_custkey AS key FROM customer
        )
        GROUP BY src
    """,
    tags=("setops", "reference:LeanJoin.java:85-86"),
)
def q_union_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source union with explicit provenance tags (S13/U1)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    u = tagged_union(
        [
            ("orders", orders.select(F.col("o_custkey").alias("key"))),
            ("customer", customer.select(F.col("c_custkey").alias("key"))),
        ]
    )
    return u.groupBy("src").agg(
        F.count("*").alias("n"),
        F.countDistinct("key").alias("n_keys"),
    )


@register(
    "intersect_buyers",
    oracle="""
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000
        INTERSECT
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    tags=("setops", "intersect"),
)
def q_intersect_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: big-ticket buyers who are BUILDING-segment customers."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    big = orders.where(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("custkey")
    )
    building = customer.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    return big.intersect(building)


@register(
    "except_small_buyers",
    oracle="""
        SELECT c_custkey AS custkey FROM customer
        EXCEPT
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000
    """,
    tags=("setops", "except"),
)
def q_except_small_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers who never placed a big-ticket order."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    # subtract == EXCEPT (distinct) — not exceptAll, whose multiset
    # semantics would keep keys that merely appear more often on the left.
    return customer.select(F.col("c_custkey").alias("custkey")).subtract(
        orders.where(F.col("o_totalprice") > 100000).select(
            F.col("o_custkey").alias("custkey")
        )
    )


@register(
    "distinct_order_months",
    oracle="""
        SELECT DISTINCT o_orderpriority,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month
        FROM orders
    """,
    tags=("setops", "distinct"),
)
def q_distinct_order_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a computed column (month truncation)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return orders.select(
        "o_orderpriority",
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
    ).distinct()
