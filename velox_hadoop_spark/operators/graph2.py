"""Graph structure metrics, round 9. [extension]

Degree assortativity over the capped co-supply graph — does a
high-degree supplier co-supply with other hubs (r > 0) or with leaves
(r < 0)? Reuses ``graph.co_supply_capped_edges`` unmodified; the only
new math is a Pearson correlation over edge-endpoint degree pairs,
folded from EXACT integer sums (products ride decimal-38/HUGEINT — the
int64-overflow class at graph scales where Σd² grows with V·D²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from velox_hadoop_spark.operators.graph import (
    TRIANGLE_ADJ_CAP,
    co_supply_capped_edges,
)
from velox_hadoop_spark.plans.registry import register

# Same degree-bounded edge set as the triangle census (its oracle CTE
# is restated below so the two queries stay independently auditable).
_EDGE_CTES = f"""
    ps AS (SELECT DISTINCT l_partkey AS part, l_suppkey AS s FROM lineitem),
    pdeg AS (SELECT part, count(*) AS c FROM ps GROUP BY part),
    ok AS (SELECT p.part, p.s FROM ps p JOIN pdeg d ON p.part = d.part AND d.c <= 256),
    e_full AS (
        SELECT DISTINCT a.s AS s1, b.s AS s2
        FROM ok a JOIN ok b ON a.part = b.part AND a.s < b.s
    ),
    e AS (
        SELECT s1, s2 FROM (
            SELECT s1, s2,
                   row_number() OVER (PARTITION BY s1 ORDER BY s2) AS rn
            FROM e_full
        ) WHERE rn <= {TRIANGLE_ADJ_CAP}
    )
"""


@register(
    "degree_assortativity_suppliers",
    oracle=f"""
        WITH {_EDGE_CTES},
        deg AS (
            SELECT v, count(*) AS d FROM (
                SELECT s1 AS v FROM e UNION ALL SELECT s2 FROM e
            ) GROUP BY v
        ),
        pts AS (
            SELECT da.d AS x, db.d AS y
            FROM e JOIN deg da ON e.s1 = da.v JOIN deg db ON e.s2 = db.v
        ),
        s AS (
            SELECT 2 * count(*) AS n,
                   sum(x + y) AS sx,
                   sum(CAST(x AS HUGEINT) * x + CAST(y AS HUGEINT) * y) AS sxx,
                   sum(2 * CAST(x AS HUGEINT) * y) AS sxy,
                   count(*) AS n_edges
            FROM pts
        )
        SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
               CAST(n_edges AS BIGINT) AS n_edges,
               ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                     / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx),
                     6) AS assortativity
        FROM s
        WHERE n >= 2 AND CAST(n AS HUGEINT) * sxx > CAST(sx AS HUGEINT) * sx
    """,
    tags=("graph", "assortativity", "extension"),
)
def q_degree_assortativity_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the capped co-supply graph: Pearson r
    over the symmetrized edge-endpoint degree pairs (each undirected
    edge contributes both orientations, so Σx = Σy and one pass over
    the ORIENTED edge list folds all five sums). Degrees and all
    moment sums are exact integers (squares in decimal-38/HUGEINT);
    the zero-variance guard compares exact wide integers; r is the
    single displayed double. The edge frame feeds two consumers
    (degrees, endpoint join) and is persisted — the r8 re-execution
    anti-pattern check."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    e = co_supply_capped_edges(
        li.select(F.col("l_partkey").alias("part"), F.col("l_suppkey").alias("s"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    deg = (
        e.select(F.col("s1").alias("v"))
        .unionAll(e.select(F.col("s2").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("d"))
    )
    pts = (
        e.join(deg.select(F.col("v").alias("s1"), F.col("d").alias("x")), "s1")
        .join(deg.select(F.col("v").alias("s2"), F.col("d").alias("y")), "s2")
        .select("x", "y")
    )
    nn = deg.agg(F.count("*").alias("n_nodes"))
    s = pts.agg(
        (2 * F.count("*")).alias("n"),
        F.sum(F.col("x") + F.col("y")).alias("sx"),
        F.sum(
            F.col("x").cast("decimal(38,0)") * F.col("x")
            + F.col("y").cast("decimal(38,0)") * F.col("y")
        ).alias("sxx"),
        F.sum(2 * F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.count("*").alias("n_edges"),
    )
    return s.crossJoin(nn).where(
        (F.col("n") >= 2)
        & (
            F.col("n").cast("decimal(38,0)") * F.col("sxx")
            > F.col("sx").cast("decimal(38,0)") * F.col("sx")
        )
    ).select(
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("n_edges").cast("long").alias("n_edges"),
        F.round(
            (
                F.col("n") * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sx")
            )
            / (
                F.col("n") * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx")
            ),
            6,
        ).alias("assortativity"),
    )
