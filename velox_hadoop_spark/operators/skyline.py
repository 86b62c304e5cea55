"""Pareto-frontier (skyline) operator. [extension]

Skyline query: the set of points not dominated by any other point —
here parts where no other part is both cheaper-or-equal AND
larger-or-equal (strict in at least one). The classic multi-criteria
shortlist (price/quality trade-off curves, model-selection frontiers).
Not present in the reference (SURVEY §2 has no multi-criteria
operator); Spark has no built-in skyline.

Scale design: a naive skyline is an all-pairs NOT EXISTS (quadratic)
or a single global window (serializes the table through one task).
This implementation reduces to DISTINCT coordinates, then computes a
DISTRIBUTED prefix-max over the (price asc, size desc) total order
with the same 3-phase shape as ``sort.global_rank``:

  1. range-partition on the order (sampled bounds, data-parallel) and
     sort within each partition — the ONLY exchange of the data;
  2. per-partition local running max via a stateful mapInPandas pass
     (``np.maximum.accumulate`` with the running max carried across
     Arrow batches) — not a ``Window.partitionBy(__pid)``, which would
     re-shuffle the whole table on ``__pid``;
  3. fold in each partition's predecessor max — a numPartitions-row
     aggregate broadcast back (the only non-distributed step, bounded
     by partition count, never by data).

For distinct coordinates ordered by (price asc, size desc), a point
is dominated iff ANY predecessor has size >= its own: a predecessor
with strictly larger size is cheaper-or-equal and bigger; one with
equal size is strictly cheaper (coords are distinct). So dominance
collapses to ``prefix_max(size) >= size`` — one comparison per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from velox_hadoop_spark.plans.registry import register


def skyline_min_max(
    df: DataFrame, minimize: str, maximize: str
) -> DataFrame:
    """Distinct (minimize, maximize) coordinate pairs on the Pareto
    frontier: minimal in ``minimize``, maximal in ``maximize``."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    coords = df.select(
        F.col(minimize).alias("m"), F.col(maximize).alias("x")
    ).distinct()
    m_t = coords.schema["m"].dataType.simpleString()
    x_t = coords.schema["x"].dataType.simpleString()
    # ONE exchange of the coords: range-partition + sort WITHIN the
    # partition. The local exclusive prefix max is a stateful
    # mapInPandas pass (np.maximum.accumulate, running max carried
    # across Arrow batches — a task's iterator covers its whole
    # partition in order), NOT a Window.partitionBy(__pid), which
    # Catalyst backs with a second full-data hash exchange because it
    # cannot prove the range layout clusters by __pid (the same hidden
    # double shuffle measured and removed from sort.global_rank).
    parts = (
        coords.repartitionByRange(F.col("m").asc(), F.col("x").desc())
        .sortWithinPartitions(F.col("m").asc(), F.col("x").desc())
        .withColumn("__pid", F.spark_partition_id())
    )

    def local_prefix(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Running max carried across Arrow batches in the column's
        # NATIVE dtype (int64 prefix max stays exact above 2^53, where
        # a float64 detour would collapse near-equal large values), and
        # a has-prior boolean instead of a -inf sentinel (a legitimate
        # first-row x of -inf must not be mistaken for "no prior").
        running = None  # native-dtype scalar once the first row is seen
        for pdf in batches:
            xs = pdf["x"].to_numpy()
            n = len(xs)
            if n == 0:
                yield pd.DataFrame(
                    {
                        "m": pdf["m"],
                        "x": pdf["x"],
                        "__pid": pdf["__pid"],
                        "__lpm": xs,
                        "__has": np.zeros(0, dtype=bool),
                    }
                )
                continue
            cm = np.maximum.accumulate(xs)
            lpm = np.empty(n, dtype=cm.dtype)
            lpm[1:] = cm[:-1]
            has = np.ones(n, dtype=bool)
            if running is None:
                lpm[0] = xs[0]  # placeholder; masked by __has below
                has[0] = False
            else:
                lpm[0] = running
                np.maximum(lpm[1:], running, out=lpm[1:])
            running = cm[-1] if running is None else max(running, cm[-1])
            yield pd.DataFrame(
                {
                    "m": pdf["m"],
                    "x": pdf["x"],
                    "__pid": pdf["__pid"],
                    "__lpm": lpm,
                    "__has": has,
                }
            )

    local = parts.mapInPandas(
        local_prefix, f"m {m_t}, x {x_t}, __pid int, __lpm {x_t}, __has boolean"
    )
    pmax = parts.groupBy("__pid").agg(F.max("x").alias("__mx"))
    # numPartitions rows — a single-partition window here is bounded
    # by partition count, not data (same note as sort.global_rank).
    w_prior = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    prior = pmax.withColumn("__prior", F.max("__mx").over(w_prior)).select(
        "__pid", "__prior"
    )
    with_pm = local.join(F.broadcast(prior), "__pid").withColumn(
        # greatest() skips NULLs: local prefix counts only when a prior
        # row exists in this partition (__has), and __prior is NULL for
        # the first partition — both NULL means no predecessor at all.
        "__pm",
        F.greatest(
            F.when(F.col("__has"), F.col("__lpm")), F.col("__prior")
        ),
    )
    return (
        with_pm.where(F.col("__pm").isNull() | (F.col("__pm") < F.col("x")))
        .select(F.col("m").alias(minimize), F.col("x").alias(maximize))
    )


@register(
    "pareto_frontier_parts",
    oracle="""
        WITH coords AS (
            SELECT DISTINCT p_retailprice, p_size FROM part
        ),
        sky AS (
            SELECT p_retailprice, p_size FROM (
                SELECT p_retailprice, p_size,
                       max(p_size) OVER (
                           ORDER BY p_retailprice ASC, p_size DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ) AS pm
                FROM coords
            ) WHERE pm IS NULL OR pm < p_size
        )
        SELECT p.p_partkey, p.p_retailprice, p.p_size
        FROM part p JOIN sky USING (p_retailprice, p_size)
    """,
    tags=("skyline", "pareto", "extension"),
)
def q_pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts on the (cheapest, largest) Pareto frontier — every part
    for which no other part is at-least-as-cheap AND at-least-as-large
    with one strict."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    sky = skyline_min_max(part, "p_retailprice", "p_size")
    return part.join(
        F.broadcast(sky), ["p_retailprice", "p_size"]
    ).select("p_partkey", "p_retailprice", "p_size")
