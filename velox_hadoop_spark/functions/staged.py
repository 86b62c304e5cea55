"""Staged (two-pass) window patterns that avoid whole-group single-task
sorts — the plan shapes that survive O(1)-cardinality grouping keys at
data scale.

A window partitioned by a low-cardinality key ("source", "bucket")
funnels an entire group through one task. The helpers here keep the
same exact semantics with bounded tasks:

- ``staged_topk_per_group``: per-(group, input-partition) top-k first
  (each window group is bounded by a scan partition), then a final rank
  over ≤ cap × n_partitions survivors per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def staged_topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str | Column],
    cap: int,
    rank_name: str | None = None,
) -> DataFrame:
    """Exact deterministic per-group top-``cap`` without a single-task
    whole-group sort.

    Stage 1 ranks within (group, spark input partition): each window
    group holds only one scan partition's rows for that group, so task
    memory is bounded by the partition, never the group, and the
    per-partition top-cap is always a superset of the global top-cap.
    Stage 2 ranks the ≤ cap × n_partitions survivors per group — a
    small frame no matter how large the group was. The output is
    partition-layout independent because stage 1 keeps a superset.

    ``order_cols`` must define a total order within each group (add a
    unique id as the last key) or ties make row_number nondeterministic.
    When ``rank_name`` is given the final 1-based rank is kept as that
    column.
    """
    final_rank = rank_name or "__rn2"
    tagged = df.withColumn("__pid", F.spark_partition_id())
    w1 = Window.partitionBy(*group_cols, "__pid").orderBy(*order_cols)
    pruned = (
        tagged.withColumn("__rn1", F.row_number().over(w1))
        .where(F.col("__rn1") <= cap)
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    out = (
        pruned.withColumn(final_rank, F.row_number().over(w2))
        .where(F.col(final_rank) <= cap)
        .drop("__pid", "__rn1")
    )
    if rank_name is None:
        out = out.drop("__rn2")
    return out
