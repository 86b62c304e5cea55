"""Mergeable sketches as DATA, round 9. [extension]

The 100 TB incremental-stats story: distinct-count sketches are not
just an aggregate mode (``approx_distinct_parts_per_supplier`` covers
that), they are a TABLE you persist per partition-grain and re-merge
at query time. This module materializes per-DAY Apache DataSketches
HLL sketches of active users (Spark's ``hll_sketch_agg`` — binary,
re-mergeable), then rolls them up to ISO weeks with ``hll_union_agg``
— the partial+final merge running over STORED sketch bytes, not raw
rows — and scores every week's estimate against the exact distinct
count computed from the raw events.

Rows-only contract (like the two ``approx_*`` rows): DuckDB's HLL is a
different implementation, so there is no value-level oracle; the
driver records the rows-only check and ``tests/test_round9_parity.py``
asserts (a) the estimate is within tolerance of exact on every week,
(b) the union of day sketches equals the estimate a single week-grain
sketch would produce (merge associativity — the property that makes
the sketch table re-mergeable at any rollup grain), and (c) the output
is deterministic across runs.

Scale shape: the day-sketch table is calendar-bounded (one row per
day); week rollups merge ≤ 7 binary blobs per group; the exact side
exists only to score the sketch and would be dropped at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from velox_hadoop_spark.catalog import read_table
from velox_hadoop_spark.plans.registry import register

HLL_LG_K = 12  # DataSketches lgConfigK: 4096 buckets, ~1.6% RSE


def daily_user_sketches(events: DataFrame) -> DataFrame:
    """The sketch TABLE: (day, day_sk) — one re-mergeable HLL sketch of
    the day's active user ids. This is the frame a pipeline persists
    incrementally (append one row per day; never rescan history)."""
    return events.groupBy(F.to_date("ts").alias("day")).agg(
        F.hll_sketch_agg(F.col("user_id"), F.lit(HLL_LG_K)).alias("day_sk")
    )


def weekly_rollup(day_sketches: DataFrame) -> DataFrame:
    """Merge stored day sketches to ISO weeks: (week_start, n_days,
    est_users). The input is sketch BYTES — no raw events touched."""
    return (
        day_sketches.groupBy(
            F.date_trunc("week", F.col("day")).cast("date").alias("week_start")
        )
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.hll_sketch_estimate(
                F.hll_union_agg(F.col("day_sk"), F.lit(True))
            ).alias("est_users"),
        )
    )


HLL_AUDIT_TOL = 0.05  # |est − exact| / exact bound: ~3× the lgK=12 RSE


@register(
    "hll_weekly_merge_rollup",
    # Round-11 conversion from rows-only to a hash-green BOUNDS AUDIT:
    # the DataSketches estimate itself is implementation-defined (no
    # DuckDB twin), so the hashed output carries the EXACT weekly
    # distinct count (oracle-recomputed) plus a within_tol flag pinned
    # to literal TRUE — an estimate drifting past HLL_AUDIT_TOL flips
    # the flag and fails the driver hash gate. The tighter 2% check,
    # merge-associativity, and determinism stay in
    # tests/test_round9_parity.py.
    oracle=f"""
        SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
               CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
               CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
               TRUE AS within_tol
        FROM events
        GROUP BY 1
    """,
    tags=("sketch", "hll", "mergeable", "bounds-audit", "extension"),
)
def q_hll_weekly_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly distinct-user rollup computed by MERGING stored per-day
    HLL sketches (partial+final over sketch bytes), audited against
    the exact weekly distinct count: (week_start, n_days, exact_users,
    within_tol)."""
    events = read_table(spark, sf_dir, "events")
    weekly = weekly_rollup(daily_user_sketches(events))
    exact = events.groupBy(
        F.date_trunc("week", F.col("ts")).cast("date").alias("week_start")
    ).agg(F.countDistinct("user_id").alias("exact_users"))
    return (
        weekly.join(exact, "week_start")
        .select(
            "week_start",
            "n_days",
            "exact_users",
            (
                F.abs(F.col("est_users") - F.col("exact_users"))
                <= F.lit(HLL_AUDIT_TOL) * F.col("exact_users")
            ).alias("within_tol"),
        )
    )
