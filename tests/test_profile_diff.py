"""Table profiling, SCD2 history, snapshot diff: parity + invariants."""

import pytest

from tests.conftest import SF_DIR, assert_parity

PARITY_QUERIES = [
    "profile_columns_orders",
    "scd2_user_event_history",
    "snapshot_diff_orders",
    "incremental_agg_refresh",
    "ols_price_trend",
]


@pytest.mark.parametrize("name", PARITY_QUERIES)
def test_oracle_parity(spark, duck, name):
    assert_parity(spark, duck, name)


def test_profile_reads_one_column_per_scan(spark):
    """Each per-column aggregate must prune its scan to that column —
    the reason the union-of-narrow-scans shape beats a multi-distinct
    Expand at scale."""
    from velox_hadoop_spark.plans import registry

    df = registry.queries()["profile_columns_orders"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan, plan
    assert "ReadSchema: struct<o_orderkey:bigint>" in plan, plan


def test_scd2_intervals_chain(spark):
    """Validity intervals must chain: exactly one current row per user,
    and every non-current valid_to equals some later valid_from."""
    from velox_hadoop_spark.plans import registry

    rows = registry.queries()["scd2_user_event_history"](spark, SF_DIR).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, versions in by_user.items():
        current = [r for r in versions if r.is_current]
        assert len(current) == 1, f"user {user}: {len(current)} current rows"
        versions.sort(key=lambda r: (r.valid_from, r.event_id))
        for a, b in zip(versions, versions[1:]):
            assert a.valid_to == b.valid_from

def test_snapshot_diff_statuses_partition_keyspace(spark):
    """added/removed/changed statuses must match the simulated bucket
    layout: removed = buckets 0-9, added = 90-99, changed = 80-89."""
    from pyspark.sql import functions as F

    from velox_hadoop_spark.functions.hashing import seeded, spark_md5_int60
    from velox_hadoop_spark.operators.setops import SNAP_SEED
    from velox_hadoop_spark.plans import registry

    diff = registry.queries()["snapshot_diff_orders"](spark, SF_DIR)
    b = F.expr(spark_md5_int60(seeded("o_orderkey", SNAP_SEED))) % 100
    got = {
        (r.status, r.band)
        for r in diff.withColumn(
            "band", F.floor(b / 10).cast("int")
        ).select("status", "band").distinct().collect()
    }
    for status, band in got:
        if status == "removed":
            assert band == 0
        elif status == "added":
            assert band == 9
        else:
            assert band == 8


def test_incremental_refresh_drops_emptied_groups(spark):
    """Merging base with deltas must remove a group whose count hits 0
    and admit a group born in the delta."""
    from pyspark.sql import functions as F

    base = spark.createDataFrame([(1, 2, 50.0), (2, 1, 10.0)], ["k", "bn", "bt"])
    delta = spark.createDataFrame([(2, -1, -10.0), (3, 1, 7.0)], ["k", "dn", "dt"])
    merged = base.join(delta, "k", "full_outer").select(
        "k",
        (F.coalesce("bn", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
        (F.coalesce("bt", F.lit(0.0)) + F.coalesce("dt", F.lit(0.0))).alias("t"),
    ).where(F.col("n") > 0)
    got = {r.k: (r.n, r.t) for r in merged.collect()}
    assert got == {1: (2, 50.0), 3: (1, 7.0)}


def test_ols_recovers_exact_line(spark):
    """Points on y = 2x + 1 must fit slope 2, intercept 1 exactly."""
    from pyspark.sql import functions as F

    pts = spark.createDataFrame(
        [("g", float(x), 2.0 * x + 1.0) for x in range(10)], ["g", "x", "y"]
    )
    row = pts.groupBy("g").agg(
        F.regr_slope("y", "x").alias("s"), F.regr_intercept("y", "x").alias("i")
    ).collect()[0]
    assert row.s == pytest.approx(2.0) and row.i == pytest.approx(1.0)
