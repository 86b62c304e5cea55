"""Table profiling, SCD2 history, snapshot diff: parity + invariants."""

import pytest

from tests.conftest import SF_DIR, assert_parity

PARITY_QUERIES = [
    "profile_columns_orders",
    "scd2_user_event_history",
    "snapshot_diff_orders",
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
