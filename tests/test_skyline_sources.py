"""Skyline, distribution windows, partitioned-sink pruning: parity +
invariants + plan shape."""

import pytest

from tests.conftest import SF_DIR, assert_parity

PARITY_QUERIES = [
    "pareto_frontier_parts",
    "supplier_balance_distribution",
    "partitioned_parquet_prune",
]


@pytest.mark.parametrize("name", PARITY_QUERIES)
def test_oracle_parity(spark, duck, name):
    assert_parity(spark, duck, name)


def test_skyline_matches_bruteforce(spark):
    """The distributed prefix-max skyline must equal the quadratic
    definition: no other point cheaper-or-equal AND larger-or-equal
    with one strict."""
    from velox_hadoop_spark.catalog import read_table
    from velox_hadoop_spark.operators.skyline import skyline_min_max

    part = read_table(spark, SF_DIR, "part")
    pts = [(r.p_retailprice, r.p_size) for r in part.select("p_retailprice", "p_size").collect()]
    brute = {
        (m, x)
        for m, x in set(pts)
        if not any(
            (m2 <= m and x2 >= x and (m2 < m or x2 > x)) for m2, x2 in pts
        )
    }
    got = {
        (r.p_retailprice, r.p_size)
        for r in skyline_min_max(part, "p_retailprice", "p_size").collect()
    }
    assert got == brute and got


def test_skyline_survives_repartitioning(spark):
    """Range-partitioned prefix-max must be partitioning-independent."""
    from velox_hadoop_spark.catalog import read_table
    from velox_hadoop_spark.operators.skyline import skyline_min_max

    part = read_table(spark, SF_DIR, "part")
    a = {tuple(r) for r in skyline_min_max(part, "p_retailprice", "p_size").collect()}
    b = {
        tuple(r)
        for r in skyline_min_max(
            part.repartition(11, "p_brand"), "p_retailprice", "p_size"
        ).collect()
    }
    assert a == b


def test_partitioned_read_prunes_partitions(spark):
    """The partition-column filter must resolve at planning time:
    PartitionFilters populated, no post-scan Filter on the partition
    column."""
    from velox_hadoop_spark.plans import registry

    df = registry.queries()["partitioned_parquet_prune"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderpriority" in plan, plan


def test_cume_dist_bounds_and_top_decile(spark):
    from velox_hadoop_spark.plans import registry

    rows = registry.queries()["supplier_balance_distribution"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.pct_rank <= 1.0
        assert 0.0 < r.cume <= 1.0
        assert r.top_decile == (1 if r.cume >= 0.9 else 0)


def test_skyline_multi_matches_bruteforce(spark):
    """The rewritten d>=3 kernel (single bounded-collect phase 1 +
    sort-based O(n·k) global frontier scan) must match an O(n²)
    dominance scan on adversarial data: small value domains (many
    partial ties), mixed minimize/maximize directions, several
    partitions."""
    from velox_hadoop_spark.operators.skyline import skyline_multi

    rows = [
        (i % 7, (i * 3) % 11, (i * 5) % 13, (i * i) % 17)
        for i in range(500)
    ]
    df = spark.createDataFrame(
        rows, "a int, b int, c int, d int"
    ).repartition(9)
    got = {
        tuple(r)
        for r in skyline_multi(
            df, minimize=["a", "b"], maximize=["c", "d"]
        ).collect()
    }
    pts = set(rows)

    def dominated(p):
        a, b, c, d = p
        return any(
            (a2 <= a and b2 <= b and c2 >= c and d2 >= d)
            and (a2 < a or b2 < b or c2 > c or d2 > d)
            for (a2, b2, c2, d2) in pts
        )

    want = {p for p in pts if not dominated(p)}
    assert got == want
