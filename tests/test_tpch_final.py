"""Correlated-subquery TPC-H analogs (Q15/Q17/Q20/Q21) + reshape ops."""

import pytest

from tests.conftest import assert_parity

PARITY_QUERIES = [
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q20_bulk_shippers",
    "tpch_q21_waiting_suppliers",
    "pivot_orders_status",
    "unpivot_lineitem_measures",
    "grouping_sets_revenue",
]


@pytest.mark.parametrize("name", PARITY_QUERIES)
def test_oracle_parity(spark, duck, name):
    assert_parity(spark, duck, name)


def test_queries_select_nontrivial_subsets(spark, duck):
    """Guard against predicates that silently select nothing: each of
    the four new TPC-H analogs must produce rows at sf0.01 (an empty
    result would make the oracle parity test vacuous)."""
    from velox_hadoop_spark.plans import registry
    from tests.conftest import SF_DIR

    for name in PARITY_QUERIES[:4]:
        n = registry.queries()[name](spark, SF_DIR).count()
        assert n > 0, name


def test_pivot_explicit_values_single_scan(spark):
    """Pivot with an explicit value list must not run a value-discovery
    pass: the optimized plan reads the source exactly once (Spark's
    pivot is two Aggregate nodes — partial by (grp, pivot) then
    pivotfirst — over a single scan)."""
    from tests.conftest import SF_DIR
    from velox_hadoop_spark.plans import registry

    df = registry.queries()["pivot_orders_status"](spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Relation") == 1, plan
