"""Deterministic sampling / split operators: oracle parity + invariants."""

import pytest

from tests.conftest import SF_DIR, assert_parity

PARITY_QUERIES = [
    "sample_documents_10pct",
    "train_test_split_counts",
    "stratified_sample_by_lang",
    "capped_docs_per_source",
]


@pytest.mark.parametrize("name", PARITY_QUERIES)
def test_oracle_parity(spark, duck, name):
    assert_parity(spark, duck, name)


def test_sample_stable_under_repartitioning(spark):
    """Hash sampling must select the SAME rows regardless of physical
    partitioning (the property df.sample() lacks)."""
    from velox_hadoop_spark.catalog import read_table
    from velox_hadoop_spark.operators.sampling import deterministic_sample

    docs = read_table(spark, SF_DIR, "documents")
    a = {r.doc_id for r in deterministic_sample(docs, "doc_id", 10).collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(docs.repartition(17, "lang"), "doc_id", 10).collect()
    }
    assert a == b and len(a) > 0


def test_split_is_disjoint_and_exhaustive(spark):
    from velox_hadoop_spark.catalog import read_table
    from velox_hadoop_spark.operators.sampling import assign_split

    docs = read_table(spark, SF_DIR, "documents")
    split = assign_split(docs, "doc_id", 80)
    counts = {r.split: r.n for r in split.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert set(counts) == {"train", "test"}
    assert sum(counts.values()) == docs.count()
    # roughly 80/20 (hash uniformity; generous tolerance at 500 docs)
    frac = counts["train"] / sum(counts.values())
    assert 0.7 < frac < 0.9


def test_capped_per_group_respects_cap(spark):
    from velox_hadoop_spark.catalog import read_table
    from velox_hadoop_spark.operators.sampling import capped_per_group

    docs = read_table(spark, SF_DIR, "documents")
    capped = capped_per_group(docs, "source", "doc_id", 5)
    per_group = capped.groupBy("source").count().collect()
    assert all(r["count"] <= 5 for r in per_group)


def test_sampling_plan_is_shuffle_free(spark):
    """Percent sampling must compile to scan+filter only: no Exchange."""
    from velox_hadoop_spark.plans import registry

    df = registry.queries()["sample_documents_10pct"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
