"""Retrieval / behavioral-similarity / cohort operators: oracle parity
plus semantic invariants."""

import pytest

from tests.conftest import SF_DIR, assert_parity

PARITY_QUERIES = [
    "bm25_top_docs",
    "user_profile_cosine",
    "neighbor_jaccard_links",
    "retention_cohorts",
    "weighted_sample_docs",
]


@pytest.mark.parametrize("name", PARITY_QUERIES)
def test_oracle_parity(spark, duck, name):
    assert_parity(spark, duck, name)


def test_bm25_scores_positive_and_ranked(spark):
    from velox_hadoop_spark.plans import registry

    rows = registry.queries()["bm25_top_docs"](spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    scores = [r.bm25 for r in rows]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)


def test_profile_cosine_bounds(spark):
    from velox_hadoop_spark.plans import registry

    rows = registry.queries()["user_profile_cosine"](spark, SF_DIR).collect()
    assert rows
    # count vectors are non-negative, so cosine lands in [0, 1]
    assert all(0.0 <= r.cos_sim <= 1.0 + 1e-9 for r in rows)
    assert all(r.user_a < r.user_b for r in rows)


def test_neighbor_jaccard_bounds(spark):
    from velox_hadoop_spark.catalog import read_table
    from velox_hadoop_spark.plans import registry
    from pyspark.sql import functions as F

    rows = registry.queries()["neighbor_jaccard_links"](spark, SF_DIR).collect()
    assert rows
    assert all(0.0 < r.jaccard <= 1.0 for r in rows)
    # n_common can never exceed either endpoint's degree
    li = read_table(spark, SF_DIR, "lineitem")
    deg = {
        r.s: r.deg
        for r in li.select(F.col("l_suppkey").alias("s"), "l_partkey")
        .distinct()
        .groupBy("s")
        .agg(F.count("*").alias("deg"))
        .collect()
    }
    assert all(r.n_common <= min(deg[r.s1], deg[r.s2]) for r in rows)


def test_retention_cohort_week0_equals_cohort_size(spark):
    """Every user appears in their own cohort's offset-0 cell, so the
    offset-0 count equals the cohort's total distinct users."""
    from velox_hadoop_spark.catalog import read_table
    from velox_hadoop_spark.operators.timeseries import retention_cohorts, EPOCH
    from pyspark.sql import functions as F

    ev = read_table(spark, SF_DIR, "events")
    ret = retention_cohorts(ev).collect()
    assert all(r.week_offset >= 0 for r in ret)
    week0 = {r.cohort_week: r.n_users for r in ret if r.week_offset == 0}
    wk = ev.select(
        "user_id",
        F.floor(
            F.datediff(F.col("ts").cast("date"), F.lit(EPOCH).cast("date")) / 7
        ).alias("w"),
    )
    cohort_sizes = {
        r.cohort: r.n
        for r in wk.groupBy("user_id")
        .agg(F.min("w").alias("cohort"))
        .groupBy("cohort")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert week0 == cohort_sizes


def test_weighted_sample_prefers_long_docs(spark):
    """Length-weighted sampling must skew the sample's mean doc length
    above the corpus mean (weight = n_chars)."""
    from velox_hadoop_spark.catalog import read_table
    from velox_hadoop_spark.operators.sampling import weighted_sample

    docs = read_table(spark, SF_DIR, "documents")
    corpus_mean = docs.agg({"n_chars": "avg"}).first()[0]
    sample = weighted_sample(docs, "doc_id", "n_chars", 50)
    sample_mean = sample.agg({"n_chars": "avg"}).first()[0]
    assert sample_mean > corpus_mean


def test_weighted_sample_stable_under_repartitioning(spark):
    from velox_hadoop_spark.catalog import read_table
    from velox_hadoop_spark.operators.sampling import weighted_sample

    docs = read_table(spark, SF_DIR, "documents")
    a = [r.doc_id for r in weighted_sample(docs, "doc_id", "n_chars", 50).collect()]
    b = [
        r.doc_id
        for r in weighted_sample(
            docs.repartition(13, "source"), "doc_id", "n_chars", 50
        ).collect()
    ]
    assert a == b and len(a) == 50
