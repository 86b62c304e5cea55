"""Corpus-QA operators (quality.py): unit behavior + oracle parity."""

import math

import pytest
from pyspark.sql import functions as F

from velox_hadoop_spark.operators.quality import (
    _rp_weights,
    random_projection,
    token_entropy,
)
from tests.conftest import assert_parity

PARITY_QUERIES = [
    "token_entropy_quality",
    "heavy_hitters_by_source",
    "dup_rate_by_source",
    "event_value_outliers",
    "mad_robust_outliers",
    "duplicate_ngram_coverage",
    "inverted_index_tokens",
    "embedding_random_projection",
]


@pytest.mark.parametrize("name", PARITY_QUERIES)
def test_oracle_parity(spark, duck, name):
    assert_parity(spark, duck, name)


def test_entropy_uniform_and_degenerate(spark):
    """4 distinct tokens -> H = 2 bits; all-same tokens -> H = 0."""
    df = spark.createDataFrame(
        [(0, "a b c d"), (1, "x x x x x x x x")], ["doc_id", "text"]
    )
    got = {r.doc_id: r for r in token_entropy(df).collect()}
    assert got[0].entropy == pytest.approx(2.0)
    assert got[0].n_types == 4 and got[0].n_tokens == 4
    assert got[1].entropy == pytest.approx(0.0)
    assert got[1].type_token_ratio == pytest.approx(1 / 8)


def test_entropy_matches_direct_formula(spark):
    """Mixed distribution {a:2, b:1, c:1} over 4 tokens."""
    df = spark.createDataFrame([(0, "a a b c")], ["doc_id", "text"])
    row = token_entropy(df).collect()[0]
    expect = -(0.5 * math.log2(0.5) + 2 * 0.25 * math.log2(0.25))
    assert row.entropy == pytest.approx(expect, abs=1e-6)


def test_random_projection_is_signed_sum(spark):
    """A one-hot input vector must project to exactly the weight column."""
    w = _rp_weights()
    one_hot = [0.0] * 64
    one_hot[7] = 1.0
    df = spark.createDataFrame([(0, one_hot)], ["vec_id", "embedding"])
    row = random_projection(df).collect()[0]
    for p in range(8):
        assert row[f"p{p}"] == w[p][7]


def test_random_projection_seed_independent_of_lsh_planes():
    """The rp| namespace must not reuse the LSH bucket planes."""
    from velox_hadoop_spark.operators.similarity import _plane_weights

    assert _rp_weights() != _plane_weights(8, 64)


def test_dup_coverage_flags_copied_doc(spark):
    """A doc duplicated verbatim has coverage 1.0; a unique doc 0.0."""
    from velox_hadoop_spark.operators.dedup import shingle_set
    from velox_hadoop_spark.operators.quality import q_duplicate_ngram_coverage  # noqa: F401

    df = spark.createDataFrame(
        [
            (0, "w1 w2 w3 w4 w5 w6 w7"),
            (1, "w1 w2 w3 w4 w5 w6 w7"),
            (2, "q1 q2 q3 q4 q5 q6 q7"),
        ],
        ["doc_id", "text"],
    )
    sh = shingle_set(df, "doc_id", "text")
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("dfv"))
    cov = (
        sh.join(dfreq, "shingle")
        .groupBy("doc_id")
        .agg(
            (F.sum((F.col("dfv") >= 2).cast("long")) / F.count("*")).alias("c")
        )
    )
    got = {r.doc_id: r.c for r in cov.collect()}
    assert got[0] == 1.0 and got[1] == 1.0 and got[2] == 0.0


def test_mad_is_zero_variance_proof(spark):
    """Constant values -> MAD 0 and no outliers; one wild value is
    caught without dragging the median."""
    rows = [("t", 5.0)] * 9 + [("t", 500.0)]
    df = spark.createDataFrame(rows, ["event_type", "value"])
    med = df.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = df.join(med, "event_type")
    mad = dev.groupBy("event_type").agg(
        F.any_value("med").alias("med"),
        F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"),
    ).collect()[0]
    assert mad.med == 5.0 and mad.mad == 0.0
