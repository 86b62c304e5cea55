"""Text operators: unit behavior + DuckDB oracle parity."""

import pytest

from velox_hadoop_spark.operators.text import tokenize, wordcount, grep
from tests.conftest import assert_parity


def test_tokenize_drops_empty(spark):
    df = spark.createDataFrame([("  a  b ",), ("",), ("c",)], ["text"])
    words = [r.word for r in tokenize(df).collect()]
    assert sorted(words) == ["a", "b", "c"]


def test_wordcount_counts(spark):
    df = spark.createDataFrame([("a b a",), ("b a",)], ["text"])
    got = {r.word: r.cnt for r in wordcount(df).collect()}
    assert got == {"a": 3, "b": 2}


def test_grep_orders_desc(spark):
    df = spark.createDataFrame([("sort sort scan",), ("sun moon",)], ["text"])
    rows = grep(df, "text", "s[a-z]+").collect()
    assert rows[0].match == "sort" and rows[0].cnt == 2
    assert {r.match for r in rows} == {"sort", "scan", "sun"}


@pytest.mark.parametrize(
    "name",
    ["wordcount", "aggregate_wordcount", "grep", "grep_capture_group", "udaf_geomean_price"],
)
def test_oracle_parity(spark, duck, name):
    assert_parity(spark, duck, name)


def test_grep_capture_group_extracts_stem(spark):
    df = spark.createDataFrame([("singing and making things",)], ["text"])
    rows = grep(df, "text", "([a-z]+)ing", group=1).collect()
    assert {(r.match, r.cnt) for r in rows} == {("sing", 1), ("mak", 1), ("th", 1)}
