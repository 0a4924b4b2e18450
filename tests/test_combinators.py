"""Aggregate combinator semantics (-Array, -ForEach, -Distinct)."""

from pyspark.sql import functions as F

from clickhouse_core_spark.operators import (
    agg_array, agg_for_each, agg_distinct, count_or_null,
)


def test_agg_array_flattens(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (1, [3.0]), (2, [10.0])], "k int, arr array<double>")
    out = {r["k"]: (r["s"], r["m"], r["n"])
           for r in df.groupBy("k").agg(
               agg_array("sum", "arr").alias("s"),
               agg_array("max", "arr").alias("m"),
               agg_array("count", "arr").alias("n")).collect()}
    assert out[1] == (6.0, 3.0, 3)
    assert out[2] == (10.0, 10.0, 1)


def test_agg_for_each_elementwise(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 10.0]), (1, [2.0, 20.0, 5.0])], "k int, arr array<double>")
    out = df.groupBy("k").agg(agg_for_each("sum", "arr").alias("s")).collect()[0]["s"]
    assert out == [3.0, 30.0, 5.0]  # ragged arrays: missing = skipped


def test_agg_distinct_sum(spark):
    df = spark.createDataFrame([(1, 5.0), (1, 5.0), (1, 7.0)], "k int, v double")
    out = df.groupBy("k").agg(agg_distinct(F.sum, "v").alias("s")).collect()[0]["s"]
    assert out == 12.0


def test_count_or_null_empty(spark):
    df = spark.createDataFrame([(1, None), (1, None)], "k int, v string")
    out = df.groupBy("k").agg(count_or_null("v").alias("c")).collect()[0]["c"]
    assert out is None
