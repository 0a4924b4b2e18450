"""-ArgMin/-ArgMax combinators (reference
src/AggregateFunctions/Combinators/AggregateFunctionCombinatorsArgMinArgMax.cpp)."""

import pytest
from pyspark.sql import functions as F

from clickhouse_core_spark.operators.combinators import (
    agg_arg_max, agg_arg_min)
from clickhouse_core_spark.plans.frontend import ch_sql


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [("a", 1, 10.0), ("a", 1, 20.0), ("a", 5, 99.0),
         ("b", 2, 7.0), ("b", 9, 3.0)],
        "g string, k int, v double")


def test_sum_arg_min(df):
    out = {r.g: r.s for r in df.groupBy("g").agg(
        agg_arg_min("sum", "v", "k").alias("s")).collect()}
    assert out == {"a": 30.0, "b": 7.0}


def test_avg_arg_max(df):
    out = {r.g: r.s for r in df.groupBy("g").agg(
        agg_arg_max("avg", "v", "k").alias("s")).collect()}
    assert out == {"a": 99.0, "b": 3.0}


def test_any_arg_min_is_min_by(df):
    out = {r.g: r.s for r in df.groupBy("g").agg(
        agg_arg_min("any", "v", "k").alias("s")).collect()}
    assert out["b"] == 7.0


def test_count_min_max_bases(df):
    out = df.groupBy("g").agg(
        agg_arg_min("count", "v", "k").alias("c"),
        agg_arg_min("max", "v", "k").alias("mx"),
        agg_arg_max("min", "v", "k").alias("mn")).collect()
    d = {r.g: (r.c, r.mx, r.mn) for r in out}
    assert d == {"a": (2, 20.0, 99.0), "b": (1, 7.0, 3.0)}


def test_sql_form(spark, df):
    df.createOrReplaceTempView("t_amm")
    rows = ch_sql(spark, """
        SELECT g, sumArgMin(v, k) AS sam, avgArgMax(v, k) AS aam,
               anyArgMin(v, k) AS any_min
        FROM t_amm GROUP BY g ORDER BY g""").collect()
    assert rows[0].sam == 30.0 and rows[0].aam == 99.0
    assert rows[1].any_min == 7.0
