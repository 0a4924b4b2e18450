"""Operator tests: window-function extensions (§2.5)."""

import datetime as dt
import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from clickhouse_core_spark.operators.windows import (
    non_negative_derivative,
    exponential_time_decayed_sum,
    exponential_time_decayed_avg,
    lag_in_frame,
    lead_in_frame,
)


def _ts(sec):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


def test_non_negative_derivative(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), 0.0), (1, _ts(10), 20.0), (1, _ts(20), 10.0)],
        "k int, ts timestamp, v double")
    w = Window.partitionBy("k").orderBy("ts")
    out = (df.select("ts", non_negative_derivative("v", "ts", w).alias("d"))
           .orderBy("ts").collect())
    assert out[0].d == 0.0           # first row: reference default value
    assert out[1].d == 2.0           # (20-0)/10
    assert out[2].d == 0.0           # negative clamped


def test_exp_time_decayed_sum(spark):
    rows = [(1, _ts(0), 1.0), (1, _ts(10), 1.0), (1, _ts(20), 1.0)]
    df = spark.createDataFrame(rows, "k int, ts timestamp, v double")
    w = Window.partitionBy("k").orderBy("ts")
    out = (df.select("ts", exponential_time_decayed_sum("v", "ts", 10.0, w).alias("s"))
           .orderBy("ts").collect())
    # manual: S_0 = 1; S_1 = 1 + e^-1; S_2 = 1 + e^-1 + e^-2
    assert abs(out[0].s - 1.0) < 1e-9
    assert abs(out[1].s - (1 + math.exp(-1))) < 1e-9
    assert abs(out[2].s - (1 + math.exp(-1) + math.exp(-2))) < 1e-9


def test_exp_time_decayed_avg_bounded(spark):
    rows = [(1, _ts(i * 5), float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "k int, ts timestamp, v double")
    w = Window.partitionBy("k").orderBy("ts")
    out = (df.select(exponential_time_decayed_avg("v", "ts", 20.0, w).alias("a"))
           .collect())
    for r in out:
        assert 0.0 <= r.a <= 9.0


def test_lag_lead_in_frame(spark):
    df = spark.createDataFrame([(1, i, i * 10) for i in range(4)],
                               "k int, o int, v int")
    w = Window.partitionBy("k").orderBy("o")
    out = (df.select("o", lag_in_frame("v", 1, w).alias("lg"),
                     lead_in_frame("v", 1, w).alias("ld"))
           .orderBy("o").collect())
    assert [r.lg for r in out] == [None, 0, 10, 20]
    assert [r.ld for r in out] == [10, 20, 30, None]


def test_running_difference_and_neighbor(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from clickhouse_core_spark.operators.windows import (
        running_difference, neighbor)
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 13.0), (1, 3, 11.0), (2, 1, 5.0)],
        "k int, i int, v double")
    w = Window.partitionBy("k").orderBy("i")
    out = df.select("k", "i", running_difference("v", w).alias("rd"),
                    neighbor("v", 1, w, -1.0).alias("nxt"),
                    neighbor("v", -1, w).alias("prv"))
    rows = {(r["k"], r["i"]): (r["rd"], r["nxt"], r["prv"])
            for r in out.collect()}
    assert rows[(1, 1)] == (0.0, 13.0, None)
    assert rows[(1, 2)] == (3.0, 11.0, 10.0)
    assert rows[(1, 3)] == (-2.0, -1.0, 13.0)
    assert rows[(2, 1)] == (0.0, -1.0, None)


def test_running_accumulate_and_variants(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from clickhouse_core_spark.operators.windows import (
        running_accumulate, running_difference_starting_with_first_value,
        row_number_in_all_blocks)
    df = spark.createDataFrame([(1, 10), (2, 15), (3, 21)], "i int, v int")
    w = Window.orderBy("i")
    out = df.select(
        "i",
        running_accumulate("v", w).alias("acc"),
        running_difference_starting_with_first_value("v", w).alias("rd"),
        row_number_in_all_blocks(w).alias("rn")).orderBy("i").collect()
    assert [r["acc"] for r in out] == [10, 25, 46]
    assert [r["rd"] for r in out] == [10, 5, 6]
    assert [r["rn"] for r in out] == [0, 1, 2]
