"""Operator tests: join variants (SURVEY §2.3)."""

import datetime as dt

from pyspark.sql import functions as F

from clickhouse_core_spark.operators import asof_join, any_join, array_join, paste_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "a"),
         (1, _ts("2024-01-01 12:00:00"), "b"),
         (2, _ts("2024-01-01 10:00:00"), "c")],
        "k int, ts timestamp, lv string")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), 100),
         (1, _ts("2024-01-01 11:00:00"), 200),
         (2, _ts("2024-01-01 11:00:00"), 300)],
        "k int, rts timestamp, rv int")
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="rts",
                    inequality=">=", how="inner")
    got = {(r.lv, r.rv) for r in out.collect()}
    assert got == {("a", 100), ("b", 200)}  # c has no right row <= 10:00


def test_asof_backward_equal_ts_inclusive_vs_strict(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01 10:00:00"), "x")],
                                 "k int, ts timestamp, lv string")
    right = spark.createDataFrame([(1, _ts("2024-01-01 10:00:00"), 7)],
                                  "k int, rts timestamp, rv int")
    inclusive = asof_join(left, right, ["k"], "ts", "rts", ">=").collect()
    strict = asof_join(left, right, ["k"], "ts", "rts", ">").collect()
    assert len(inclusive) == 1 and inclusive[0].rv == 7
    assert len(strict) == 0


def test_asof_forward(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01 10:00:00"), "x")],
                                 "k int, ts timestamp, lv string")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), 1),
         (1, _ts("2024-01-01 11:00:00"), 2),
         (1, _ts("2024-01-01 12:00:00"), 3)],
        "k int, rts timestamp, rv int")
    out = asof_join(left, right, ["k"], "ts", "rts", "<=").collect()
    assert len(out) == 1 and out[0].rv == 2  # nearest at-or-after


def test_asof_left_keeps_unmatched(spark):
    left = spark.createDataFrame([(9, _ts("2024-01-01 10:00:00"), "x")],
                                 "k int, ts timestamp, lv string")
    right = spark.createDataFrame([(1, _ts("2024-01-01 09:00:00"), 1)],
                                  "k int, rts timestamp, rv int")
    out = asof_join(left, right, ["k"], "ts", "rts", ">=", how="left").collect()
    assert len(out) == 1 and out[0].rv is None


def test_any_join_dedupes_right(spark):
    left = spark.createDataFrame([(1, "l")], "k int, lv string")
    right = spark.createDataFrame([(1, 30), (1, 10), (1, 20)], "k int, rv int")
    out = any_join(left, right, on=["k"], tie_break=[F.col("rv")]).collect()
    assert len(out) == 1 and out[0].rv == 10


def test_array_join_inner_and_left(spark):
    df = spark.createDataFrame([(1, [10, 20]), (2, [])], "id int, xs array<int>")
    inner = array_join(df, ["xs"]).collect()
    assert {(r.id, r.xs) for r in inner} == {(1, 10), (1, 20)}
    left = array_join(df, ["xs"], left=True).collect()
    assert {(r.id, r.xs) for r in left} == {(1, 10), (1, 20), (2, None)}


def test_array_join_parallel_arrays(spark):
    df = spark.createDataFrame([(1, [1, 2], ["a", "b"])],
                               "id int, xs array<int>, ys array<string>")
    out = array_join(df, ["xs", "ys"], with_position=True).collect()
    assert {(r.pos, r.xs, r.ys) for r in out} == {(0, 1, "a"), (1, 2, "b")}


def test_paste_join(spark):
    l = spark.createDataFrame([("a",), ("b",)], "x string")
    r = spark.createDataFrame([(2,), (1,)], "y int")
    out = paste_join(l, r, left_order=["x"], right_order=["y"]).collect()
    assert {(row.x, row.y) for row in out} == {("a", 1), ("b", 2)}
