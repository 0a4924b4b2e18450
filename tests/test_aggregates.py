"""Operator tests: aggregation extensions (SURVEY §2.4) and
sorts/limits (§2.6)."""

from pyspark.sql import functions as F

from clickhouse_core_spark.operators import (
    limit_by, top_k, with_totals, group_array, histogram,
)
from clickhouse_core_spark.operators.aggregates import (
    limit_with_ties, sum_map, arg_min, arg_max,
)


def test_limit_by(spark):
    df = spark.createDataFrame([(1, 3), (1, 1), (1, 2), (2, 9)], "k int, v int")
    out = limit_by(df, ["k"], 2, order=[F.col("v")]).collect()
    assert sorted((r.k, r.v) for r in out) == [(1, 1), (1, 2), (2, 9)]


def test_limit_by_offset(spark):
    df = spark.createDataFrame([(1, 1), (1, 2), (1, 3)], "k int, v int")
    out = limit_by(df, ["k"], 1, order=[F.col("v")], offset=1).collect()
    assert [(r.k, r.v) for r in out] == [(1, 2)]


def test_limit_with_ties(spark):
    df = spark.createDataFrame([(1,), (1,), (2,), (3,)], "v int")
    out = limit_with_ties(df, 2, order=[F.col("v")]).collect()
    # rank()<=2 keeps both 1s (rank 1) and the 2 (rank 3 is > 2? no:
    # rank of 2 is 3) — WITH TIES keeps rows whose rank <= n
    assert sorted(r.v for r in out) == [1, 1]


def test_top_k(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (1, "c"), (1, "c"), (1, "c")], "g int, v string")
    out = top_k(df, ["g"], "v", 2).collect()
    assert out[0].topk == ["c", "a"]


def test_with_totals(spark):
    df = spark.createDataFrame([("x", 1), ("x", 2), ("y", 3)], "k string, v int")
    out = with_totals(df, ["k"], [F.sum("v").alias("s")]).collect()
    rows = {(r.k, r.s, r["__totals"]) for r in out}
    assert rows == {("x", 3, False), ("y", 3, False), (None, 6, True)}


def test_group_array_sorted(spark):
    df = spark.createDataFrame([(1, 3), (1, 1), (1, 2)], "k int, v int")
    out = group_array(df, ["k"], "v", order=[F.col("v").desc()]).collect()
    assert out[0].group_array == [3, 2, 1]
    capped = group_array(df, ["k"], "v", order=[F.col("v")], max_size=2).collect()
    assert capped[0].group_array == [1, 2]


def test_histogram(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    out = {r.bucket: r.cnt for r in histogram(df, "v", 10, 0.0, 100.0).collect()}
    assert out[1] == 10 and out[10] == 10


def test_sum_map(spark):
    df = spark.createDataFrame(
        [(1, {"a": 1, "b": 2}), (1, {"b": 3})], "k int, m map<string,int>")
    out = sum_map(df, ["k"], "m").collect()
    assert out[0].sum_map == {"a": 1, "b": 5}


def test_arg_min_max(spark):
    df = spark.createDataFrame([("x", 1, 10.0), ("y", 2, 5.0)], "n string, a int, b double")
    row = df.agg(arg_min("n", "b").alias("lo"), arg_max("n", "b").alias("hi")).first()
    assert row.lo == "y" and row.hi == "x"


def test_top_k_weighted(spark):
    rows = [("a", 1.0), ("a", 1.0), ("b", 5.0), ("c", 3.0)]
    df = spark.createDataFrame(rows, "v string, w double")
    from clickhouse_core_spark.operators import top_k_weighted
    out = top_k_weighted(df, [], "v", "w", 2).collect()[0]["topk"]
    assert out == ["b", "c"]  # weights: b=5, c=3, a=2


def test_bitmap_cardinalities(spark):
    # group g1: {1,2,3}, g2: {2,3,4}, g3: {3,4,5}
    rows = [("g1", v) for v in (1, 2, 3)] + [("g2", v) for v in (2, 3, 4)] \
        + [("g3", v) for v in (3, 4, 5)]
    df = spark.createDataFrame(rows, "g string, v int")
    from clickhouse_core_spark.operators import bitmap_cardinalities
    r = bitmap_cardinalities(df, "g", "v").collect()[0]
    assert r["and_card"] == 1      # only 3 in all
    assert r["or_card"] == 5       # 1..5
    assert r["xor_card"] == 3      # 1,3,5 appear odd # of times
