"""Bitmap state algebra (reference
src/AggregateFunctions/AggregateFunctionGroupBitmap.cpp,
src/Functions/FunctionsBitmap.cpp): states are sorted array<long>."""

import pytest
from pyspark.sql import functions as F

from clickhouse_core_spark.operators import (
    bitmap_build, group_bitmap_state, bitmap_and, bitmap_or, bitmap_xor,
    bitmap_andnot, bitmap_cardinality, bitmap_and_cardinality,
    bitmap_or_cardinality, bitmap_xor_cardinality,
    bitmap_andnot_cardinality, bitmap_contains, bitmap_has_any,
    bitmap_has_all, bitmap_min, bitmap_max, bitmap_subset_in_range,
    bitmap_subset_limit, sub_bitmap, group_bitmap_and, group_bitmap_or,
    group_bitmap_xor,
)


@pytest.fixture(scope="module")
def pair_df(spark):
    return spark.createDataFrame(
        [([1, 2, 3, 4, 3], [3, 4, 5])], "a array<bigint>, b array<bigint>"
    ).select(bitmap_build("a").alias("a"), bitmap_build("b").alias("b"))


def test_build_dedups_and_sorts(spark):
    row = spark.createDataFrame([([5, 1, 5, 2],)], "x array<bigint>") \
        .select(bitmap_build("x").alias("bm")).first()
    assert row.bm == [1, 2, 5]


def test_binary_algebra(pair_df):
    row = pair_df.select(
        bitmap_and("a", "b").alias("and_"),
        bitmap_or("a", "b").alias("or_"),
        bitmap_xor("a", "b").alias("xor_"),
        bitmap_andnot("a", "b").alias("andnot_")).first()
    assert row.and_ == [3, 4]
    assert row.or_ == [1, 2, 3, 4, 5]
    assert row.xor_ == [1, 2, 5]
    assert row.andnot_ == [1, 2]


def test_cardinalities(pair_df):
    row = pair_df.select(
        bitmap_cardinality("a").alias("ca"),
        bitmap_and_cardinality("a", "b").alias("cand"),
        bitmap_or_cardinality("a", "b").alias("cor"),
        bitmap_xor_cardinality("a", "b").alias("cxor"),
        bitmap_andnot_cardinality("a", "b").alias("cnot")).first()
    assert (row.ca, row.cand, row.cor, row.cxor, row.cnot) == (4, 2, 5, 3, 2)


def test_membership_minmax(pair_df):
    row = pair_df.select(
        bitmap_contains("a", 3).alias("c3"),
        bitmap_contains("a", 9).alias("c9"),
        bitmap_has_any("a", "b").alias("any_"),
        bitmap_has_all("a", "b").alias("all_"),
        bitmap_has_all("a", F.array(F.lit(1).cast("long"),
                                    F.lit(4).cast("long"))).alias("all14"),
        bitmap_min("a").alias("mn"), bitmap_max("a").alias("mx")).first()
    assert (row.c3, row.c9, row.any_, row.all_, row.all14) == (
        True, False, True, False, True)
    assert (row.mn, row.mx) == (1, 4)


def test_subsets(pair_df):
    row = pair_df.select(
        bitmap_subset_in_range("a", 2, 4).alias("rng"),
        bitmap_subset_limit("a", 2, 2).alias("lim"),
        sub_bitmap("a", 1, 2).alias("sub")).first()
    assert row.rng == [2, 3]          # [2, 4) half-open
    assert row.lim == [2, 3]          # two members >= 2
    assert row.sub == [2, 3]          # offset 1, two members


def test_group_state_and_merges(spark):
    df = spark.createDataFrame(
        [("g1", "s1", 1), ("g1", "s1", 2), ("g1", "s2", 2), ("g1", "s2", 3),
         ("g2", "s1", 7)],
        "g string, s string, v int")
    states = group_bitmap_state(df, ["g", "s"], "v")
    got = {(r.g, r.s): r.bm for r in states.collect()}
    assert got[("g1", "s1")] == [1, 2]
    assert got[("g1", "s2")] == [2, 3]
    merged_and = {r.g: r.bm_and
                  for r in group_bitmap_and(states, ["g"], "bm").collect()}
    merged_or = {r.g: r.bm_or
                 for r in group_bitmap_or(states, ["g"], "bm").collect()}
    merged_xor = {r.g: r.bm_xor
                  for r in group_bitmap_xor(states, ["g"], "bm").collect()}
    assert merged_and["g1"] == [2] and merged_and["g2"] == [7]
    assert merged_or["g1"] == [1, 2, 3]
    assert merged_xor["g1"] == [1, 3]   # 2 appears in both states


def test_merge_plan_is_single_aggregate(spark):
    """The state merge is one groupBy over already-built states — no
    join, no extra shuffle beyond the aggregation exchange."""
    df = spark.createDataFrame([("g", "s", 1)], "g string, s string, v int")
    states = group_bitmap_state(df, ["g", "s"], "v")
    plan = group_bitmap_or(states, ["g"], "bm")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Join" not in plan
