"""Array/map long-tail (functions/collections_ext.py): fill/split
folds, set ops, deterministic shuffle, normalized Gini, map HOFs,
bitmask decompositions."""

import pytest
from pyspark.sql import functions as F

from clickhouse_core_spark.functions.registry import ch
from clickhouse_core_spark.plans.frontend import translate_ch_sql


def test_fill_and_split(spark):
    df = spark.createDataFrame([([1, 2, 0, 0, 5, 0],), ([],), ([0, 3],)],
                               "a array<int>")
    rows = df.select(
        ch.arrayFill(lambda x: x != 0, F.col("a")).alias("fill"),
        ch.arrayReverseFill(lambda x: x != 0, F.col("a")).alias("rfill"),
        ch.arraySplit(lambda x: x == 0, F.col("a")).alias("sp"),
        ch.arrayReverseSplit(lambda x: x == 0, F.col("a")).alias("rsp"),
    ).collect()
    assert rows[0].fill == [1, 2, 2, 2, 5, 5]
    assert rows[0].rfill == [1, 2, 5, 5, 5, 0]   # last kept as-is
    assert rows[0].sp == [[1, 2], [0], [0, 5], [0]]
    assert rows[0].rsp == [[1, 2, 0], [0], [5, 0]]
    assert rows[1].fill == [] and rows[1].sp == [[]]
    # first element always kept even when predicate false
    assert rows[2].fill == [0, 3]


def test_set_ops_and_shuffle(spark):
    df = spark.createDataFrame([([1, 2, 0, 5],)], "a array<int>")
    r = df.select(
        F.array_sort(ch.arrayUnion(
            F.col("a"), F.array(F.lit(7), F.lit(1)))).alias("un"),
        F.array_sort(ch.arraySymmetricDifference(
            F.col("a"), F.array(F.lit(1), F.lit(2)))).alias("sd"),
        ch.arrayShuffle(F.col("a"), 42).alias("s1"),
        ch.arrayShuffle(F.col("a"), 42).alias("s2"),
        ch.arrayShuffle(F.col("a"), 43).alias("s3"),
    ).collect()[0]
    assert r.un == [0, 1, 2, 5, 7]
    assert r.sd == [0, 5]
    assert sorted(r.s1) == [0, 1, 2, 5]
    assert r.s1 == r.s2                  # same seed -> same permutation
    assert sorted(r.s3) == [0, 1, 2, 5]


def test_normalized_gini_reference_formula(spark):
    # hand-computed from calculateNormalizedGini
    # (arrayNormalizedGini.cpp): preds [.9,.3,.8,.75],
    # labels [12,10,8,1], total=31
    df = spark.createDataFrame(
        [([0.9, 0.3, 0.8, 0.75], [12.0, 10.0, 8.0, 1.0])],
        "p array<double>, l array<double>")
    g = df.select(ch.arrayNormalizedGini(
        F.col("p"), F.col("l")).alias("g")).collect()[0].g
    assert g.col1 == pytest.approx(0.052419354838, abs=1e-9)
    assert g.col2 == pytest.approx(0.141129032258, abs=1e-9)
    assert g.col3 == pytest.approx(g.col1 / g.col2, abs=1e-12)


def test_map_hofs(spark):
    df = spark.createDataFrame([({"a": 1, "b": 5},)], "m map<string,int>")
    r = df.select(
        ch.mapApply(lambda k, v: F.struct(F.upper(k), v * 2),
                    F.col("m")).alias("ap"),
        ch.mapExists(lambda k, v: v > 4, F.col("m")).alias("ex"),
        ch.mapAll(lambda k, v: v > 4, F.col("m")).alias("al"),
        ch.mapContainsValue(F.col("m"), 5).alias("cv"),
        ch.mapContainsValueLike(
            F.col("m").cast("map<string,string>"), "5%").alias("cvl"),
        ch.mapExtractValueLike(
            F.col("m").cast("map<string,string>"), "5%").alias("evl"),
    ).collect()[0]
    assert r.ap == {"A": 2, "B": 10}
    assert r.ex == 1 and r.al == 0
    assert r.cv == 1 and r.cvl == 1
    assert r.evl == {"b": "5"}


def test_bitmask_decompositions(spark):
    rows = spark.createDataFrame([(50,), (0,), (-1,)], "x long").select(
        "x",
        ch.bitPositionsToArray(F.col("x")).alias("bp"),
        ch.bitmaskToArray(F.col("x")).alias("bm"),
        ch.bitmaskToList(F.col("x")).alias("bl"),
    ).orderBy("x").collect()
    by_x = {r.x: r for r in rows}
    assert by_x[50].bp == [1, 4, 5]
    assert by_x[50].bm == [2, 16, 32]
    assert by_x[50].bl == "2,16,32"
    assert by_x[0].bp == [] and by_x[0].bl == ""
    assert len(by_x[-1].bm) == 64 and by_x[-1].bm[-1] == -(2 ** 63)


def test_sql_frontend_collection_rules(spark):
    df = spark.sql("SELECT array(1, 2, 0, 0, 5, 0) AS a")
    df.createOrReplaceTempView("cx")
    from clickhouse_core_spark.plans.frontend import ch_sql
    out = ch_sql(spark, """
        SELECT arrayFill(x -> x != 0, a) AS f,
               arraySplit(x -> x = 0, a) AS sp,
               arrayUnion(a, [7, 1]) AS un,
               mapExists((k, v) -> v > 1, map('x', 2)) AS me,
               bitmaskToList(50) AS bl
        FROM cx
    """).collect()[0]
    assert out.f == [1, 2, 2, 2, 5, 5]
    assert out.sp == [[1, 2], [0], [0, 5], [0]]
    assert sorted(out.un) == [0, 1, 2, 5, 7]
    assert out.me == 1
    assert out.bl == "2,16,32"
