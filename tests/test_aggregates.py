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


def test_sparkbar(spark):
    from clickhouse_core_spark.operators import sparkbar
    rows = [("g", float(x), y) for x, y in
            [(0, 1), (1, 2), (2, 4), (3, 8), (5, 8)]]
    df = spark.createDataFrame(rows, "k string, x double, y long")
    out = sparkbar(df, ["k"], "x", "y", width=6, x_min=0.0, x_max=6.0).collect()
    # levels: ceil(8*v/8) -> 1,2,4,8,_,8 ; bucket 4 empty -> space
    assert out[0].bar == "▁▂▄█ █"


def test_group_array_insert_at(spark):
    from clickhouse_core_spark.operators import group_array_insert_at
    df = spark.createDataFrame(
        [("g", 0, 10), ("g", 2, 30), ("g", 2, 25), ("g", 9, 99)],
        "k string, pos int, v int")
    out = group_array_insert_at(df, ["k"], "v", "pos", size=4, default=0).collect()
    assert out[0].arr == [10, 0, 25, 0]  # dup pos -> min; out-of-range dropped


def test_group_array_sorted(spark):
    from clickhouse_core_spark.operators import group_array_sorted
    df = spark.createDataFrame([("g", v) for v in [5, 3, 9, 1, 7]],
                               "k string, v int")
    out = group_array_sorted(df, ["k"], "v", n=3).collect()
    assert out[0].arr == [1, 3, 5]


def test_group_array_intersect(spark):
    from clickhouse_core_spark.operators import group_array_intersect
    df = spark.createDataFrame(
        [("g", [1, 2, 3]), ("g", [2, 3, 4]), ("g", [3, 2, 9])],
        "k string, arr array<int>")
    out = group_array_intersect(df, ["k"], "arr").collect()
    assert out[0].arr == [2, 3]


def test_single_value_or_null_and_sum_count(spark):
    from clickhouse_core_spark.operators import single_value_or_null, sum_count
    df = spark.createDataFrame([("a", 1, 5), ("a", 1, 7), ("b", 2, 9)],
                               "k string, c int, v int")
    out = (df.groupBy("k")
           .agg(single_value_or_null("c").alias("sv"),
                sum_count("v").alias("sc"))
           .orderBy("k").collect())
    assert out[0].sv == 1 and out[0].sc == (12, 2)
    assert out[1].sv == 2 and out[1].sc == (9, 1)


def test_single_value_or_null_multivalued(spark):
    from clickhouse_core_spark.operators import single_value_or_null
    df = spark.createDataFrame([("a", 1), ("a", 2)], "k string, c int")
    out = df.groupBy("k").agg(single_value_or_null("c").alias("sv")).collect()
    assert out[0].sv is None


def test_any_heavy_mode_with_ties(spark):
    from clickhouse_core_spark.operators import any_heavy
    df = spark.createDataFrame(
        [("g", "x"), ("g", "y"), ("g", "y"), ("g", "z"), ("g", "z")],
        "k string, v string")
    out = any_heavy(df, ["k"], "v").collect()
    assert out[0].heavy == "y"  # tie between y and z -> smallest


def test_anova_known_value(spark):
    from clickhouse_core_spark.operators import anova
    # groups [1,2,3] and [4,5,6]: SSB=13.5, SSW=4, F = 13.5/(4/4) = 13.5
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0), ("b", 5.0), ("b", 6.0)],
        "g string, v double")
    out = anova(df, "g", "v").collect()
    assert abs(out[0].f_statistic - 13.5) < 1e-9


def test_contingency_bounds(spark):
    from clickhouse_core_spark.operators import contingency, cramers_v_bias_corrected
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 2), ("b", 2), ("a", 2), ("b", 1)],
        "x string, y int")
    c = contingency(df, "x", "y").collect()[0].contingency
    v = cramers_v_bias_corrected(df, "x", "y").collect()[0].cramers_v_bc
    assert 0.0 <= c <= 1.0 and 0.0 <= v <= 1.0


def test_group_array_last(spark):
    from clickhouse_core_spark.operators import group_array_last
    df = spark.createDataFrame(
        [("g", 1, "a"), ("g", 3, "c"), ("g", 2, "b"), ("h", 1, "x")],
        "k string, o int, v string")
    out = {r.k: r.arr for r in
           group_array_last(df, ["k"], "v", "o", n=2).collect()}
    assert out["g"] == ["b", "c"]  # last two by order, oldest-first
    assert out["h"] == ["x"]       # group smaller than n


def test_corr_matrix_identity_diagonal(spark):
    from clickhouse_core_spark.operators import corr_matrix
    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 4.0), (3.0, 5.9)], "x double, y double")
    m = corr_matrix(df, ["x", "y"]).collect()[0].corr_matrix
    assert abs(m[0][0] - 1.0) < 1e-9 and abs(m[1][1] - 1.0) < 1e-9
    assert abs(m[0][1] - m[1][0]) < 1e-12 and m[0][1] > 0.99


def test_quantile_exact_variants_known_values(spark):
    from clickhouse_core_spark.operators import quantile_exact
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    df = spark.createDataFrame([("g", v) for v in vals], "k string, v double")
    def q(level, variant):
        return quantile_exact(df, ["k"], "v", level, variant).collect()[0].q
    assert q(0.5, "low") == 3.0    # statistics.median_low
    assert q(0.5, "high") == 4.0   # statistics.median_high
    assert q(0.5, "exact") == 4.0  # arr[floor(0.5*6)] = arr[3] (0-based)
    # PERCENTILE.EXC(0.25): h = 0.25*7 = 1.75 -> 1 + 0.75*(2-1) = 1.75
    assert abs(q(0.25, "exclusive") - 1.75) < 1e-9
    # PERCENTILE.INC(0.25): h = 0.25*5+1 = 2.25 -> 2 + 0.25*(3-2) = 2.25
    assert abs(q(0.25, "inclusive") - 2.25) < 1e-9


def test_group_array_moving_sum_avg(spark):
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0 + dt.timedelta(minutes=i), float(v))
            for i, v in enumerate([1, 2, 3, 4])]
    df = spark.createDataFrame(rows, "k int, ts timestamp, v double")
    from clickhouse_core_spark.operators import (
        group_array_moving_sum, group_array_moving_avg)
    ms = group_array_moving_sum(df, ["k"], "v", "ts", window=2).collect()[0]["arr"]
    assert ms == [1.0, 3.0, 5.0, 7.0]
    ms_all = group_array_moving_sum(df, ["k"], "v", "ts").collect()[0]["arr"]
    assert ms_all == [1.0, 3.0, 6.0, 10.0]
    # reference divides by the window size even during warm-up
    ma = group_array_moving_avg(df, ["k"], "v", "ts", window=2).collect()[0]["arr"]
    assert ma == [0.5, 1.5, 2.5, 3.5]
    ma_all = group_array_moving_avg(df, ["k"], "v", "ts").collect()[0]["arr"]
    assert ma_all == [0.25, 0.75, 1.5, 2.5]


def test_group_concat(spark):
    from clickhouse_core_spark.operators import group_concat
    df = spark.createDataFrame(
        [("a", 3, "z"), ("a", 1, "x"), ("a", 2, "y"), ("b", 1, "q")],
        "g string, o int, v string")
    got = {r.g: r.gconcat
           for r in group_concat(df, ["g"], "v", ["o"], sep="-").collect()}
    assert got == {"a": "x-y-z", "b": "q"}
    got2 = {r.g: r.gconcat
            for r in group_concat(df, ["g"], "v", ["o"], sep="-", limit=2).collect()}
    assert got2["a"] == "x-y"


def test_sum_map_filtered(spark):
    from pyspark.sql import functions as F
    from clickhouse_core_spark.operators import sum_map_filtered
    df = spark.createDataFrame([(1, {"a": 1.0, "b": 2.0}),
                                (1, {"a": 3.0, "c": 9.0})],
                               "g int, m map<string,double>")
    row = sum_map_filtered(df, ["g"], "m", ["a", "b"], alias="sm").first()
    assert dict(row.sm) == {"a": 4.0, "b": 2.0}  # 'c' filtered out


def test_mapped_arrays(spark):
    from clickhouse_core_spark.operators import (
        max_mapped_arrays, min_mapped_arrays, sum_mapped_arrays)
    df = spark.createDataFrame(
        [(["x", "y"], [1.0, 10.0]), (["y", "z"], [20.0, 5.0])],
        "ks array<string>, vs array<double>")
    assert dict(sum_mapped_arrays(df, [], "ks", "vs").first().sum_map) == \
        {"x": 1.0, "y": 30.0, "z": 5.0}
    assert dict(min_mapped_arrays(df, [], "ks", "vs").first().min_map) == \
        {"x": 1.0, "y": 10.0, "z": 5.0}
    assert dict(max_mapped_arrays(df, [], "ks", "vs").first().max_map) == \
        {"x": 1.0, "y": 20.0, "z": 5.0}


def test_max_intersections_position(spark):
    from clickhouse_core_spark.operators import max_intersections_position
    # [1,5) [2,6) [3,7): depth 3 first attained at position 3
    df = spark.createDataFrame([(1, 1.0, 5.0), (1, 2.0, 6.0), (1, 3.0, 7.0),
                                (2, 0.0, 1.0)], "g int, s double, e double")
    got = {r.g: r.position for r in
           max_intersections_position(df, ["g"], "s", "e").collect()}
    assert got == {1: 3.0, 2: 0.0}


def test_sequence_match_events(spark):
    from pyspark.sql import functions as F
    from clickhouse_core_spark.operators import sequence_match_events
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:01", "A"), (1, "2024-01-01 00:00:02", "A"),
         (1, "2024-01-01 00:00:03", "B"), (1, "2024-01-01 00:00:04", "B"),
         (2, "2024-01-01 00:00:01", "B")],
        "g int, ts string, e string").withColumn("ts", F.to_timestamp("ts"))
    out = {r.g: list(r.match_events) for r in sequence_match_events(
        df, ["g"], "ts",
        [F.col("e") == "A", F.col("e") == "B"]).collect()}
    base = 1704067200_000000
    assert out[1] == [base + 1_000000, base + 3_000000]  # earliest chain
    assert out[2] == []


def test_distinct_json_paths(spark):
    from clickhouse_core_spark.operators import distinct_json_paths
    df = spark.createDataFrame(
        [('{"a": {"b": 1, "c": "x"}, "d": 2.5}',),
         ('{"a": {"b": 7}, "e": true, "f": null}',)], "j string")
    rows = distinct_json_paths(df, "j", with_types=True).collect()
    got = {(r.path, r.jtype) for r in rows}
    assert got == {("a.b", "Int64"), ("a.c", "String"), ("d", "Float64"),
                   ("e", "Bool"), ("f", "Null")}


def test_flame_graph_collapsed_stacks(spark):
    from clickhouse_core_spark.operators import flame_graph
    df = spark.createDataFrame(
        [(["main", "parse", "alloc"], 64),
         (["main", "parse", "alloc"], 32),
         (["main", "exec"], 16),
         (["main"], 8)],
        "trace array<string>, size int")
    got = sorted(r.line for r in
                 flame_graph(df, "trace", "size").collect())
    assert got == ["main 8", "main;exec 16", "main;parse;alloc 96"]
    # weightless form counts traces
    got = sorted(r.line for r in flame_graph(df, "trace").collect())
    assert got == ["main 1", "main;exec 1", "main;parse;alloc 2"]


def test_agg_throw_contract():
    import pytest
    from clickhouse_core_spark.operators import agg_throw
    with pytest.raises(ValueError, match="aggThrow"):
        agg_throw(1.0)
    assert agg_throw(0.0) is None
    with pytest.raises(NotImplementedError, match="random"):
        agg_throw(0.5)


def test_extremes_block(spark):
    from clickhouse_core_spark.operators import extremes
    df = spark.createDataFrame(
        [(1, 2.5, "a"), (7, -1.0, "b"), (4, 9.25, "c")],
        "n int, x double, s string")
    rows = extremes(df).collect()
    assert len(rows) == 2
    assert (rows[0].n, rows[0].x, rows[0].s) == (1, -1.0, None)
    assert (rows[1].n, rows[1].x, rows[1].s) == (7, 9.25, None)
