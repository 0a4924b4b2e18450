"""Quantile variant edge cases: timing buckets, bfloat16 truncation,
deterministic reservoir, interpolated-weighted boundaries."""

import math

import pytest
from pyspark.sql import functions as F

from clickhouse_core_spark.operators import (
    quantile_timing,
    quantile_bfloat16,
    bfloat16_expr,
    quantile_deterministic,
    quantile_interpolated_weighted,
)


def _one(df, alias="q"):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0][alias]


def test_timing_small_exact(spark):
    # values < 1024 are counted exactly: median of 1..101 is 51
    df = spark.range(1, 102).select(F.lit("k").alias("k"),
                                    F.col("id").alias("v"))
    assert _one(quantile_timing(df, ["k"], "v", 0.5)) == 51


def test_timing_big_bucket_midpoint(spark):
    # 2000 falls in bucket floor((2000-1024)/16)=61 -> 1024+61*16+8 = 2008
    df = spark.createDataFrame([("k", 2000)] * 5, "k string, v int")
    assert _one(quantile_timing(df, ["k"], "v", 0.5)) == 1024 + 61 * 16 + 8


def test_timing_clamps_at_30000(spark):
    df = spark.createDataFrame([("k", 50_000), ("k", 99_999), ("k", 1)],
                               "k string, v int")
    assert _one(quantile_timing(df, ["k"], "v", 0.9)) == 30000


def test_bfloat16_truncation_values(spark):
    # 1.0 and powers of two are exact in bfloat16; 1/3 truncates to
    # 0.33203125 = 85/256 (7 mantissa bits, toward zero)
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (1.0 / 3.0,), (0.0,), (-1.0 / 3.0,)],
        "v double")
    out = {r["v"]: r["b"] for r in
           df.select("v", bfloat16_expr("v").alias("b")).collect()}
    assert out[1.0] == 1.0 and out[2.0] == 2.0 and out[0.0] == 0.0
    assert out[1.0 / 3.0] == pytest.approx(85 / 256, abs=0)
    assert out[-1.0 / 3.0] == pytest.approx(-85 / 256, abs=0)


def test_bfloat16_quantile_weighted(spark):
    df = spark.createDataFrame([("k", 1.0, 1), ("k", 2.0, 10)],
                               "k string, v double, w int")
    assert _one(quantile_bfloat16(df, ["k"], "v", 0.5, weight_col="w")) == 2.0


def test_deterministic_small_group_interpolates(spark):
    # n=4, level 0.5 -> index 1.5 -> midpoint of 2nd and 3rd
    df = spark.createDataFrame([("k", v, v) for v in [10, 20, 30, 40]],
                               "k string, v int, det int")
    assert _one(quantile_deterministic(df, ["k"], "v", "det", 0.5)) == 25.0


def test_deterministic_sampling_bound(spark):
    # with max_samples=2 only 2 rows survive; same determinator set ->
    # same sample -> stable result across runs
    df = spark.createDataFrame([("k", v, v) for v in range(100)],
                               "k string, v int, det int")
    a = _one(quantile_deterministic(df, ["k"], "v", "det", 0.5, max_samples=2))
    b = _one(quantile_deterministic(df, ["k"], "v", "det", 0.5, max_samples=2))
    assert a == b and not math.isnan(a)


def test_interp_weighted_uniform_matches_reference_formula(spark):
    # values 1..10, weight 1: x_i = (i - 0.5)/10; level 0.33 sits
    # between x_3=0.25 and x_4=0.35 -> 3 + (0.33-0.25)/0.1 = 3.8
    df = spark.createDataFrame([("k", v, 1) for v in range(1, 11)],
                               "k string, v int, w int")
    assert _one(quantile_interpolated_weighted(df, ["k"], "v", "w", 0.33)) \
        == pytest.approx(3.8)


def test_interp_weighted_flat_extrapolation(spark):
    df = spark.createDataFrame([("k", 5, 1), ("k", 7, 1)],
                               "k string, v int, w int")
    # level below x_0=0.25 -> first value; above x_1=0.75 -> last value
    assert _one(quantile_interpolated_weighted(df, ["k"], "v", "w", 0.01)) == 5.0
    assert _one(quantile_interpolated_weighted(df, ["k"], "v", "w", 0.99)) == 7.0


def test_interp_weighted_single_value(spark):
    df = spark.createDataFrame([("k", 42, 3)], "k string, v int, w int")
    assert _one(quantile_interpolated_weighted(df, ["k"], "v", "w", 0.5)) == 42.0


def test_quantile_exact_low_high_median(spark):
    from clickhouse_core_spark.operators.quantiles import (
        quantile_exact_high, quantile_exact_low)
    # even-size group: low takes the lower middle, high the upper
    df = spark.createDataFrame([(1, v) for v in [1.0, 2.0, 3.0, 4.0]],
                               "g int, x double")
    assert quantile_exact_low(df, ["g"], "x", 0.5).first().q == 2.0
    assert quantile_exact_high(df, ["g"], "x", 0.5).first().q == 3.0
    # odd size: both take the middle
    df3 = spark.createDataFrame([(1, v) for v in [1.0, 2.0, 9.0]],
                                "g int, x double")
    assert quantile_exact_low(df3, ["g"], "x", 0.5).first().q == 2.0
    assert quantile_exact_high(df3, ["g"], "x", 0.5).first().q == 2.0


def test_quantile_exact_exclusive_inclusive_excel(spark):
    import statistics
    from clickhouse_core_spark.operators.quantiles import (
        quantile_exact_exclusive, quantile_exact_inclusive)
    vals = [15.0, 20.0, 35.0, 40.0, 50.0]
    df = spark.createDataFrame([(1, v) for v in vals], "g int, x double")
    # PERCENTILE.EXC(0.4) over [15,20,35,40,50] = 26 (Excel doc example)
    assert quantile_exact_exclusive(df, ["g"], "x", 0.4).first().q == \
        pytest.approx(26.0)
    # PERCENTILE.INC == numpy linear / statistics.quantiles(inclusive)
    assert quantile_exact_inclusive(df, ["g"], "x", 0.25).first().q == \
        pytest.approx(sorted(vals)[1] * 0.0 + 20.0 + 0.0)  # h=2.0 -> 20


def test_quantile_timing_weighted(spark):
    from clickhouse_core_spark.operators.quantiles import quantile_timing
    # weight 3 on value 10 shifts the median to 10
    df = spark.createDataFrame([(1, 10.0, 3), (1, 500.0, 1)],
                               "g int, x double, w int")
    assert quantile_timing(df, ["g"], "x", 0.5, weight_col="w").first().q == 10


def test_exact_variants_match_statistics_module_across_sizes(spark):
    import random
    import statistics
    from clickhouse_core_spark.operators.quantiles import (
        quantile_exact_high, quantile_exact_inclusive, quantile_exact_low)
    rnd = random.Random(11)
    groups = {g: [round(rnd.uniform(0, 100), 3) for _ in range(g)]
              for g in range(1, 25)}
    rows = [(g, v) for g, vals in groups.items() for v in vals]
    df = spark.createDataFrame(rows, "g int, x double")

    lo = {r.g: r.q for r in quantile_exact_low(df, ["g"], "x", 0.5).collect()}
    hi = {r.g: r.q for r in quantile_exact_high(df, ["g"], "x", 0.5).collect()}
    inc = {r.g: r.q for r in
           quantile_exact_inclusive(df, ["g"], "x", 0.3).collect()}
    for g, vals in groups.items():
        assert lo[g] == statistics.median_low(vals), g
        assert hi[g] == statistics.median_high(vals), g
        if len(vals) >= 2:
            want = statistics.quantiles(vals, n=10, method="inclusive")[2]
            assert inc[g] == pytest.approx(want), g
