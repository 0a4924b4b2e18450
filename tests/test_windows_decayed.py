"""exponentialTimeDecayed* window family vs a direct python reference."""

import math

from pyspark.sql import Window, functions as F

from clickhouse_core_spark.operators.windows import (
    exponential_time_decayed_sum, exponential_time_decayed_avg,
)


def test_decayed_sum_matches_python(spark):
    rows = [(1, 0.0, 10.0), (1, 1800.0, 20.0), (1, 3600.0, 30.0),
            (2, 0.0, 5.0)]
    df = spark.createDataFrame(rows, "k int, t double, v double")
    w = Window.partitionBy("k").orderBy("t")
    out = df.select("k", "t",
                    exponential_time_decayed_sum("v", "t", 3600.0, w).alias("d")) \
        .collect()
    got = {(r["k"], r["t"]): r["d"] for r in out}

    def ref(k, ti):
        return sum(v * math.exp(-(ti - tj) / 3600.0)
                   for kk, tj, v in rows if kk == k and tj <= ti)

    for (k, t), d in got.items():
        assert abs(d - ref(k, t)) < 1e-9


def test_decayed_avg_bounded_by_values(spark):
    rows = [(1, float(i * 600), float(i % 5)) for i in range(50)]
    df = spark.createDataFrame(rows, "k int, t double, v double")
    w = Window.partitionBy("k").orderBy("t")
    out = df.select(exponential_time_decayed_avg("v", "t", 1800.0, w).alias("a")).collect()
    assert all(0.0 <= r["a"] <= 4.0 for r in out)


def test_decayed_table_stable_over_long_spans(spark):
    # regression: the rebased-weight window form overflows (-> NaN) once
    # the partition spans >> 700 * decay; the fold recurrence must not
    import math
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, i, t0 + dt.timedelta(days=10 * i), 1.0) for i in range(5)]
    df = spark.createDataFrame(rows, "k int, i int, ts timestamp, v double")
    from clickhouse_core_spark.operators.windows import (
        exponential_time_decayed_table)
    out = {r["i"]: (r["dsum"], r["davg"])
           for r in exponential_time_decayed_table(
               df, ["k"], "ts", "v", 3600.0, tiebreak=["i"]).collect()}
    # 10 days = 240 decay constants: prior mass fully decayed, no NaN
    for i in range(5):
        assert not math.isnan(out[i][0])
        assert abs(out[i][0] - 1.0) < 1e-50
        assert abs(out[i][1] - 1.0) < 1e-9 or out[i][1] <= 1.0
    # short-gap check against the exact closed form
    rows2 = [(2, i, t0 + dt.timedelta(seconds=3600 * i), 1.0) for i in range(4)]
    df2 = spark.createDataFrame(rows2, "k int, i int, ts timestamp, v double")
    out2 = {r["i"]: r["dsum"] for r in exponential_time_decayed_table(
        df2, ["k"], "ts", "v", 3600.0, tiebreak=["i"]).collect()}
    expect = 0.0
    for i in range(4):
        expect = expect * math.exp(-1.0) + 1.0
        assert abs(out2[i] - expect) < 1e-9
