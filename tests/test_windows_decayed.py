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
