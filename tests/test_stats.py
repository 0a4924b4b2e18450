"""Statistical aggregates: LTTB contract + spot checks vs numpy."""

import numpy as np

from pyspark.sql import functions as F

from clickhouse_core_spark.operators import (
    largest_triangle_three_buckets, simple_linear_regression, sessionize,
)


def test_lttb_keeps_endpoints_and_bucket_count(spark):
    xs = list(range(100))
    ys = [float(x % 7) for x in xs]
    ys[50] = 100.0  # a spike that must survive downsampling
    df = spark.createDataFrame([(1, float(x), y) for x, y in zip(xs, ys)],
                               "k int, x double, y double")
    out = largest_triangle_three_buckets(df, ["k"], "x", "y", n_buckets=10)
    pts = sorted((r["x"], r["y"]) for r in out.collect())
    assert len(pts) == 10
    assert pts[0][0] == 0.0 and pts[-1][0] == 99.0  # endpoints kept
    assert any(y == 100.0 for _, y in pts)          # spike kept


def test_linreg_matches_numpy(spark):
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 10, 200)
    y = 3.5 * x + 2.0 + rng.normal(0, 0.1, 200)
    df = spark.createDataFrame([(1, float(a), float(b)) for a, b in zip(x, y)],
                               "g int, x double, y double")
    row = simple_linear_regression(df, ["g"], "x", "y").collect()[0]
    k_np, b_np = np.polyfit(x, y, 1)
    assert abs(row["k"] - k_np) < 1e-6
    assert abs(row["b"] - b_np) < 1e-6


def test_sessionize_gap_breaks(spark):
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0), (1, t0 + dt.timedelta(minutes=5)),
            (1, t0 + dt.timedelta(hours=2)),       # new session
            (1, t0 + dt.timedelta(hours=2, minutes=10)),
            (2, t0)]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = sessionize(df, ["user_id"], "ts", gap="30 minutes")
    sessions = sorted((r["user_id"], r["ts"], r["session_id"]) for r in out.collect())
    assert [s[2] for s in sessions if s[0] == 1] == [0, 0, 1, 1]
    assert [s[2] for s in sessions if s[0] == 2] == [0]
