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


def test_ks_two_sample_matches_scipy_formula(spark):
    rng = np.random.RandomState(1)
    a = rng.normal(0, 1, 80)
    b = rng.normal(0.5, 1.2, 60)
    rows = ([(1, float(v), 0) for v in a] + [(1, float(v), 1) for v in b])
    df = spark.createDataFrame(rows, "k int, v double, g int")
    from clickhouse_core_spark.operators import kolmogorov_smirnov
    row = kolmogorov_smirnov(df, ["k"], "v", "g").collect()[0]
    # manual two-sample D over the pooled support
    pooled = np.sort(np.concatenate([a, b]))
    ecdf_a = np.searchsorted(np.sort(a), pooled, side="right") / len(a)
    ecdf_b = np.searchsorted(np.sort(b), pooled, side="right") / len(b)
    d_ref = np.max(np.abs(ecdf_a - ecdf_b))
    assert abs(row["d_stat"] - d_ref) < 1e-12
    assert (row["n0"], row["n1"]) == (80, 60)


def test_mean_z_test_formula(spark):
    rows = [(1, 10.0, 0), (1, 12.0, 0), (1, 14.0, 0),
            (1, 20.0, 1), (1, 22.0, 1)]
    df = spark.createDataFrame(rows, "k int, v double, g int")
    from clickhouse_core_spark.operators import mean_z_test
    row = mean_z_test(df, ["k"], "v", "g", 4.0, 9.0).collect()[0]
    import math
    z_ref = (12.0 - 21.0) / math.sqrt(4.0 / 3 + 9.0 / 2)
    assert abs(row["z_stat"] - z_ref) < 1e-12


def test_cramers_v_perfect_association(spark):
    # b is a function of a -> V == 1; independent uniform -> V == 0
    rows = [(x, "a" if x % 2 == 0 else "b", "x" if x % 2 == 0 else "y")
            for x in range(40)]
    df = spark.createDataFrame(rows, "i int, a string, b string")
    from clickhouse_core_spark.operators import cramers_v, theils_u
    assert abs(cramers_v(df, "a", "b").collect()[0]["cramers_v"] - 1.0) < 1e-12
    assert abs(theils_u(df, "a", "b").collect()[0]["theils_u"] - 1.0) < 1e-12
    rows_ind = [(x, "a" if x % 2 == 0 else "b", "x" if (x // 2) % 2 == 0 else "y")
                for x in range(40)]
    df_ind = spark.createDataFrame(rows_ind, "i int, a string, b string")
    assert abs(cramers_v(df_ind, "a", "b").collect()[0]["cramers_v"]) < 1e-12
    assert abs(theils_u(df_ind, "a", "b").collect()[0]["theils_u"]) < 1e-12


def test_rank_corr_spearman(spark):
    rng = np.random.RandomState(2)
    x = rng.uniform(0, 1, 100)
    y = x ** 3 + rng.normal(0, 0.01, 100)  # monotone -> spearman ~ 1
    df = spark.createDataFrame([(1, float(a), float(b)) for a, b in zip(x, y)],
                               "k int, x double, y double")
    from clickhouse_core_spark.operators import rank_corr
    r = rank_corr(df, ["k"], "x", "y").collect()[0]["rank_corr"]
    # numpy spearman via rank-pearson
    def ranks(v):
        order = np.argsort(v)
        rk = np.empty(len(v)); rk[order] = np.arange(1, len(v) + 1)
        return rk
    r_ref = np.corrcoef(ranks(x), ranks(y))[0, 1]
    assert abs(r - r_ref) < 1e-9


def test_roc_auc_matches_sklearn_formula(spark):
    rng = np.random.RandomState(3)
    scores = rng.uniform(0, 1, 200)
    labels = (scores + rng.normal(0, 0.3, 200)) > 0.5
    df = spark.createDataFrame(
        [(1, float(s), bool(l)) for s, l in zip(scores, labels)],
        "k int, s double, l boolean")
    from clickhouse_core_spark.operators import roc_auc
    auc = roc_auc(df, ["k"], "s", "l").collect()[0]["auc"]
    # reference AUC via pairwise comparison (n small enough)
    pos = scores[labels]; neg = scores[~labels]
    wins = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg)
    assert abs(auc - wins / (len(pos) * len(neg))) < 1e-12


def test_gradient_linreg_converges_to_closed_form(spark):
    # well-conditioned synthetic y = 3*x1 - 2*x2 + 5 + 0: GD must
    # approach the exact coefficients
    import random
    from clickhouse_core_spark.operators.stats import gradient_linear_regression
    rnd = random.Random(2)
    rows = []
    for _ in range(500):
        x1, x2 = rnd.uniform(0, 10), rnd.uniform(0, 10)
        rows.append((x1, x2, 3.0 * x1 - 2.0 * x2 + 5.0))
    df = spark.createDataFrame(rows, "f1 double, f2 double, y double")
    r = gradient_linear_regression(df, ["f1", "f2"], "y",
                                   learning_rate=0.3, iterations=60).first()
    assert abs(r.raw_w0 - 3.0) < 0.05
    assert abs(r.raw_w1 + 2.0) < 0.05
    assert abs(r.raw_bias - 5.0) < 0.3


def test_gradient_logreg_learns_separator(spark):
    # x1 > 0 => label 1: a separable problem; weight on x1 must be
    # strongly positive after training
    import random
    from clickhouse_core_spark.operators.stats import (
        gradient_logistic_regression)
    rnd = random.Random(4)
    rows = [(x, rnd.uniform(-1, 1), 1.0 if x > 0 else 0.0)
            for x in (rnd.uniform(-5, 5) for _ in range(400))]
    df = spark.createDataFrame(rows, "f1 double, f2 double, y double")
    r = gradient_logistic_regression(df, ["f1", "f2"], "y",
                                     learning_rate=1.0, iterations=40).first()
    assert r.w0 > 1.0          # decisive weight on the separating axis
    assert abs(r.w1) < 0.5     # noise axis stays small


def test_eval_ml_method_roundtrip(spark):
    # train on an exact linear relation, then evalMLMethod must recover it
    import pyspark.sql.functions as F
    from clickhouse_core_spark.operators.stats import (
        eval_ml_method, gradient_linear_regression)
    df = spark.createDataFrame(
        [(float(i), float(2 * i + 3)) for i in range(50)], "x double, y double")
    w = gradient_linear_regression(df, ["x"], "y", learning_rate=0.5,
                                   iterations=60).first()
    pred = df.withColumn("p", eval_ml_method(
        [w.raw_w0], w.raw_bias, ["x"])).select(
        F.max(F.abs(F.col("p") - F.col("y"))).alias("err")).first().err
    assert pred < 0.05
    # logistic shape: output in (0, 1)
    probs = df.withColumn("p", eval_ml_method(
        [w.raw_w0], w.raw_bias, ["x"], kind="logistic")).select("p").collect()
    assert all(0.0 <= r.p <= 1.0 for r in probs)
