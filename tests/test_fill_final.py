"""Operator tests: WITH FILL (§2.6) and FINAL engine rewrites (§4.3)."""

from pyspark.sql import functions as F

from clickhouse_core_spark.operators import (
    with_fill, replacing_final, summing_final, collapsing_final,
    versioned_collapsing_final,
)


def test_with_fill_numeric(spark):
    df = spark.createDataFrame([(1, 10.0), (4, 40.0)], "x int, v double")
    out = with_fill(df, "x", step=1).collect()
    assert [r.x for r in out] == [1, 2, 3, 4]
    assert [r.v for r in out] == [10.0, None, None, 40.0]


def test_with_fill_bounds_and_interpolate(spark):
    df = spark.createDataFrame([(2, 20.0), (5, 50.0)], "x int, v double")
    out = with_fill(df, "x", step=1, from_val=1, to_val=6,
                    interpolate={"v": "prev"}).collect()
    assert [r.x for r in out] == [1, 2, 3, 4, 5, 6]
    assert [r.v for r in out] == [None, 20.0, 20.0, 20.0, 50.0, 50.0]


def test_with_fill_partitioned(spark):
    df = spark.createDataFrame([("a", 1, 1.0), ("a", 3, 3.0), ("b", 7, 7.0)],
                               "g string, x int, v double")
    out = with_fill(df, "x", step=1, partition=["g"]).collect()
    a = [(r.x, r.v) for r in out if r.g == "a"]
    b = [(r.x, r.v) for r in out if r.g == "b"]
    assert a == [(1, 1.0), (2, None), (3, 3.0)] and b == [(7, 7.0)]


def test_replacing_final(spark):
    df = spark.createDataFrame(
        [(1, 1, "old"), (1, 2, "new"), (2, 5, "only")], "k int, ver int, s string")
    out = replacing_final(df, ["k"], version="ver").collect()
    assert {(r.k, r.s) for r in out} == {(1, "new"), (2, "only")}


def test_summing_final(spark):
    df = spark.createDataFrame(
        [(1, 10, "x"), (1, 5, "y"), (2, 1, "z")], "k int, v int, tag string")
    out = summing_final(df, ["k"]).collect()
    got = {(r.k, r.v) for r in out}
    assert got == {(1, 15), (2, 1)}


def test_collapsing_final(spark):
    # key 1: state +1 then cancel -1 then new state +1 -> survives with last value
    # key 2: state +1 cancelled -> gone
    df = spark.createDataFrame(
        [(1, 1, 1, 100.0), (1, 2, -1, 100.0), (1, 3, 1, 200.0),
         (2, 4, 1, 50.0), (2, 5, -1, 50.0)],
        "k int, seq int, sign int, v double")
    out = collapsing_final(df, ["k"], sign="sign", order_col="seq").collect()
    assert {(r.k, r.v) for r in out} == {(1, 200.0)}


def test_versioned_collapsing_final(spark):
    df = spark.createDataFrame(
        [(1, 1, 1, 10.0), (1, 1, -1, 10.0), (1, 2, 1, 20.0)],
        "k int, ver int, sign int, v double")
    out = versioned_collapsing_final(df, ["k"], sign="sign", version="ver").collect()
    assert [(r.k, r.ver, r.v) for r in out] == [(1, 2, 20.0)]


def test_coalescing_final(spark):
    from clickhouse_core_spark.operators import coalescing_final
    df = spark.createDataFrame(
        [(1, 1, None, "x"), (1, 2, 5, None), (2, 1, 7, "y")],
        "k int, ver int, a int, b string")
    rows = {r["k"]: (r["a"], r["b"])
            for r in coalescing_final(df, ["k"], order_col="ver").collect()}
    # per column: latest NON-NULL wins (partial-row upserts coalesce)
    assert rows == {1: (5, "x"), 2: (7, "y")}


def test_graphite_rollup(spark):
    import datetime as dt
    from clickhouse_core_spark.operators import graphite_rollup
    t0 = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    now = t0 + 40 * 86400
    rows = []
    # recent rows (age < 30d): keep hourly buckets; old rows: daily
    for i in range(4):
        rows.append(("cpu", t0 + 39 * 86400 + i * 1800, float(i), 1))  # recent
        rows.append(("cpu", t0 + i * 1800, float(i), 1))               # old
    df = spark.createDataFrame(rows, "path string, time long, value double, ver int")
    out = graphite_rollup(df, retentions=[(0, 3600), (30 * 86400, 86400)],
                          now=now, version_col="ver")
    got = sorted((r["time_bucket"], r["value"]) for r in out.collect())
    old_day = [g for g in got if g[0] == t0]
    assert old_day == [(t0, 1.5)]          # 4 old rows -> one daily bucket, avg
    recent = [g for g in got if g[0] >= t0 + 39 * 86400]
    assert len(recent) == 2                # 2 hourly buckets of 2 rows each


def test_replacing_final_is_deleted(spark):
    from clickhouse_core_spark.operators import replacing_final
    df = spark.createDataFrame(
        [(1, 1, 0, "a"), (1, 2, 1, "a2"),     # latest is a tombstone
         (2, 1, 0, "b"), (2, 2, 0, "b2"),     # latest survives
         (3, 1, 1, "c"), (3, 2, 0, "c2")],    # older tombstone ignored
        "k int, ver int, is_deleted int, v string")
    rows = {r.k: r.v for r in replacing_final(
        df, ["k"], version="ver", is_deleted="is_deleted").collect()}
    assert rows == {2: "b2", 3: "c2"}          # key 1 dropped
