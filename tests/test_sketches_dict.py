"""Sketch states (-State/-Merge analog), dictionary lookups, range join."""

from pyspark.sql import functions as F

from clickhouse_core_spark.operators import (
    Dictionary, merge_states, range_join, rollup_states,
    uniq_state, uniq_merge,
)


def test_state_merge_matches_exact_ballpark(spark, catalog):
    o = catalog.orders
    day_states = rollup_states(
        o.withColumn("day", F.date_trunc("day", "o_orderdate")),
        ["day"], uniq_cols=["o_custkey"], quantile_cols=["o_totalprice"],
        sum_cols=["o_totalprice"])
    monthly = merge_states(
        day_states.withColumn("month", F.date_trunc("month", "day")),
        ["month"], quantiles=(0.5,))
    exact = (o.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
             .agg(F.countDistinct("o_custkey").alias("exact_uniq"),
                  F.sum("o_totalprice").alias("exact_sum"),
                  F.percentile("o_totalprice", 0.3).alias("exact_q30"),
                  F.percentile("o_totalprice", 0.7).alias("exact_q70")))
    j = {r["month"]: r for r in monthly.join(exact, "month").collect()}
    assert len(j) > 0
    for r in j.values():
        # HLL at lg_k=12: ~2% typical error
        assert abs(r["o_custkey_uniq"] - r["exact_uniq"]) <= max(3, 0.05 * r["exact_uniq"])
        assert abs(r["o_totalprice_sum"] - r["exact_sum"]) < 1e-6
        # KLL returns an actual data point; with small per-month samples
        # assert it lands inside the exact interquantile band
        assert r["exact_q30"] <= r["o_totalprice_q50"] <= r["exact_q70"]


def test_state_table_storable_roundtrip(spark, catalog, tmp_path):
    # the state column must survive a Parquet write/read (binary type)
    o = catalog.orders
    states = rollup_states(
        o.withColumn("day", F.date_trunc("day", "o_orderdate")),
        ["day"], uniq_cols=["o_custkey"])
    p = str(tmp_path / "states")
    states.write.parquet(p)
    back = spark.read.parquet(p)
    est = back.agg(uniq_merge("o_custkey__uniq_state").alias("u")).collect()[0]["u"]
    exact = o.select("o_custkey").distinct().count()
    assert abs(est - exact) <= max(3, 0.05 * exact)


def test_dictionary_get_with_default(spark):
    dim = spark.createDataFrame([(1, "one"), (2, "two")], "k int, name string")
    facts = spark.createDataFrame([(1,), (2,), (99,)], "fk int")
    d = Dictionary(dim, ["k"])
    out = d.get(facts, {"name": "label"}, on={"fk": "k"},
                defaults={"label": "unknown"})
    rows = {r["fk"]: r["label"] for r in out.collect()}
    assert rows == {1: "one", 2: "two", 99: "unknown"}
    flags = {r["fk"]: r["dict_has"]
             for r in d.has(facts, on={"fk": "k"}).collect()}
    assert flags == {1: 1, 2: 1, 99: 0}


def test_range_join_bucketed_equals_naive(spark):
    pts = spark.createDataFrame(
        [(1, 5.0, 100), (1, 14.9, 101), (1, 15.0, 102), (2, 5.0, 103)],
        "k int, p double, pid int")
    iv = spark.createDataFrame(
        [(1, 0.0, 15.0, 200), (1, 10.0, 40.0, 201), (2, 100.0, 200.0, 202)],
        "k int, s double, e double, ivid int")
    naive = range_join(pts, iv, "p", "s", "e", on=["k"])
    bucketed = range_join(pts, iv, "p", "s", "e", on=["k"], bucket_width=7.0)
    n = sorted((r["pid"], r["ivid"]) for r in naive.collect())
    b = sorted((r["pid"], r["ivid"]) for r in bucketed.collect())
    assert n == b
    assert (100, 200) in b and (102, 200) not in b  # half-open interval


def test_dictionary_hierarchy_and_is_in(spark):
    # 1 -> 10 -> 100 (root); 2 -> 10; 3 orphan (parent missing from dict)
    dim = spark.createDataFrame(
        [(1, 10), (2, 10), (10, 100), (100, None)], "k long, parent long")
    facts = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    d = Dictionary(dim, ["k"])
    out = d.get_hierarchy(facts, "k", "parent", out_col="h", max_depth=5)
    rows = {r["k"]: list(r["h"]) for r in out.collect()}
    assert rows == {1: [1, 10, 100], 2: [2, 10, 100], 3: [3]}
    flags = {r["k"]: r["dict_is_in"]
             for r in d.is_in(facts, "k", "parent", 10, max_depth=5).collect()}
    assert flags == {1: 1, 2: 1, 3: 0}


def test_dict_get_typed_and_or_null(spark):
    from clickhouse_core_spark.operators.dictionary import (
        Dictionary, DICT_GET_TYPES)
    dim = spark.createDataFrame(
        [(1, "42", "a"), (2, "77", "b")], "k int, v string, s string")
    d = Dictionary(dim, ["k"])
    df = spark.createDataFrame([(1,), (2,), (9,)], "k int")
    out = d.get_typed(df, "Int64", {"v": "vv"}).orderBy("k").collect()
    assert [r["vv"] for r in out] == [42, 77, None]
    assert dict(out[0].asDict())["vv"] == 42
    out2 = d.get_or_null(df, {"s": "sv"}).orderBy("k").collect()
    assert [r["sv"] for r in out2] == ["a", "b", None]
    # all reference-registered type names resolve to a Spark carrier
    for t in ("Int8", "UInt64", "Float32", "Date", "DateTime", "String",
              "UUID", "IPv4", "IPv6"):
        assert t in DICT_GET_TYPES


def test_dict_children_descendants(spark):
    from clickhouse_core_spark.operators.dictionary import Dictionary
    # 1 -> (2, 3); 2 -> (4,); 4 -> (5,)
    dim = spark.createDataFrame(
        [(2, 1), (3, 1), (4, 2), (5, 4), (1, None)], "k int, parent int")
    d = Dictionary(dim, ["k"])
    df = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    kids = {r["k"]: r["children"]
            for r in d.get_children(df, "k", "parent").collect()}
    assert kids == {1: [2, 3], 2: [4], 3: []}
    desc = {r["k"]: sorted(r["descendants"])
            for r in d.get_descendants(df, "k", "parent").collect()}
    assert desc == {1: [2, 3, 4, 5], 2: [4, 5], 3: []}


def test_merge_state_table_multilevel_rollup(spark):
    """hour->day->total state tree: merging states at a coarser key
    WITHOUT finalizing, then finishing once, equals finishing the
    fine-grained table directly (-MergeState contract)."""
    from clickhouse_core_spark.operators import (
        merge_state_table, merge_states, rollup_states)
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [(d, h, u, float(v)) for d in (1, 2) for h in (0, 1)
         for u, v in [(d * 10 + h, 1.0), (d * 10 + h + 1, 2.0), (99, 3.0)]],
        "day int, hour int, uid long, v double")
    fine = rollup_states(df, ["day", "hour"], uniq_cols=["uid"],
                         sum_cols=["v"])
    mid = merge_state_table(fine, ["day"])           # states stay states
    assert {f.name for f in mid.schema.fields} == \
        {"day", "uid__uniq_state", "v__sum", "v__cnt", "__rows"}
    via_tree = {r.day: (r.uid_uniq, r.v_sum)
                for r in merge_states(mid, ["day"]).collect()}
    direct = {r.day: (r.uid_uniq, r.v_sum)
              for r in merge_states(
                  rollup_states(df, ["day"], uniq_cols=["uid"],
                                sum_cols=["v"]), ["day"]).collect()}
    assert via_tree == direct


def test_agg_simple_state_is_plain_value(spark):
    from clickhouse_core_spark.operators import agg_simple_state
    from pyspark.sql import functions as F
    df = spark.createDataFrame([(1, 5.0), (1, 7.0)], "k int, v double")
    r = df.groupBy("k").agg(
        agg_simple_state(F.max, "v").alias("m")).first()
    assert r.m == 7.0
