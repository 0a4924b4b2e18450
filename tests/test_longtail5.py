"""Round-5 scalar long tail (functions/longtail5.py)."""

import pytest

from pyspark.sql import functions as F

from clickhouse_core_spark.functions import ch


def test_porter_stem_vocabulary(spark):
    from clickhouse_core_spark.functions.longtail5 import porter_stem
    # canonical pairs from the published algorithm's step tables /
    # reference vocabulary (end-to-end outputs)
    for w, want in [("caresses", "caress"), ("ponies", "poni"),
                    ("hopping", "hop"), ("relational", "relat"),
                    ("rational", "ration"), ("electrical", "electr"),
                    ("adjustment", "adjust"), ("replacement", "replac"),
                    ("happy", "happi"), ("sky", "sky"),
                    ("vietnamization", "vietnam"), ("probate", "probat"),
                    ("controll", "control"), ("roll", "roll")]:
        assert porter_stem(w) == want, w
    df = spark.createDataFrame([("running",), ("flies",), (None,)],
                               "w string")
    got = [r.s for r in df.select(ch.stem("en", F.col("w"))
                                  .alias("s")).collect()]
    assert got == ["run", "fli", None]
    with pytest.raises(NotImplementedError, match="Snowball"):
        ch.stem("ru", F.col("w"))


def test_bfloat16_truncation(spark):
    import numpy as np
    df = spark.createDataFrame(
        [(1.0,), (3.14159265,), (65504.0,), (None,)], "x double")
    got = [r.b for r in df.select(ch.toBFloat16(F.col("x"))
                                  .alias("b")).collect()]
    def bf16(v):
        return float(np.float32(
            np.float32(v).view(np.uint32) & 0xFFFF0000).view(np.float32))
    f = np.float32(3.14159265)
    want = float((np.uint32(f.view(np.uint32)) & np.uint32(0xFFFF0000))
                 .astype(np.uint32).view(np.float32))
    assert got[0] == 1.0
    assert got[1] == pytest.approx(3.140625)   # bf16(pi)
    assert got[3] is None
    df2 = spark.createDataFrame([("2.5",), ("zz",)], "s string")
    z = [r.v for r in df2.select(ch.toBFloat16OrZero(F.col("s"))
                                 .alias("v")).collect()]
    n = [r.v for r in df2.select(ch.toBFloat16OrNull(F.col("s"))
                                 .alias("v")).collect()]
    assert z == [2.5, 0.0] and n == [2.5, None]


def test_datetime_components_and_uuid(spark):
    df = spark.range(1).select(
        F.lit("2024-03-05 07:08:09.123456").cast("timestamp").alias("t"))
    c = df.select(ch.toDateTimeComponents(F.col("t")).alias("c")).first().c
    assert (c.year, c.month, c.day, c.hour, c.minute, c.second,
            c.microsecond) == (2024, 3, 5, 7, 8, 9, 123456)
    # reference doc example: each 8-byte half is read little-endian
    # INDEPENDENTLY —
    # reinterpretAsUUID(reverse(unhex('000102030405060708090a0b0c0d0e0f')))
    # == '08090a0b-0c0d-0e0f-0001-020304050607'
    h = "000102030405060708090a0b0c0d0e0f"
    rev = "".join(h[i:i + 2] for i in range(30, -2, -2))
    df3 = spark.range(1).select(F.unhex(F.lit(rev)).alias("b"))
    u = df3.select(ch.reinterpretAsUUID(F.col("b")).alias("u")).first().u
    assert u == "08090a0b-0c0d-0e0f-0001-020304050607"


def test_tuple_of_intervals_and_case(spark):
    df = spark.range(1).select(F.lit("2024-01-15").cast("date").alias("d"))
    got = df.select(
        ch.addTupleOfIntervals(F.col("d"), [(1, "month"), (10, "day")])
        .alias("a"),
        ch.subtractTupleOfIntervals(F.col("d"), [(15, "day")])
        .alias("s")).first()
    assert str(got.a) == "2024-02-25 00:00:00" or str(got.a).startswith("2024-02-25")
    assert str(got.s).startswith("2023-12-31")
    df2 = spark.createDataFrame([(1,), (2,), (9,)], "x int")
    got = [r.c for r in df2.select(
        ch.caseWithExpression(F.col("x"), 1, "one", 2, "two", "many")
        .alias("c")).collect()]
    assert got == ["one", "two", "many"]


def test_fuzz_bits_and_random_string(spark):
    df = spark.createDataFrame([("hello world",)], "s string")
    a = df.select(ch.fuzzBits(F.col("s"), 0.5, seed=1).alias("f")).first().f
    b = df.select(ch.fuzzBits(F.col("s"), 0.5, seed=1).alias("f")).first().f
    c = df.select(ch.fuzzBits(F.col("s"), 0.5, seed=2).alias("f")).first().f
    assert a == b and a != c and len(a) == 11
    assert df.select(ch.fuzzBits(F.col("s"), 0.0).alias("f")).first().f \
        == "hello world"
    r1 = spark.range(1).select(ch.randomStringUTF8(12, seed=3)
                               .alias("r")).first().r
    r2 = spark.range(1).select(ch.randomStringUTF8(12, seed=3)
                               .alias("r")).first().r
    assert r1 == r2 and len(r1) == 12
    r1.encode("utf-8")  # valid UTF-8


def test_mergetree_part_info(spark):
    df = spark.createDataFrame(
        [("202401_1_5_2", "202401_1_10_3"),
         ("202402_1_5_2", "202401_1_10_3")], "a string, b string")
    rows = df.select(
        ch.mergeTreePartInfo(F.col("a")).alias("p"),
        ch.isMergeTreePartCoveredBy(F.col("a"), F.col("b")).alias("cov")
    ).collect()
    p = rows[0].p
    assert (p.partition_id, p.min_block, p.max_block, p.level) == \
        ("202401", 1, 5, 2)
    assert rows[0].cov is True        # same partition, contained
    assert rows[1].cov is False       # different partition


def test_initialize_finalize_aggregation(spark):
    df = spark.createDataFrame([(5.0,), (7.0,)], "v double")
    out = df.select(
        ch.initializeAggregation("sumState", F.col("v")).alias("s"),
        ch.initializeAggregation("countState", F.col("v")).alias("c"),
        ch.initializeAggregation("avgState", F.col("v")).alias("a"),
        ch.initializeAggregation("groupArrayState", F.col("v")).alias("g"))
    row = out.first()
    assert row.s == 5.0 and row.c == 1 and row.g == [5.0]
    fin = out.select(ch.finalizeAggregation("avgState", F.col("a"))
                     .alias("m")).first()
    assert fin.m == 5.0
    with pytest.raises(NotImplementedError, match="sketches"):
        ch.initializeAggregation("uniqState", F.col("v"))


def test_json_long_tail(spark):
    j = ('{"a": [1, {"b": 2}, "x"], "s": "hi", "n": 1.5, "i": -7, '
         '"f": false, "z": null}')
    df = spark.createDataFrame([(j,)], "j string")
    r = df.select(
        ch.JSONType(F.col("j"), "a").alias("ta"),
        ch.JSONType(F.col("j"), "s").alias("ts"),
        ch.JSONType(F.col("j"), "n").alias("tn"),
        ch.JSONType(F.col("j"), "i").alias("ti"),
        ch.JSONType(F.col("j"), "f").alias("tf"),
        ch.JSONType(F.col("j"), "z").alias("tz"),
        ch.JSONType(F.col("j"), "missing").alias("tm"),
        ch.JSON_EXISTS(F.col("j"), "z").alias("ez"),
        ch.JSON_EXISTS(F.col("j"), "q").alias("eq"),
        ch.JSON_QUERY(F.col("j"), "a", 2).alias("qa"),
        ch.JSONExtractKeys(F.col("j")).alias("keys"),
        ch.JSONExtractKeys(F.col("j"), "a", 2).alias("k2"),
        ch.JSONExtractArrayRaw(F.col("j"), "a").alias("raw"),
        ch.JSONExtractUInt(F.col("j"), "i").alias("ui"),
        ch.JSONExtractUInt(F.col("j"), "a", 1).alias("u1"),
    ).first()
    assert (r.ta, r.ts, r.tn, r.ti, r.tf, r.tz, r.tm) == \
        ("Array", "String", "Float64", "Int64", "Bool", "Null", None)
    assert r.ez is True and r.eq is False
    assert r.qa == '[{"b":2}]'
    assert r.keys == ["a", "s", "n", "i", "f", "z"] and r.k2 == ["b"]
    assert r.raw == ['1', '{"b":2}', '"x"']
    assert r.ui == 0 and r.u1 == 1    # negative clamps, 1-based index
    import pytest as _pt
    with _pt.raises(NotImplementedError, match="negative"):
        ch.JSONExtractUInt(F.col("j"), "a", -1)


def test_array_zip_unaligned_and_levenshtein(spark):
    df = spark.createDataFrame(
        [(["a", "b", "c"], ["a", "x", "c", "d"]),
         ([], ["q"]),
         (["m"], [])],
        "a array<string>, b array<string>")
    rows = df.select(
        ch.arrayLevenshteinDistance(F.col("a"), F.col("b")).alias("d"),
        ch.arrayZipUnaligned(F.col("a"), F.col("b")).alias("z")).collect()
    assert [r.d for r in rows] == [2, 1, 1]
    z = rows[0].z
    assert [(p["1"], p["2"]) for p in z] == \
        [("a", "a"), ("b", "x"), ("c", "c"), (None, "d")]
    assert [(p["1"], p["2"]) for p in rows[1].z] == [(None, "q")]
    # classic identity checks
    same = spark.createDataFrame([(["x", "y"], ["x", "y"])],
                                 "a array<string>, b array<string>")
    assert same.select(ch.arrayLevenshteinDistance(
        F.col("a"), F.col("b")).alias("d")).first().d == 0


def test_svg_and_case_aliases(spark):
    df = spark.range(1)
    s = df.select(ch.svg([(0., 0.), (10, 0), (10, 10), (0, 10)])
                  .alias("s")).first().s
    assert s == '<polygon points="0,0 10,0 10,10 0,10" style=""/>'
    p = df.select(ch.svg((3, 4.5), F.lit("stroke:blue"))
                  .alias("s")).first().s
    assert p == '<circle cx="3" cy="4.5" r="5" style="stroke:blue"/>'
    df2 = spark.createDataFrame(
        [([{"x": 1.0, "y": 2.5}, {"x": 3.0, "y": 4.0}],)],
        "g array<struct<x:double,y:double>>")
    assert df2.select(ch.svg(F.col("g")).alias("s")).first().s == \
        '<polygon points="1,2.5 3,4" style=""/>'
    # parser-internal CASE aliases resolve
    from clickhouse_core_spark.functions import CH_FUNCTIONS
    assert CH_FUNCTIONS["caseWithExpr"] is CH_FUNCTIONS["caseWithExpression"]
    assert CH_FUNCTIONS["caseWithoutExpr"] is CH_FUNCTIONS["multiIf"]


def test_overlay_and_aliases(spark):
    df = spark.createDataFrame([("Spark SQL",)], "s string")
    r = df.select(ch.overlay(F.col("s"), "ANSI ", 7, 0).alias("a"),
                  ch.overlayUTF8(F.col("s"), "_", 6).alias("b"),
                  ch.substringIndexUTF8(F.col("s"), " ", 1).alias("c"))\
        .first()
    assert (r.a, r.b, r.c) == ("Spark ANSI SQL", "Spark_SQL", "Spark")
    from clickhouse_core_spark.functions import CH_FUNCTIONS
    # makeDate32 has its own wider range [1900,2299] since r6 (both
    # share the default-on-invalid contract, 02243_make_date32)
    assert "makeDate32" in CH_FUNCTIONS and "makeDate" in CH_FUNCTIONS


def test_detect_tonality_and_programming_language(spark):
    df = spark.createDataFrame([
        (1, "I love this wonderful amazing product"),
        (2, "terrible awful broken waste of money"),
        (3, "the sky is blue"),
        (4, "def main():\n    import os\n    print(os.getcwd())"),
        (5, "SELECT a FROM t WHERE b GROUP BY c")], "i int, s string")
    out = {r.i: (r.t, r.p) for r in df.select(
        "i", ch.detectTonality(F.col("s")).alias("t"),
        ch.detectProgrammingLanguage(F.col("s")).alias("p")).collect()}
    assert out[1][0] > 0.3 and out[2][0] < -0.3 and out[3][0] == 0.0
    assert out[4][1] == "python" and out[5][1] == "sql"
    assert out[3][1] == "undefined"


def test_kostik_consistent_hash_exact(spark):
    """Catalyst expression vs the independent pure-Python reference of
    contrib/consistent-hashing: bit-exact across bucket counts incl.
    powers of two and the smooth-transition band."""
    import random
    from clickhouse_core_spark.functions.longtail5 import (
        kostik_consistent_hash_py)
    rnd = random.Random(7)
    xs = [rnd.getrandbits(64) for _ in range(200)] + [0, 1, 2 ** 63,
                                                      2 ** 64 - 1]
    signed = [(x - (1 << 64) if x >= 1 << 63 else x,) for x in xs]
    df = spark.createDataFrame(signed, "x long")
    for n in (1, 2, 5, 8, 100, 256, 1000):
        got = [r.h for r in df.select(
            ch.kostikConsistentHash(F.col("x"), n).alias("h")).collect()]
        want = [kostik_consistent_hash_py(x, n) for x in xs]
        assert got == want, n
        assert all(0 <= g < n for g in got)
    # consistency contract: growing n only moves keys INTO new buckets
    for x in xs[:50]:
        h5 = kostik_consistent_hash_py(x, 5)
        h6 = kostik_consistent_hash_py(x, 6)
        assert h6 == h5 or h6 == 5
    # the registry name now resolves to the exact algorithm
    from clickhouse_core_spark.functions import CH_FUNCTIONS
    assert CH_FUNCTIONS["yandexConsistentHash"] \
        is CH_FUNCTIONS["kostikConsistentHash"]


def test_wkt_polygon_family(spark):
    df = spark.createDataFrame([
        ("POINT (3 4.5)",
         "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), "
         "(2 2, 4 2, 4 4, 2 4, 2 2))")], "pt string, pg string")
    r = (df.select(ch.readWKTPoint(F.col("pt")).alias("p"),
                   ch.readWKTPolygon(F.col("pg")).alias("poly"),
                   ch.readWKTRing(F.col("pg")).alias("ring"))
         .select("p", "ring",
                 ch.polygonAreaCartesian(F.col("poly")).alias("area"),
                 ch.polygonPerimeterCartesian(F.col("poly")).alias("per"),
                 ch.wkt(F.col("p"), "point").alias("wp"),
                 ch.wkt(F.col("poly"), "polygon").alias("wpoly"),
                 ch.polygonConvexHullCartesian(F.col("poly"))
                 .alias("hull"))
         .first())
    assert (r.p.x, r.p.y) == (3.0, 4.5)
    assert len(r.ring) == 5 and r.ring[2]["x"] == 10.0
    assert r.area == 96.0          # 100 outer - 4 hole
    assert r.per == 48.0           # 40 outer + 8 hole
    assert r.wp == "POINT(3 4.5)"
    assert r.wpoly == ("POLYGON((0 0,10 0,10 10,0 10,0 0),"
                       "(2 2,4 2,4 4,2 4,2 2))")
    assert [(h["x"], h["y"]) for h in r.hull] == \
        [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]
    # malformed WKT degrades to NULL
    bad = spark.createDataFrame([("nope",)], "pt string")
    assert bad.select(ch.readWKTPoint(F.col("pt")).alias("p")) \
        .first().p is None


def test_polygon_pair_predicates(spark):
    """polygonsDistance/Within/EqualsCartesian (reference
    polygonsDistance.cpp / polygonsWithin.cpp / polygonsEquals.cpp)."""
    big = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    small = "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))"
    far = "POLYGON ((20 0, 23 0, 23 3, 20 3, 20 0))"
    # same square written with a rotated starting vertex + reversed
    big_rot = "POLYGON ((10 0, 10 10, 0 10, 0 0, 10 0))"
    big_rev = "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))"
    df = spark.createDataFrame(
        [(big, small, far, big_rot, big_rev)],
        "a string, b string, c string, d string, e string")
    g = df.select(*[ch.readWKTPolygon(F.col(c)).alias(c)
                    for c in "abcde"])
    r = g.select(
        ch.polygonsDistanceCartesian(F.col("a"), F.col("b")).alias("dab"),
        ch.polygonsDistanceCartesian(F.col("a"), F.col("c")).alias("dac"),
        ch.polygonsWithinCartesian(F.col("b"), F.col("a")).alias("w_ba"),
        ch.polygonsWithinCartesian(F.col("a"), F.col("b")).alias("w_ab"),
        ch.polygonsWithinCartesian(F.col("c"), F.col("a")).alias("w_ca"),
        ch.polygonsEqualsCartesian(F.col("a"), F.col("d")).alias("e_ad"),
        ch.polygonsEqualsCartesian(F.col("a"), F.col("e")).alias("e_ae"),
        ch.polygonsEqualsCartesian(F.col("a"), F.col("b")).alias("e_ab"),
    ).first()
    assert r.dab == 0.0            # overlap → 0
    assert abs(r.dac - 10.0) < 1e-9   # gap between x=10 and x=20
    assert r.w_ba is True          # small inside big
    assert r.w_ab is False
    assert r.w_ca is False
    assert r.e_ad is True          # rotation-insensitive
    assert r.e_ae is True          # orientation-insensitive
    assert r.e_ab is False
