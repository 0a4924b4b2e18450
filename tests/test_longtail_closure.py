"""Round-4 long-tail closure: conversion OrNull/OrZero matrix, granular
datetime arithmetic, inverse hyperbolics, Euclid gcd/lcm folds, hash
aliases (reference FunctionsConversion.h,
FunctionDateOrDateTimeAddInterval.h, FunctionsHashing.h)."""

import datetime
import hashlib
import math
import zlib

from pyspark.sql import functions as F

from clickhouse_core_spark.functions.registry import ch


def test_conversion_matrix_bounds(spark):
    r = spark.range(1).select(
        ch.toInt8OrNull(F.lit("127")).alias("i8"),
        ch.toInt8OrNull(F.lit("128")).alias("i8o"),
        ch.toUInt8OrZero(F.lit("255")).alias("u8"),
        ch.toUInt8OrZero(F.lit("256")).alias("u8o"),
        ch.toUInt16OrNull(F.lit("70000")).alias("u16o"),
        ch.toUInt32OrNull(F.lit("4294967295")).alias("u32"),
        ch.toUInt64OrNull(F.lit("18446744073709551615")).alias("u64"),
        ch.toFloat32OrNull(F.lit("bogus")).alias("f32"),
        ch.toDateOrZero(F.lit("bogus")).alias("d0"),
        ch.toDateTimeOrNull(F.lit("2024-05-01 10:00:00")).alias("ts"),
    ).first()
    assert r["i8"] == 127 and r["i8o"] is None
    assert r["u8"] == 255 and r["u8o"] == 0 and r["u16o"] is None
    assert r["u32"] == 4294967295
    assert int(r["u64"]) == 18446744073709551615
    assert r["f32"] is None
    assert r["d0"] == datetime.date(1970, 1, 1)
    assert r["ts"].hour == 10


def test_datetime_granular_arithmetic(spark):
    ts = F.lit("2024-05-01 00:00:00").cast("timestamp")
    r = spark.range(1).select(
        ch.addMilliseconds(ts, F.lit(1500)).alias("ms"),
        ch.subtractMicroseconds(ts, F.lit(1)).alias("us"),
        ch.addQuarters(F.lit("2024-05-01").cast("date"), F.lit(2)).alias("q"),
        ch.subtractWeeks(F.lit("2024-05-01").cast("date"), F.lit(1)).alias("w"),
        ch.subtractHours(ts, F.lit(2)).alias("h"),
        ch.toStartOfISOYear(F.lit("2021-01-10").cast("date")).alias("iso"),
        ch.toLastDayOfWeek(F.lit("2024-05-01").cast("date")).alias("ldow"),
        ch.toStartOfMillisecond(
            F.lit("2024-05-01 00:00:00.123456").cast("timestamp")).alias("tms"),
        ch.toYYYYMMDDhhmmss(F.lit("2024-05-01 12:34:56").cast("timestamp"))
        .alias("n14"),
        ch.tumbleStart(F.lit("2024-05-01 10:17:00").cast("timestamp"),
                       F.lit(3600)).alias("tst"),
        ch.tumbleEnd(F.lit("2024-05-01 10:17:00").cast("timestamp"),
                     F.lit(3600)).alias("ten"),
    ).first()
    assert str(r["ms"]) == "2024-05-01 00:00:01.500000"
    assert str(r["us"]) == "2024-04-30 23:59:59.999999"
    assert str(r["q"]) == "2024-11-01" and str(r["w"]) == "2024-04-24"
    assert str(r["h"]) == "2024-04-30 22:00:00"
    assert str(r["iso"]) == "2021-01-04"      # ISO-2021 week 1 Monday
    assert str(r["ldow"]) == "2024-05-05"     # Sunday of that week
    assert str(r["tms"]) == "2024-05-01 00:00:00.123000"
    assert r["n14"] == 20240501123456
    assert str(r["tst"]) == "2024-05-01 10:00:00"
    assert str(r["ten"]) == "2024-05-01 11:00:00"


def test_math_longtail(spark):
    r = spark.range(1).select(
        ch.acosh(F.lit(2.0)).alias("ac"),
        ch.asinh(F.lit(1.5)).alias("as"),
        ch.atanh(F.lit(0.5)).alias("at"),
        ch.hypot(F.lit(3.0), F.lit(4.0)).alias("hy"),
        ch.min2(F.lit(3), F.lit(7.5)).alias("mn"),
        ch.max2(F.lit(3), F.lit(7.5)).alias("mx"),
        ch.factorial(F.lit(20)).alias("f20"),
        ch.factorial(F.lit(0)).alias("f0"),
        ch.factorial(F.lit(21)).alias("f21"),
        ch.gcd(F.col("id") + 12, F.lit(18)).alias("g"),
        ch.lcm(F.lit(12), F.lit(18)).alias("l"),
        ch.countDigits(F.lit(-12345)).alias("cd"),
        ch.tupleHammingDistance(F.array(F.lit(1), F.lit(2)),
                                F.array(F.lit(1), F.lit(3))).alias("thd"),
        ch.throwIf(F.lit(0), "boom").alias("ok"),
    ).first()
    assert abs(r["ac"] - math.acosh(2.0)) < 1e-12
    assert abs(r["as"] - math.asinh(1.5)) < 1e-12
    assert abs(r["at"] - math.atanh(0.5)) < 1e-12
    assert r["hy"] == 5.0 and r["mn"] == 3.0 and r["mx"] == 7.5
    assert r["f20"] == math.factorial(20) and r["f0"] == 1
    assert r["f21"] is None                  # reference throws; NULL here
    assert r["g"] == 6 and r["l"] == 36
    assert r["cd"] == 5 and r["thd"] == 1 and r["ok"] == 0


def test_gcd_matches_python_across_values(spark):
    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 12, 270, 987654321, 2**62)
         for b in (1, 7, 18, 646, 123456789)], "a long, b long")
    rows = df.select("a", "b", ch.gcd(F.col("a"), F.col("b")).alias("g")).collect()
    for r in rows:
        assert r["g"] == math.gcd(r["a"], r["b"]), (r["a"], r["b"])


def test_hash_aliases_exact_and_mapped(spark):
    r = spark.range(1).select(
        ch.SHA224(F.lit("abc")).alias("s224"),
        ch.SHA384(F.lit("abc")).alias("s384"),
        ch.CRC32IEEE(F.lit("123456789")).alias("crc"),
        ch.halfMD5(F.lit("abc")).alias("h"),
        ch.murmurHash3_64(F.lit("abc")).alias("m"),
    ).first()
    assert bytes(r["s224"]).hex() == hashlib.sha224(b"abc").hexdigest()
    assert bytes(r["s384"]).hex() == hashlib.sha384(b"abc").hexdigest()
    assert r["crc"] == zlib.crc32(b"123456789")
    assert int(r["h"]) == int(hashlib.md5(b"abc").hexdigest()[:16], 16)
    assert isinstance(r["m"], int)


def test_throwif_raises_when_true(spark):
    import pytest as _pt
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    with _pt.raises((Py4JJavaError, SparkRuntimeException, Exception)):
        spark.range(1).select(ch.throwIf(F.lit(1), "boom")).collect()


def test_base32_base64url_roundtrip(spark):
    import base64 as b64
    texts = ["hello world!", "a", "ab", "abc", "abcd", "abcde", ""]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    rows = df.select(
        "t", ch.base32Encode(F.col("t")).alias("e"),
        ch.base32Decode(ch.base32Encode(F.col("t"))).alias("rt"),
        ch.base64URLEncode(F.col("t")).alias("u"),
        ch.base64URLDecode(ch.base64URLEncode(F.col("t"))).alias("urt"),
    ).collect()
    for r in rows:
        assert r["e"] == b64.b32encode(r["t"].encode()).decode(), r["t"]
        assert r["rt"] == r["t"]
        assert r["u"] == b64.urlsafe_b64encode(
            r["t"].encode()).decode().rstrip("=")
        assert r["urt"] == r["t"]


def test_erf_erfc_approximation(spark):
    vals = [-2.5, -1.0, -0.3, 0.0, 0.5, 1.5, 3.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    rows = df.select("x", ch.erf(F.col("x")).alias("e"),
                     ch.erfc(F.col("x")).alias("c")).collect()
    for r in rows:
        assert abs(r["e"] - math.erf(r["x"])) < 2e-7, r["x"]
        assert abs(r["c"] - math.erfc(r["x"])) < 2e-7, r["x"]


def test_misc_closure(spark):
    r = spark.range(1).select(
        ch.dateTrunc("month", F.lit("2024-05-17").cast("date")).alias("dt"),
        ch.decodeURLFormComponent(F.lit("a+b%21")).alias("form"),
        ch.encodeURLFormComponent(F.lit("a b!")).alias("enc"),
        ch.accurateCastOrDefault(F.lit("12x"), "Int32", 7).alias("acd"),
        ch.accurateCastOrDefault(F.lit("12"), "Int32").alias("acd2"),
        ch.unbin(F.lit("0110000101100010")).alias("ub"),
        ch.toStringCutToZero(F.lit("abc\x00def")).alias("cz"),
        ch.FQDN().alias("fq"),
        ch.concatAssumeInjective(F.lit("a"), F.lit("b")).alias("ci"),
    ).first()
    assert str(r["dt"]).startswith("2024-05-01")
    assert r["form"] == "a b!" and r["enc"] == "a+b%21"
    assert r["acd"] == 7 and r["acd2"] == 12
    assert r["ub"] == "ab" and r["cz"] == "abc"
    assert isinstance(r["fq"], str) and r["ci"] == "ab"


def test_json_all_paths_and_types(spark):
    import json as _json
    j = _json.dumps({"a": 1, "b": {"c": "x", "d": {"e": True}}, "f": [1, 2]})
    r = spark.range(1).select(
        ch.JSONAllPaths(F.lit(j)).alias("p"),
        ch.JSONAllPathsWithTypes(F.lit(j)).alias("pt")).first()
    assert r["p"] == ["a", "b", "b.c", "b.d", "b.d.e", "f"]
    assert r["pt"]["a"] == "Int64" and r["pt"]["b"] == "Object"
    assert r["pt"]["b.d.e"] == "Bool" and r["pt"]["f"] == "Array"


def test_proportions_ztest(spark):
    r = spark.range(1).select(ch.proportionsZTest(
        F.lit(10), F.lit(11), F.lit(100), F.lit(101), 0.95, "unpooled")
        .alias("z")).first()["z"]
    px, py, tx, ty = 10 / 100, 11 / 101, 100, 101
    se = math.sqrt(px * (1 - px) / tx + py * (1 - py) / ty)
    zref = (px - py) / se
    assert abs(r["z_statistic"] - zref) < 1e-12
    assert abs(r["p_value"] - math.erfc(abs(zref) / math.sqrt(2))) < 1e-6
    import statistics as st
    zq = st.NormalDist().inv_cdf(0.975)
    assert abs(r["confidence_interval_low"] - ((px - py) - zq * se)) < 1e-12
    assert abs(r["confidence_interval_high"] - ((px - py) + zq * se)) < 1e-12
    # zero successes -> NaN row (reference contract)
    r2 = spark.range(1).select(ch.proportionsZTest(
        F.lit(0), F.lit(5), F.lit(10), F.lit(10)).alias("z")).first()["z"]
    assert math.isnan(r2["z_statistic"])


def test_series_outliers_tukey(spark):
    vals = [-3.0, 2.0, 15.0, 3.0, 5.0, 6.0, 4.5, 5.0, 100.0]
    r = spark.range(1).select(ch.seriesOutliersDetectTukey(
        F.array(*[F.lit(v) for v in vals])).alias("t")).first()["t"]
    # reference-exact quantile rule: q1/q3 over the sorted series
    s = sorted(vals); n = len(s)

    def q(p):
        pp = n * p
        if pp == int(pp):
            return (s[int(pp) - 1] + s[int(pp)]) / 2
        return s[math.ceil(pp) - 1]

    q1, q3 = q(0.25), q(0.75)
    lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
    exp = [min(v - lo, 0.0) + max(v - hi, 0.0) for v in vals]
    assert r == exp
    # short series -> NULL (reference throws; ANSI-safe here)
    r2 = spark.range(1).select(ch.seriesOutliersDetectTukey(
        F.array(F.lit(1.0), F.lit(2.0))).alias("t")).first()["t"]
    assert r2 is None


def test_detect_language_and_theta_ops(spark):
    rows = spark.createDataFrame(
        [("the cat sat on the mat and the dog was there",),
         ("el gato y el perro en la casa de la madre",),
         ("12345 67890",)], "t string") \
        .select(ch.detectLanguage(F.col("t")).alias("l")).collect()
    assert [r["l"] for r in rows] == ["en", "es", "und"]
    df = spark.range(10).select(
        F.theta_sketch_agg(F.col("id")).alias("a"),
        F.theta_sketch_agg(F.col("id") + 5).alias("b"))
    r = df.select(
        F.theta_sketch_estimate(ch.uniqThetaUnion(F.col("a"), F.col("b"))).alias("u"),
        F.theta_sketch_estimate(ch.uniqThetaIntersect(F.col("a"), F.col("b"))).alias("i"),
        F.theta_sketch_estimate(ch.uniqThetaNot(F.col("a"), F.col("b"))).alias("n"),
    ).first()
    assert (r["u"], r["i"], r["n"]) == (15.0, 5.0, 5.0)


def test_hop_window_id_lowcardinality(spark):
    ts = F.lit("2024-05-01 10:17:00").cast("timestamp")
    r = spark.range(1).select(
        ch.hopStart(ts, F.lit(600), F.lit(3600)).alias("hs"),
        ch.hopEnd(ts, F.lit(600), F.lit(3600)).alias("he"),
        ch.windowID(ts, F.lit(3600)).alias("wid"),
        ch.tumbleEnd(ts, F.lit(3600)).alias("te"),
        ch.toLowCardinality(F.lit("x")).alias("lc")).first()
    assert str(r["hs"]) == "2024-05-01 10:10:00"
    assert str(r["he"]) == "2024-05-01 11:10:00"
    # windowID == epoch seconds of tumbleEnd (StorageWindowView.cpp)
    import calendar
    assert r["wid"] == calendar.timegm(r["te"].timetuple())
    assert r["lc"] == "x"


def test_reinterpret_family(spark):
    import struct
    r = spark.range(1).select(
        ch.reinterpretAsUInt32(F.lit("abcd")).alias("u32"),
        ch.reinterpretAsUInt16(F.lit("ab")).alias("u16"),
        ch.reinterpretAsUInt8(F.lit("a")).alias("u8"),
        ch.reinterpretAsInt64(F.lit("abcdefgh")).alias("i64"),
        ch.reinterpretAsInt8(F.lit("\xff")).alias("i8"),
        ch.reinterpretAsString(F.lit(97 + 98 * 256)).alias("s"),
        ch.reinterpretAsFixedString(F.lit(97)).alias("fs"),
        ch.reinterpretAsDate(F.lit("\x01\x00")).alias("d"),
        ch.reinterpretAsDateTime(F.lit("\x10\x00\x00\x00")).alias("dt"),
        ch.arrayPartialSort(2, F.array(F.lit(3), F.lit(1), F.lit(2))).alias("ps"),
        ch.arrayPartialReverseSort(2, F.array(F.lit(3), F.lit(1), F.lit(2)))
        .alias("prs"),
    ).first()
    assert r["u32"] == struct.unpack("<I", b"abcd")[0]
    assert r["u16"] == struct.unpack("<H", b"ab")[0] and r["u8"] == 97
    assert r["i64"] == struct.unpack("<q", b"abcdefgh")[0]
    assert r["s"] == "ab" and len(r["fs"]) == 8
    assert str(r["d"]) == "1970-01-02"
    assert r["dt"].minute == 0 and r["dt"].second == 16
    assert r["ps"] == [1, 2, 3] and r["prs"] == [3, 2, 1]


def test_geohashes_in_box(spark):
    r = spark.range(1).select(
        ch.geohashesInBox(F.lit(-1.0), F.lit(51.0), F.lit(0.5), F.lit(51.8), 3)
        .alias("g3"),
        ch.geohashesInBox(F.lit(13.0), F.lit(52.0), F.lit(13.1), F.lit(52.1), 5)
        .alias("g5"),
        ch.geohashesInBox(F.lit(-180.0), F.lit(-90.0), F.lit(180.0),
                          F.lit(90.0), 12).alias("too_many"),
    ).first()
    assert r["g3"] == ["gcp", "u10"]          # London-area 3-char cells
    assert len(r["g5"]) == 12 and all(len(g) == 5 for g in r["g5"])
    # every returned cell's decoded center lies in (or adjacent to) the box
    for g in r["g5"]:
        lon, lat = spark.range(1).select(
            ch.geohashDecode(F.lit(g)).alias("d")).first()["d"]
        assert 12.9 < lon < 13.2 and 51.9 < lat < 52.2, g
    assert r["too_many"] == []                # >100k cells -> empty


def test_reduce_ranges_bitmap_bytes_relative(spark):
    r = spark.range(1).select(
        ch.arrayReduceInRanges(
            "sum", F.array(F.array(F.lit(1), F.lit(2)),
                           F.array(F.lit(2), F.lit(3))),
            F.array(*[F.lit(v) for v in [10, 20, 30, 40, 50]])).alias("rir"),
        ch.bitmapTransform(F.array(F.lit(1), F.lit(2), F.lit(3)),
                           F.array(F.lit(2)), F.array(F.lit(9))).alias("bt"),
        ch.stringBytesUniq(F.lit("hello")).alias("sbu"),
        ch.stringBytesEntropy(F.lit("aabb")).alias("sbe"),
        ch.toRelativeWeekNum(F.lit("1970-01-01").cast("date")).alias("w1"),
        ch.toRelativeWeekNum(F.lit("1970-01-05").cast("date")).alias("w2"),
        ch.toRelativeQuarterNum(F.lit("2024-05-01").cast("date")).alias("q"),
    ).first()
    assert r["rir"] == [30.0, 90.0]
    assert r["bt"] == [1, 3, 9]
    assert r["sbu"] == 4 and abs(r["sbe"] - 1.0) < 1e-12
    # DateLUTImpl.h:701 — Thursday epoch start is week 0, next Monday week 1
    assert r["w1"] == 0 and r["w2"] == 1
    assert r["q"] == 2024 * 4 + 1
