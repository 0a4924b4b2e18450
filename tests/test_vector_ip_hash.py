"""Tuple/vector arithmetic, IPv6 conversions, consistent hashing,
division OrNull family (reference src/Functions/vectorFunctions.cpp,
FunctionsCoding.h, jumpConsistentHash.cpp, divide.cpp/intDiv.cpp)."""

import ipaddress
import random

from pyspark.sql import functions as F

from clickhouse_core_spark.functions.registry import ch


def _jump_ref(key: int, n: int) -> int:
    b, j = -1, 0
    while j < n:
        b = j
        key = (key * 2862933555777941757 + 1) % (1 << 64)
        j = int((b + 1) * ((1 << 31) / ((key >> 33) + 1)))
    return b


def test_jump_consistent_hash_matches_reference(spark):
    random.seed(11)
    keys = [random.getrandbits(63) for _ in range(100)] + [0, 1, (1 << 63) - 1]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    for n in (1, 3, 64, 500, 4096):
        got = [r[0] for r in
               df.select(ch.jumpConsistentHash(F.col("k"), n)).collect()]
        assert got == [_jump_ref(k, n) for k in keys], f"n={n}"
    # kostik/yandex now resolve to their own bit-exact algorithm
    # (r5, functions/longtail5.py), no longer the jump stand-in
    assert ch.kostikConsistentHash is not ch.jumpConsistentHash
    assert ch.yandexConsistentHash is ch.kostikConsistentHash


def test_ipv6_string_num_roundtrip(spark):
    addrs = ["2001:db8::1", "::", "::1", "fe80::1:2:3:4",
             "2001:0db8:0000:0000:0000:ff00:0042:8329",
             "1:2:3:4:5:6:7:8", "1234:5678:9abc:def0:1234:5678:9abc:def0",
             "a:0:0:b:0:0:0:c", "0:0:1:0:0:0:0:1", "abcd::", "::abcd",
             "1:2:3:4:5:6:1.2.3.4"]
    df = spark.createDataFrame([(a,) for a in addrs], "a string")
    rows = df.select(
        "a", ch.IPv6StringToNum(F.col("a")).alias("n"),
        ch.IPv6NumToString(ch.IPv6StringToNum(F.col("a"))).alias("s")).collect()
    for r in rows:
        assert bytes(r["n"]) == ipaddress.IPv6Address(r["a"]).packed, r["a"]
        assert r["s"] == str(ipaddress.IPv6Address(r["a"])), r["a"]


def test_ipv6_mapped_v4_prints_dotted(spark):
    # formatIPv6 prints IPv4-mapped tails dotted (diverges from Python's
    # ipaddress, matches the reference / inet_ntop)
    df = spark.createDataFrame([("::ffff:192.168.1.1",)], "a string")
    r = df.select(
        ch.IPv6NumToString(ch.IPv6StringToNum(F.col("a"))).alias("s")).first()
    assert r["s"] == "::ffff:192.168.1.1"


def test_ipv6_malformed_is_null(spark):
    df = spark.createDataFrame([("nonsense",), ("1:2:3",)], "a string")
    rows = df.select(ch.IPv6StringToNum(F.col("a")).alias("n")).collect()
    assert all(r["n"] is None for r in rows)
    r = df.select(ch.IPv6StringToNumOrDefault(F.col("a")).alias("n")).first()
    assert bytes(r["n"]) == b"\x00" * 16


def test_tuple_arithmetic(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "x array<double>, y array<double>")
    r = df.select(
        ch.tuplePlus(F.col("x"), F.col("y")).alias("p"),
        ch.tupleMinus(F.col("x"), F.col("y")).alias("m"),
        ch.tupleMultiply(F.col("x"), F.col("y")).alias("mu"),
        ch.tupleDivide(F.col("y"), F.col("x")).alias("d"),
        ch.tupleNegate(F.col("x")).alias("n"),
        ch.tupleMultiplyByNumber(F.col("x"), F.lit(3)).alias("x3"),
        ch.tupleIntDiv(F.array(F.lit(-7), F.lit(9)),
                       F.array(F.lit(2), F.lit(3))).alias("idv"),
        ch.tupleIntDivOrZero(F.array(F.lit(5)), F.array(F.lit(0))).alias("iz"),
    ).first()
    assert r["p"] == [5.0, 7.0, 9.0]
    assert r["m"] == [-3.0, -3.0, -3.0]
    assert r["mu"] == [4.0, 10.0, 18.0]
    assert r["d"] == [4.0, 2.5, 2.0]
    assert r["n"] == [-1.0, -2.0, -3.0]
    assert r["x3"] == [3.0, 6.0, 9.0]
    assert r["idv"] == [-3, 3]       # C++ truncation toward zero
    assert r["iz"] == [0]


def test_tuple_divide_by_zero_gives_inf(spark):
    df = spark.createDataFrame([([1.0, -1.0],)], "x array<double>")
    r = df.select(ch.tupleDivide(
        F.col("x"), F.array(F.lit(0.0), F.lit(0.0))).alias("d")).first()
    assert r["d"][0] == float("inf") and r["d"][1] == float("-inf")


def test_normalize_variants(spark):
    df = spark.createDataFrame([([3.0, -4.0],)], "x array<double>")
    r = df.select(ch.LinfNormalize(F.col("x")).alias("li"),
                  ch.LpNormalize(F.col("x"), 3).alias("lp")).first()
    assert r["li"] == [0.75, -1.0]
    assert abs(sum(abs(v) ** 3 for v in r["lp"]) - 1.0) < 1e-9


def test_division_or_null_family(spark):
    r = spark.range(1).select(
        ch.divideOrNull(F.lit(5), F.lit(0)).alias("d0"),
        ch.divideOrNull(F.lit(5), F.lit(2)).alias("d"),
        ch.intDivOrNull(F.lit(-7), F.lit(2)).alias("i"),
        ch.intDivOrNull(F.lit(7), F.lit(0)).alias("i0"),
        ch.moduloOrNull(F.lit(7), F.lit(0)).alias("m0"),
        ch.positiveModuloOrNull(F.lit(-7), F.lit(3)).alias("pm"),
        ch.positiveModuloOrNull(F.lit(-7), F.lit(0)).alias("pm0")).first()
    assert r["d0"] is None and r["d"] == 2.5
    assert r["i"] == -3 and r["i0"] is None
    assert r["m0"] is None and r["pm"] == 2 and r["pm0"] is None
