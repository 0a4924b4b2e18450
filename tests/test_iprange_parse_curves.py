"""isIPAddressInRange, IPv6 CIDR ranges, parseReadableSize /
parseTimeDelta, morton curve, byteSwap (reference
src/Functions/isIPAddressContainedIn.cpp, FunctionsCodingIP.cpp,
parseReadableSize.cpp, parseTimeDelta.cpp, mortonEncode.cpp)."""

import ipaddress

from pyspark.sql import functions as F

from clickhouse_core_spark.functions.registry import ch


def test_is_ip_address_in_range(spark):
    cases = [
        ("192.168.1.55", "192.168.1.0/24", 1),
        ("192.168.2.55", "192.168.1.0/24", 0),
        ("10.0.0.1", "10.0.0.0/8", 1),
        ("11.0.0.1", "10.0.0.0/8", 0),
        ("1.2.3.4", "0.0.0.0/0", 1),
        ("2001:db8::1", "2001:db8::/32", 1),
        ("2001:db9::1", "2001:db8::/32", 0),
        ("2001:db8:abcd::1", "2001:db8:a000::/21", 1),
        ("2001:500::1", "2001:db8::/21", 0),
    ]
    # sanity: expectations agree with Python's ipaddress
    for a, c, e in cases:
        assert (ipaddress.ip_address(a)
                in ipaddress.ip_network(c, strict=False)) == bool(e), (a, c)
    df = spark.createDataFrame(cases, "a string, c string, e int")
    rows = df.select(
        "a", "c", "e",
        ch.isIPAddressInRange(F.col("a"), F.col("c")).alias("g")).collect()
    assert all(r["g"] == r["e"] for r in rows), \
        [(r["a"], r["c"]) for r in rows if r["g"] != r["e"]]


def test_ipv6_cidr_to_range(spark):
    for addr, bits in [("2001:db8:abcd::1", 21), ("2001:db8::1", 32),
                       ("fe80::1", 10), ("::1", 128)]:
        r = spark.range(1).select(ch.IPv6CIDRToRange(
            ch.IPv6StringToNum(F.lit(addr)), bits).alias("rng")).first()
        net = ipaddress.ip_network(f"{addr}/{bits}", strict=False)
        assert bytes(r["rng"]["lo"]) == net.network_address.packed, (addr, bits)
        assert bytes(r["rng"]["hi"]) == net.broadcast_address.packed, (addr, bits)


def test_parse_readable_size(spark):
    r = spark.range(1).select(
        ch.parseReadableSize(F.lit("1.5 MiB")).alias("a"),
        ch.parseReadableSize(F.lit("1012 KiB")).alias("b"),
        ch.parseReadableSize(F.lit("3 MB")).alias("c"),
        ch.parseReadableSizeOrNull(F.lit("junk")).alias("d"),
        ch.parseReadableSizeOrZero(F.lit("junk")).alias("e"),
        ch.parseReadableSize(F.lit("5 B")).alias("f"),
    ).first()
    assert int(r["a"]) == 1572864 and int(r["b"]) == 1036288
    assert int(r["c"]) == 3000000
    assert r["d"] is None and int(r["e"]) == 0 and int(r["f"]) == 5


def test_parse_time_delta(spark):
    r = spark.range(1).select(
        ch.parseTimeDelta(F.lit("1 hour 30 minutes")).alias("a"),
        ch.parseTimeDelta(F.lit("1h30m")).alias("b"),
        ch.parseTimeDelta(F.lit("2 days")).alias("c"),
        ch.parseTimeDelta(F.lit("1.5s")).alias("d"),
        ch.parseTimeDelta(F.lit("1 month")).alias("e"),
    ).first()
    assert r["a"] == 5400.0 and r["b"] == 5400.0
    assert r["c"] == 172800.0 and r["d"] == 1.5
    assert r["e"] == 30.5 * 86400


def test_morton_curve_roundtrip(spark):
    def interleave(x, y):
        d = 0
        for i in range(32):
            d |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
        return d

    cases = [(0, 0), (5, 3), (123456, 654321), (2**32 - 1, 1)]
    df = spark.createDataFrame(cases, "x long, y long")
    rows = df.select(
        "x", "y", ch.mortonEncode(F.col("x"), F.col("y")).alias("m"),
        ch.mortonDecode(F.lit(2), ch.mortonEncode(F.col("x"), F.col("y")))
        .alias("d")).collect()
    for r in rows:
        exp = interleave(r["x"], r["y"])
        exp_signed = exp - (1 << 64) if exp >= (1 << 63) else exp
        assert r["m"] == exp_signed, (r["x"], r["y"])
        assert (r["d"]["x"], r["d"]["y"]) == (r["x"], r["y"])


def test_byte_swap(spark):
    r = spark.range(1).select(
        ch.byteSwap(F.lit(0x0102030405060708), 8).alias("b8"),
        ch.byteSwap(F.lit(0xAABBCCDD), 4).alias("b4"),
    ).first()
    assert r["b8"] == 0x0807060504030201
    assert r["b4"] == 0xDDCCBBAA
