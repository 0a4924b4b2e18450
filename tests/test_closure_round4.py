"""Round-4 closure batch: exact intHash32/64, sqids codec,
multiFuzzyMatch literal subset, convertCharset, and the small named
gaps (clamp/sigmoid/basename/blockNumber/...).

Reference: src/Common/HashTable/Hash.h, src/Functions/sqid.cpp,
src/Functions/MultiMatchAnyImpl.h, src/Functions/convertCharset.cpp,
clamp.cpp, blockNumber.cpp.
"""

import pytest
from pyspark.sql import functions as F

from clickhouse_core_spark.functions import ch

_M = (1 << 64) - 1


def one(spark, col):
    return spark.range(1).select(col.alias("v")).first().v


def _ref_inthash64(x):
    x = (x ^ 0x4CF2D2BAAE6DA887) & _M
    x ^= x >> 33
    x = (x * 0xFF51AFD7ED558CCD) & _M
    x ^= x >> 33
    x = (x * 0xC4CEB9FE1A85EC53) & _M
    x ^= x >> 33
    return x


def _ref_inthash32(x):
    k = (x ^ 0x75D9543DE018BF45) & _M
    k = ((~k) + (k << 18)) & _M
    k ^= ((k >> 31) | (k << 33)) & _M
    k = (k * 21) & _M
    k ^= ((k >> 11) | (k << 53)) & _M
    k = (k + (k << 6)) & _M
    k ^= ((k >> 22) | (k << 42)) & _M
    return k & 0xFFFFFFFF


def test_inthash_bit_exact(spark):
    import random
    random.seed(5)
    vals = [0, 1, -1, 2 ** 62] + [random.getrandbits(63) for _ in range(15)]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    for r in df.select("x", ch.intHash64(F.col("x")).alias("h64"),
                       ch.intHash32(F.col("x")).alias("h32")).collect():
        assert (r.h64 & _M) == _ref_inthash64(r.x & _M)
        assert r.h32 == _ref_inthash32(r.x & _M)


def test_sqids_roundtrip(spark):
    # spec vector: encode([1,2,3]) = '86Rf07'
    assert one(spark, ch.sqidEncode(F.lit(1), F.lit(2), F.lit(3))) == \
        "86Rf07"
    assert one(spark, ch.sqidDecode(F.lit("86Rf07"))) == [1, 2, 3]
    assert one(spark, ch.sqidDecode(ch.sqidEncode(
        F.lit(0), F.lit(999999), F.lit(42)))) == [0, 999999, 42]
    assert one(spark, ch.sqidDecode(F.lit("!!not-alphabet"))) == []


def test_multi_fuzzy_match(spark):
    s = F.lit("the quick brown fox")
    assert one(spark, ch.multiFuzzyMatchAny(s, 1, ["quikc", "zzz"])) == 1
    assert one(spark, ch.multiFuzzyMatchAny(s, 0, ["quikc"])) == 0
    assert one(spark, ch.multiFuzzyMatchAnyIndex(
        s, 1, ["zzz", "brwn"])) == 2
    assert one(spark, ch.multiFuzzyMatchAllIndices(
        s, 2, ["quik", "fxo", "mmmmm"])) == [1, 2]
    with pytest.raises(NotImplementedError, match="hyperscan"):
        ch.multiFuzzyMatchAny(s, 1, ["a.*b"])


def test_convert_charset(spark):
    # utf-8 bytes (latin1-wrapped) -> latin1 text of those bytes
    got = one(spark, ch.convertCharset(F.lit("cafÃ©"),
                                       "utf-8", "latin1"))
    assert got == "café"


def test_closure_smalls(spark):
    row = spark.range(1).select(
        ch.clamp(F.lit(-5), 0, 10).alias("cl"),
        ch.sigmoid(F.lit(100.0)).alias("sg"),
        ch.basename(F.lit("a/b/c/file.bin")).alias("bn"),
        ch.mapContainsKey(F.create_map(F.lit("k"), F.lit(1)),
                          "k").alias("mk"),
        ch.toBool(F.lit(1)).alias("tb"),
        ch.toWeekOfWeekYear(F.lit("2021-01-01").cast("date")).alias("wk"),
        ch.getSubcolumn(F.struct(F.lit(7).alias("f")), "f").alias("sc"),
        ch.blockNumber().alias("blk"),
        ch.rowNumberInBlock().alias("rib"),
        ch.printf(F.lit("%d-%s"), F.lit(5), F.lit("x")).alias("pf"),
        ch.defaultValueOfTypeName("Int32").alias("dv"),
        ch.toIPv6(F.lit("2001:0db8:0000:0000:0000:0000:0000:0001"))
        .alias("ip6"),
    ).first()
    assert row.cl == 0 and row.sg == pytest.approx(1.0)
    assert row.bn == "file.bin" and row.mk == 1 and row.tb is True
    assert row.wk == 53 and row.sc == 7 and row.rib == 0
    assert row.pf == "5-x" and row.dv == 0
    assert row.ip6 == "2001:db8::1"


def test_closure_aliases(spark):
    from clickhouse_core_spark.functions import CH_FUNCTIONS
    for alias, target in (("mod", "modulo"), ("flatten", "arrayFlatten"),
                          ("truncate", "trunc"), ("sqid", "sqidEncode"),
                          ("extractAllGroups", "extractAllGroupsVertical"),
                          ("time_bucket", "toStartOfInterval")):
        assert CH_FUNCTIONS[alias] is CH_FUNCTIONS[target], alias


def test_series_period_detect_fft(spark):
    import math
    # clean sinusoid of period 8 over 64 points -> exact 8.0
    vals = [math.sin(2 * math.pi * i / 8) for i in range(64)]
    df = spark.createDataFrame([(vals,), ([1.0, 1.0, 1.0, 1.0, 1.0],),
                                ([1.0, 2.0],)], "a array<double>")
    got = [r.p for r in df.select(
        ch.seriesPeriodDetectFFT(F.col("a")).alias("p")).collect()]
    assert got[0] == 8.0
    assert got[1] == 0.0            # flat series
    # reference yields NaN for < 4 points; NaN transits as NULL
    # through the Arrow double carrier
    assert got[2] is None or math.isnan(got[2])


def test_series_decompose(spark):
    import math
    # seasonal [3,-3] + linear trend: classical decomposition recovers
    # the components in the interior
    period = 2
    vals = [i * 0.5 + (3.0 if i % 2 == 0 else -3.0) for i in range(40)]
    df = spark.createDataFrame([(vals,)], "a array<double>")
    comp = df.select(ch.seriesDecomposeSTL(F.col("a"), period)
                     .alias("c")).first().c
    seasonal, trend, resid = comp
    assert len(seasonal) == len(trend) == len(resid) == 40
    for i in range(4, 36):
        assert abs(seasonal[i] - (3.0 if i % 2 == 0 else -3.0)) < 1e-9
        assert abs(trend[i] - i * 0.5) < 0.26   # MA lag on linear trend
        assert abs(resid[i]) < 0.26
    # reconstruction is exact everywhere by construction
    for i in range(40):
        assert abs(seasonal[i] + trend[i] + resid[i] - vals[i]) < 1e-9


def test_semantic_dedup_planted(spark):
    import random
    from clickhouse_core_spark.pipeline import semantic_dedup
    random.seed(19)
    rows = [(i, [random.gauss(0, 1) for _ in range(16)]) for i in range(40)]
    # plant exact duplicates of ids 0..9 at ids 100..109
    rows += [(100 + i, rows[i][1]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = sorted(r.vec_id for r in semantic_dedup(
        df, threshold=0.99, n_centroids=3, iterations=2,
        seed=5).collect())
    assert kept == list(range(40))  # originals survive, copies dropped
    # transitive mode agrees on pairwise-only duplicates
    kept_t = sorted(r.vec_id for r in semantic_dedup(
        df, threshold=0.99, n_centroids=3, iterations=2, seed=5,
        transitive=True).collect())
    assert kept_t == list(range(40))


def test_flatten_tuple_and_names(spark):
    from clickhouse_core_spark.operators import flatten_tuple, tuple_names
    df = spark.range(2).select(
        F.struct(F.lit(1).alias("a"), F.lit("x").alias("b")).alias("t"),
        "id")
    flat = flatten_tuple(df, "t")
    assert flat.columns == ["id", "t.a", "t.b"]
    assert tuple_names(df, "t") == ["a", "b"]


def test_ranked_enumerate_and_nested_sizes(spark):
    row = spark.range(1).select(
        ch.arrayEnumerateDenseRanked(
            F.array(F.lit(10), F.lit(20), F.lit(10))).alias("d"),
        ch.arrayEnumerateUniqRanked(
            F.array(F.lit(5), F.lit(5))).alias("u"),
        ch.validateNestedArraySizes(
            F.lit(True), F.array(F.lit(1)), F.array(F.lit(2))).alias("ok"),
        ch.validateNestedArraySizes(
            F.lit(True), F.array(F.lit(1)),
            F.array(F.lit(2), F.lit(3))).alias("bad")).first()
    assert row.d == [1, 2, 1] and row.u == [1, 2]
    assert row.ok == 1 and row.bad == 0
    with pytest.raises(NotImplementedError, match="depth"):
        ch.arrayEnumerateDenseRanked(F.array(F.lit(1)), 2)


def test_bit_slice_and_reinterpret_floats(spark):
    import struct
    row = spark.range(1).select(
        ch.bitSlice(F.lit("Hello"), 1, 8).alias("b1"),
        ch.bitSlice(F.lit("Hello"), 2, 8).alias("b2"),
        ch.bitSlice(F.lit("Hello"), 1, 4).alias("b3"),
        ch.reinterpretAsFloat64(F.lit(struct.unpack(
            "<q", struct.pack("<d", 3.141592653589793))[0])).alias("pi"),
        ch.reinterpretAsFloat64(F.lit(struct.unpack(
            "<q", struct.pack("<d", -2.5e-310))[0])).alias("sub"),
        ch.reinterpretAsFloat32(F.lit(struct.unpack(
            "<i", struct.pack("<f", -0.375))[0])).alias("f32"),
        F.length(ch.randomPrintableASCII(F.lit(7))).alias("rl"),
        (F.lit("2021-01-01").cast("timestamp")
         + ch.toInterval(2, "month")).alias("ti")).first()
    assert bytes(row.b1) == b"H"
    assert bytes(row.b2) == bytes([((0x48 << 1) | (0x65 >> 7)) & 0xFF])
    assert bytes(row.b3) == b"@"
    assert row.pi == 3.141592653589793   # bit-exact, incl subnormals
    assert row.sub == -2.5e-310
    assert row.f32 == -0.375 and row.rl == 7
    assert str(row.ti).startswith("2021-03-01")


def test_bit_slice_property_vs_python(spark):
    import random
    random.seed(23)
    cases = []
    s = "The quick brown fox!"
    raw = s.encode()
    for _ in range(12):
        off = random.randint(1, len(raw) * 8)
        ln = random.randint(1, len(raw) * 8 - off + 1)
        cases.append((off, ln))

    def py_bit_slice(data: bytes, off: int, ln: int) -> bytes:
        bits = "".join(f"{b:08b}" for b in data)[off - 1:off - 1 + ln]
        bits += "0" * (-len(bits) % 8)
        return bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))

    sel = spark.range(1).select(*[
        ch.bitSlice(F.lit(s), off, ln).alias(f"c{i}")
        for i, (off, ln) in enumerate(cases)]).first()
    for i, (off, ln) in enumerate(cases):
        assert bytes(sel[f"c{i}"]) == py_bit_slice(raw, off, ln), (off, ln)


def test_reinterpret_float_property(spark):
    import random
    import struct
    random.seed(29)
    doubles = [0.0, -0.0, 1.0, -1.5, 1e308, 5e-324, 2.5e-310] + \
        [random.uniform(-1e10, 1e10) for _ in range(10)]
    bits = [struct.unpack("<q", struct.pack("<d", v))[0] for v in doubles]
    df = spark.createDataFrame([(b,) for b in bits], "b long")
    got = [r.f for r in df.select(
        ch.reinterpretAsFloat64(F.col("b")).alias("f")).collect()]
    import math
    for want, g in zip(doubles, got):
        assert g == want or (math.isnan(want) and math.isnan(g)), (want, g)


def test_tuple_to_name_value_pairs(spark):
    from clickhouse_core_spark.operators import tuple_to_name_value_pairs
    df = spark.range(1).select(
        F.struct(F.lit(1).alias("a"), F.lit("x").alias("b")).alias("t"))
    row = df.select(tuple_to_name_value_pairs(df, "t").alias("p")).first()
    assert [(p.name, p.value) for p in row.p] == [("a", "1"), ("b", "x")]
