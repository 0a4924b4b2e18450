"""Unicode / IDN codec scalar functions backed by the Python stdlib.

Reference: src/Functions/normalizeString.cpp (normalizeUTF8NFC/NFD/
NFKC/NFKD — ICU there, `unicodedata` here: both implement Unicode
TR15, same output), src/Functions/punycode.cpp (punycodeEncode/
punycodeDecode/tryPunycodeDecode — RFC 3492; Python's built-in
``punycode`` codec is the same RFC), src/Functions/idna.cpp
(idnaEncode/tryIdnaEncode/idnaDecode — the reference uses UTS46
nontransitional processing, the stdlib ``encodings.idna`` implements
IDNA 2003: divergent only for deviation characters such as ß/ZWJ,
documented in LIMITS.md).

These have no Catalyst expression form, so each is an Arrow-batched
``pandas_udf`` — the sanctioned slow path for per-codepoint codecs
(SURVEY §4; the batch transfer amortizes the Python boundary, and the
UDFs are pure map-side: no shuffle, scale-neutral).  UDF objects are
created lazily on first call and cached: the registry module is also
imported inside Python workers, where no SparkSession exists.

Hash long-tail (RIPEMD160, SHA512_256 — src/Functions/FunctionsHashing.h
registrations): OpenSSL-backed ``hashlib`` algorithms, emitted as
lowercase hex strings like the registry's MD5/SHA mappings.
"""

from __future__ import annotations

import hashlib
import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else (
        F.col(x) if isinstance(x, str) else F.lit(x))


_UDF_CACHE: dict = {}


def _lazy_str_udf(key: str, fn):
    """str->str Python function as a lazily-built Arrow-batched UDF."""
    def call(x):
        udf = _UDF_CACHE.get(key)
        if udf is None:
            import pandas as pd
            from pyspark.sql.pandas.functions import pandas_udf
            from pyspark.sql.types import StringType

            def _apply(s):
                return s.map(lambda v: None if v is None else fn(v))

            _apply.__annotations__ = {"s": pd.Series, "return": pd.Series}
            udf = pandas_udf(_apply, StringType())
            _UDF_CACHE[key] = udf
        return udf(_c(x).cast("string"))
    return call


def _punycode_encode(v: str) -> str:
    return v.encode("punycode").decode("ascii")


def _punycode_decode(v: str, on_err=None):
    try:
        return v.encode("ascii").decode("punycode")
    except (UnicodeError, ValueError):
        return on_err


def _idna_encode(v: str, on_err=None):
    """Per-label ToASCII (empty input -> empty output, matching the
    reference's idnaEncode('') behavior)."""
    if v == "":
        return ""
    try:
        import encodings.idna as _idna
        out = []
        for lab in v.split("."):
            out.append(_idna.ToASCII(lab).decode("ascii") if lab else "")
        return ".".join(out)
    except (UnicodeError, ValueError):
        return on_err


def _idna_decode(v: str):
    """idnaDecode is best-effort in the reference: invalid labels pass
    through unchanged."""
    import encodings.idna as _idna
    out = []
    for lab in v.split("."):
        try:
            out.append(_idna.ToUnicode(lab))
        except (UnicodeError, ValueError):
            out.append(lab)
    return ".".join(out)


_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
_B58_INDEX = {c: i for i, c in enumerate(_B58_ALPHABET)}


def _base58_encode(v: str) -> str:
    """Bitcoin-alphabet base58 (reference
    src/Functions/FunctionBase58Conversion.h — same alphabet, same
    leading-zero-byte -> '1' rule)."""
    data = v.encode()
    n = int.from_bytes(data, "big")
    out = []
    while n:
        n, r = divmod(n, 58)
        out.append(_B58_ALPHABET[r])
    pad = 0
    for b in data:
        if b:
            break
        pad += 1
    return "1" * pad + "".join(reversed(out))


def _base58_decode(v: str, on_err=None):
    n = 0
    for c in v:
        d = _B58_INDEX.get(c)
        if d is None:
            return on_err
        n = n * 58 + d
    pad = 0
    for c in v:
        if c != "1":
            break
        pad += 1
    body = n.to_bytes((n.bit_length() + 7) // 8, "big") if n else b""
    try:
        return (b"\x00" * pad + body).decode()
    except UnicodeDecodeError:
        return on_err


def _hashlib_available(algo: str) -> bool:
    try:
        hashlib.new(algo, b"")
        return True
    except ValueError:
        return False


def build() -> tuple[dict, dict]:
    """Return (functions, aliases) merged into CH_FUNCTIONS."""
    fns = {}
    for form in ("NFC", "NFD", "NFKC", "NFKD"):
        fns[f"normalizeUTF8{form}"] = _lazy_str_udf(
            f"norm{form}",
            lambda v, _f=form: unicodedata.normalize(_f, v))

    fns["punycodeEncode"] = _lazy_str_udf("puny_enc", _punycode_encode)
    fns["punycodeDecode"] = _lazy_str_udf("puny_dec", _punycode_decode)
    fns["tryPunycodeDecode"] = _lazy_str_udf(
        "puny_trydec", lambda v: _punycode_decode(v, ""))
    fns["idnaEncode"] = _lazy_str_udf("idna_enc", _idna_encode)
    fns["tryIdnaEncode"] = _lazy_str_udf(
        "idna_tryenc", lambda v: _idna_encode(v, ""))
    fns["idnaDecode"] = _lazy_str_udf("idna_dec", _idna_decode)

    # convertCharset(s, from, to) (src/Functions/convertCharset.cpp —
    # ICU there, stdlib codecs here; charsets must be literals).  The
    # value transits as from-charset bytes latin1-wrapped in the string
    # carrier (CH String is binary-safe; latin1 is the lossless map).
    def convert_charset(x, frm, to):
        f, t = str(frm).strip("'\""), str(to).strip("'\"")
        fn = _lazy_str_udf(
            f"charset_{f}_{t}",
            lambda v: v.encode("latin1", "replace").decode(f, "replace")
            .encode(t, "replace").decode("latin1"))
        return fn(x)

    fns["convertCharset"] = convert_charset

    fns["base58Encode"] = _lazy_str_udf("b58_enc", _base58_encode)
    fns["base58Decode"] = _lazy_str_udf("b58_dec", _base58_decode)
    fns["tryBase58Decode"] = _lazy_str_udf(
        "b58_trydec", lambda v: _base58_decode(v, ""))

    # SHA224/384/512 stay on the Catalyst sha2 path (registry._HASH);
    # only the algorithms Spark lacks go through hashlib (gated on this
    # build's OpenSSL providing them).
    for name, algo in (("RIPEMD160", "ripemd160"),
                       ("SHA512_256", "sha512_256"),
                       ("MD4", "md4"),
                       ("BLAKE3", "blake3")):
        if _hashlib_available(algo):
            fns[name] = _lazy_str_udf(
                f"hash_{algo}",
                lambda v, _a=algo: hashlib.new(_a, v.encode()).hexdigest())

    fns.update(build_bech32())
    return fns, {}


# ------------------------------------------------------------------ bech32
# Reference: src/Functions/bech32.cpp (contrib bech32 / BIP-173+BIP-350
# reference code).  bech32Encode(hrp, data[, witver]) — witver > 0
# (default 1) selects the Bech32m checksum constant, 0 selects classic
# Bech32; the data BYTES are 8->5-bit repacked, not segwit-prefixed.
# bech32Decode returns (hrp, data) and empty strings on any invalid
# input, matching the reference.

_B32_CHARSET = "qpzry9x8gf2tvdw0s3jn54khce6mua7l"
_B32_INDEX = {c: i for i, c in enumerate(_B32_CHARSET)}
_BECH32M_CONST = 0x2BC830A3


def _b32_polymod(values):
    gen = (0x3B6A57B2, 0x26508E6D, 0x1EA119FA, 0x3D4233DD, 0x2A1462B3)
    chk = 1
    for v in values:
        b = chk >> 25
        chk = ((chk & 0x1FFFFFF) << 5) ^ v
        for i in range(5):
            if (b >> i) & 1:
                chk ^= gen[i]
    return chk


def _b32_hrp_expand(hrp):
    return [ord(c) >> 5 for c in hrp] + [0] + [ord(c) & 31 for c in hrp]


def _b32_convertbits(data, frombits, tobits, pad):
    acc = bits = 0
    maxv = (1 << tobits) - 1
    max_acc = (1 << (frombits + tobits - 1)) - 1
    out = []
    for value in data:
        acc = ((acc << frombits) | value) & max_acc
        bits += frombits
        while bits >= tobits:
            bits -= tobits
            out.append((acc >> bits) & maxv)
    if pad:
        if bits:
            out.append((acc << (tobits - bits)) & maxv)
    elif bits >= frombits or ((acc << (tobits - bits)) & maxv):
        return None
    return out


def bech32_encode_str(hrp: str, data: str, witver: int = 1):
    if not hrp or len(hrp) > 83:
        return ""
    const = _BECH32M_CONST if witver > 0 else 1
    d5 = _b32_convertbits(data.encode("latin1", "replace"), 8, 5, True)
    values = _b32_hrp_expand(hrp.lower()) + d5
    polymod = _b32_polymod(values + [0] * 6) ^ const
    checksum = [(polymod >> 5 * (5 - i)) & 31 for i in range(6)]
    return (hrp.lower() + "1"
            + "".join(_B32_CHARSET[d] for d in d5 + checksum))


def bech32_decode_str(s: str):
    """Return (hrp, data-bytes-as-latin1) or ('','') on invalid."""
    fail = ("", "")
    if not s or len(s) > 90 or s.lower() != s and s.upper() != s:
        return fail
    s = s.lower()
    pos = s.rfind("1")
    if pos < 1 or pos + 7 > len(s):
        return fail
    hrp, rest = s[:pos], s[pos + 1:]
    if any(c not in _B32_INDEX for c in rest):
        return fail
    data = [_B32_INDEX[c] for c in rest]
    chk = _b32_polymod(_b32_hrp_expand(hrp) + data)
    if chk not in (1, _BECH32M_CONST):
        return fail
    data_8 = _b32_convertbits(data[:-6], 5, 8, False)
    if not data_8:
        return fail
    return hrp, bytes(data_8).decode("latin1")


def build_bech32() -> dict:
    from pyspark.sql import functions as F

    def _encode_udf(witver: int):
        key = f"bech32_enc_{witver}"
        udf = _UDF_CACHE.get(key)
        if udf is None:
            import pandas as pd
            from pyspark.sql.pandas.functions import pandas_udf
            from pyspark.sql.types import StringType

            def _apply(h, d):
                return pd.Series([
                    None if hv is None or dv is None
                    else bech32_encode_str(hv, dv, witver)
                    for hv, dv in zip(h, d)])

            _apply.__annotations__ = {"h": pd.Series, "d": pd.Series,
                                      "return": pd.Series}
            udf = pandas_udf(_apply, StringType())
            _UDF_CACHE[key] = udf
        return udf

    def _decode_udf():
        udf = _UDF_CACHE.get("bech32_dec")
        if udf is None:
            import pandas as pd
            from pyspark.sql.pandas.functions import pandas_udf
            from pyspark.sql.types import (StringType, StructField,
                                           StructType)

            schema = StructType([StructField("hrp", StringType()),
                                 StructField("data", StringType())])

            def _apply(s):
                return pd.DataFrame(
                    [bech32_decode_str(v) if v is not None else ("", "")
                     for v in s], columns=["hrp", "data"])

            _apply.__annotations__ = {"s": pd.Series,
                                      "return": pd.DataFrame}
            udf = pandas_udf(_apply, schema)
            _UDF_CACHE["bech32_dec"] = udf
        return udf

    return {
        "bech32Encode": lambda hrp, data, witver=1: _encode_udf(
            int(witver))(_c(hrp).cast("string"), _c(data).cast("string")),
        "bech32Decode": lambda x: _decode_udf()(_c(x).cast("string")),
    }
