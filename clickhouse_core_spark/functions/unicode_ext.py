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

    return fns, {}
