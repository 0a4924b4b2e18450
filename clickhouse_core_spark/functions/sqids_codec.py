"""Sqids ID codec (reference src/Functions/sqid.cpp — sqids-cpp there;
this is the public sqids v0.4 spec algorithm, validated against the
spec's published vectors, e.g. encode([1,2,3]) = '86Rf07').

Scope: default alphabet, minLength 0, and NO blocklist re-encoding (the
blocklist is a curse-word data file, not algorithm — encodings that the
reference would re-roll because of a blocklist hit differ; documented in
LIMITS.md).

Execution shape: Arrow-batched pandas UDFs over an array<long> carrier
(sqidEncode packs its variadic numeric args into one array column).
"""

from __future__ import annotations

_DEFAULT_ALPHABET = ("abcdefghijklmnopqrstuvwxyz"
                     "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789")


def _shuffle(alphabet: str) -> str:
    chars = list(alphabet)
    i, j = 0, len(chars) - 1
    while j > 0:
        r = (i * j + ord(chars[i]) + ord(chars[j])) % len(chars)
        chars[i], chars[r] = chars[r], chars[i]
        i += 1
        j -= 1
    return "".join(chars)


_ALPHABET = _shuffle(_DEFAULT_ALPHABET)


def _to_id(num: int, alphabet: str) -> str:
    out = []
    n = len(alphabet)
    while True:
        out.append(alphabet[num % n])
        num //= n
        if num == 0:
            break
    return "".join(reversed(out))


def _to_number(s: str, alphabet: str) -> int:
    n = len(alphabet)
    v = 0
    for c in s:
        v = v * n + alphabet.index(c)
    return v


def sqid_encode(numbers: list[int]) -> str:
    if not numbers:
        return ""
    if any(v < 0 for v in numbers):
        raise ValueError("sqids encodes non-negative integers only")
    alphabet = _ALPHABET
    offset = len(numbers)
    for i, v in enumerate(numbers):
        offset += ord(alphabet[v % len(alphabet)]) + i
    offset %= len(alphabet)
    alphabet = alphabet[offset:] + alphabet[:offset]
    prefix = alphabet[0]
    alphabet = alphabet[::-1]
    ret = [prefix]
    for i, num in enumerate(numbers):
        ret.append(_to_id(num, alphabet[1:]))
        if i < len(numbers) - 1:
            ret.append(alphabet[0])
            alphabet = _shuffle(alphabet)
    return "".join(ret)


def sqid_decode(sqid: str) -> list[int]:
    if not sqid:
        return []
    alphabet = _ALPHABET
    if any(c not in alphabet for c in sqid):
        return []
    prefix = sqid[0]
    offset = alphabet.index(prefix)
    alphabet = alphabet[offset:] + alphabet[:offset]
    alphabet = alphabet[::-1]
    rest = sqid[1:]
    out = []
    while rest:
        sep = alphabet[0]
        chunks = rest.split(sep, 1)
        if chunks[0] == "":
            return out  # separator-only tail: malformed, stop
        out.append(_to_number(chunks[0], alphabet[1:]))
        if len(chunks) == 1:
            break
        rest = chunks[1]
        alphabet = _shuffle(alphabet)
    return out


def build() -> tuple[dict, dict]:
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    from .unicode_ext import _UDF_CACHE

    def _c(x) -> Column:
        return x if isinstance(x, Column) else (
            F.col(x) if isinstance(x, str) else F.lit(x))

    def _encode_udf():
        udf = _UDF_CACHE.get("sqid_enc")
        if udf is None:
            import pandas as pd
            from pyspark.sql.pandas.functions import pandas_udf
            from pyspark.sql.types import StringType

            def _apply(s):
                return s.map(lambda v: None if v is None
                             else sqid_encode([int(x) for x in v]))

            _apply.__annotations__ = {"s": pd.Series, "return": pd.Series}
            udf = pandas_udf(_apply, StringType())
            _UDF_CACHE["sqid_enc"] = udf
        return udf

    def _decode_udf():
        udf = _UDF_CACHE.get("sqid_dec")
        if udf is None:
            import pandas as pd
            from pyspark.sql.pandas.functions import pandas_udf
            from pyspark.sql.types import ArrayType, LongType

            def _apply(s):
                return s.map(lambda v: None if v is None
                             else sqid_decode(str(v)))

            _apply.__annotations__ = {"s": pd.Series, "return": pd.Series}
            udf = pandas_udf(_apply, ArrayType(LongType()))
            _UDF_CACHE["sqid_dec"] = udf
        return udf

    fns = {
        "sqidEncode": lambda *xs: _encode_udf()(
            F.array(*[_c(x).cast("long") for x in xs])),
        "sqidDecode": lambda x: _decode_udf()(_c(x).cast("string")),
    }
    return fns, {"sqid": "sqidEncode"}
