"""Iceberg partition transforms (reference src/Functions/ — the
icebergBucket / icebergHash / icebergTruncate functions the reference
registers for Iceberg partition-pruning parity; the algorithm itself is
the PUBLIC Apache Iceberg spec, Appendix B "32-bit Hash Requirements":
murmur3_x86_32 with seed 0 over the type's canonical byte encoding).

Everything here is pure Catalyst expression math — no UDFs — so the
transforms participate in whole-stage codegen and can be used as
partition-pruning predicates on 100 TB Iceberg-layout tables.

Implementation notes:
- 32-bit modular arithmetic is carried in BIGINT with explicit masking;
  multiplications split the 32-bit operand into 16-bit halves so no
  intermediate exceeds 2^48 (BIGINT-safe even under ANSI overflow
  checks).
- The hash rounds are expressed as F.aggregate() FOLDS whose lambda
  variables act as let-bindings: a naively nested expression duplicates
  the accumulator subtree ~6x per round (exponential Catalyst tree),
  while a fold keeps every accumulator reference a leaf node.

Spec vectors asserted in tests/test_iceberg_transforms.py:
  hashLong(34)              = 2017239379
  hashString('iceberg')     = 1210000089
  hashDate('2017-11-16')    = -653330422
  hashTimestamp(2017-11-16T22:31:08) = -2047944441
  hashBytes(00 01 02 03)    = -188683207
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_M32 = 0xFFFFFFFF
_C1 = 0xCC9E2D51
_C2 = 0x1B873593


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


def _u32(x: Column) -> Column:
    return x.bitwiseAND(F.lit(_M32))


def _mul32(x: Column, c) -> Column:
    """(x * c) mod 2^32 without 64-bit overflow: 16-bit split.  ``c``
    may be a python int or a (already-masked u32) Column."""
    cc = _c(c)
    lo = x.bitwiseAND(F.lit(0xFFFF)) * cc
    hi = F.shiftright(x, 16).bitwiseAND(F.lit(0xFFFF)) * cc
    return _u32(lo + F.shiftleft(hi.bitwiseAND(F.lit(0xFFFF)), 16))


def _rotl32(x: Column, r: int) -> Column:
    return _u32(F.shiftleft(x, r).bitwiseOR(F.shiftright(x, 32 - r)))


def _mix(h: Column, k: Column) -> Column:
    """One murmur3 body round.  Only called with FOLD LAMBDA VARIABLES
    as h/k (leaf nodes), so the internal duplication is constant-size."""
    k = _mul32(k, _C1)
    k = _rotl32(k, 15)
    k = _mul32(k, _C2)
    h = _u32(h.bitwiseXOR(k))
    h = _rotl32(h, 13)
    return _u32(_mul32(h, 5) + F.lit(0xE6546B64))


def _finish(h0: Column, n: Column) -> Column:
    """len-xor + fmix32 avalanche as a fold over step descriptors, so
    ``h0`` (an arbitrarily large expression) is referenced exactly once
    (as the fold's init) and each avalanche step sees only leaves.
    Step = (h ^ x), then ^= h>>s when s>0, then *= m (mod 2^32)."""
    def st(s: int, m: int, x: Column) -> Column:
        return F.struct(F.lit(s).alias("s"), F.lit(m).alias("m"),
                        x.cast("long").alias("x"))

    steps = F.array(
        st(0, 1, n),                       # h ^= len
        st(16, 0x85EBCA6B, F.lit(0)),      # h ^= h>>16; h *= c
        st(13, 0xC2B2AE35, F.lit(0)),      # h ^= h>>13; h *= c
        st(16, 1, F.lit(0)),               # h ^= h>>16
    )

    def step(h: Column, p: Column) -> Column:
        h1 = h.bitwiseXOR(p["x"])
        h2 = F.when(p["s"] > 0, h1.bitwiseXOR(
            F.floor(h1 / F.pow(F.lit(2.0), p["s"])).cast("long")
        )).otherwise(h1)
        return _mul32(h2, p["m"])

    return F.aggregate(steps, h0.cast("long"), step)


def _signed32(h: Column) -> Column:
    return (F.when(h > F.lit(0x7FFFFFFF), h - F.lit(1 << 32))
            .otherwise(h).cast("int"))


def _hash_long(v: Column) -> Column:
    """murmur3_x86_32(little-endian 8 bytes of v), seed 0 — the Iceberg
    encoding for int, long, date (days), time/timestamp (micros)."""
    v = v.cast("long")
    chunks = F.array(v.bitwiseAND(F.lit(_M32)),
                     F.shiftright(v, 32).bitwiseAND(F.lit(_M32)))
    h = F.aggregate(chunks, F.lit(0).cast("long"), _mix)
    return _signed32(_finish(h, F.lit(8)))


def _byte_at(hx: Column, j: Column) -> Column:
    """Byte value at 0-based index j of a hex string (2 chars/byte)."""
    return F.conv(F.substring(hx, (j * 2 + 1).cast("int"), F.lit(2)),
                  16, 10).cast("long")


def _hash_bytes(b: Column) -> Column:
    """murmur3_x86_32 over arbitrary bytes (Iceberg string/binary/uuid
    encodings): 4-byte little-endian chunk fold + 1-3 byte tail.  The
    fold is F.aggregate over chunk indexes — Catalyst-native, no UDF."""
    hx = F.hex(b)
    n = (F.length(hx) / 2).cast("long")
    nchunks = (n / 4).cast("long")

    def chunk(i: Column) -> Column:
        base = i * 4
        return (_byte_at(hx, base)
                + F.shiftleft(_byte_at(hx, base + 1), 8)
                + F.shiftleft(_byte_at(hx, base + 2), 16)
                + F.shiftleft(_byte_at(hx, base + 3), 24))

    body = F.when(
        nchunks > 0,
        F.aggregate(F.sequence(F.lit(0).cast("long"), nchunks - 1),
                    F.lit(0).cast("long"),
                    lambda h, i: _mix(h, chunk(i)))
    ).otherwise(F.lit(0).cast("long"))

    r = n % 4
    tail_base = nchunks * 4
    k1 = (F.when(r >= 1, _byte_at(hx, tail_base)).otherwise(F.lit(0))
          + F.when(r >= 2, F.shiftleft(_byte_at(hx, tail_base + 1), 8))
          .otherwise(F.lit(0))
          + F.when(r >= 3, F.shiftleft(_byte_at(hx, tail_base + 2), 16))
          .otherwise(F.lit(0)))
    k1 = _mul32(_rotl32(_mul32(k1, _C1), 15), _C2)
    # fold the tail-xor in via a 1-step aggregate so `body` is
    # referenced once (it embeds the chunk fold)
    h = F.aggregate(
        F.array(F.when(r > 0, k1).otherwise(F.lit(0)).cast("long")),
        body, lambda h, k: _u32(h.bitwiseXOR(k)))
    return _signed32(_finish(h, n))


def icebergHash(x, kind: str = "long") -> Column:
    """Iceberg bucket-transform hash (spec Appendix B).  ``kind``
    selects the canonical encoding: 'long'/'int' (8-byte LE),
    'date' (days from epoch as long), 'timestamp' (micros as long),
    'string' (UTF-8 bytes), 'binary' (raw bytes)."""
    c = _c(x)
    if kind in ("long", "int"):
        return _hash_long(c)
    if kind == "date":
        return _hash_long(F.datediff(c, F.lit("1970-01-01")))
    if kind == "timestamp":
        return _hash_long(F.unix_micros(c))
    if kind == "string":
        return _hash_bytes(F.encode(c, "UTF-8"))
    if kind == "binary":
        return _hash_bytes(c.cast("binary"))
    raise ValueError(f"icebergHash: unsupported kind {kind!r}")


def icebergBucket(n: int, x, kind: str = "long") -> Column:
    """bucket[n](v) = (hash(v) & Integer.MAX_VALUE) % n  (Iceberg spec
    partition transform; NULL stays NULL)."""
    h = icebergHash(x, kind).cast("long")
    return (h.bitwiseAND(F.lit(0x7FFFFFFF)) % F.lit(int(n))).cast("int")


def icebergTruncate(w: int, x, kind: str = "long") -> Column:
    """truncate[w](v): ints -> v - (((v % w) + w) % w)  (floor to the
    bucket lower bound, negative-safe); strings -> first w characters
    (Iceberg truncates at codepoints, matching substring).  Width must
    be a positive integer and floats are not truncatable (the
    reference's BAD_ARGUMENTS checks)."""
    if int(w) <= 0:
        raise ValueError("icebergTruncate: width must be positive")
    if isinstance(x, float):
        raise ValueError(
            "icebergTruncate: floating-point values are not "
            "truncatable")
    c = _c(x)
    if kind in ("long", "int"):
        v = c.cast("long")
        w_ = F.lit(int(w))
        out = v - (((v % w_) + w_) % w_)
        return out.cast("int") if kind == "int" else out
    if kind == "string":
        return F.substring(c, 1, int(w))
    raise ValueError(f"icebergTruncate: unsupported kind {kind!r}")


# ------------------------------------------------------------------ SQL
# DuckDB mirror of the long-path hash, used by the oracle entry: the
# same published algorithm spelled as portable SQL via a chain of CTE
# columns (each round materializes a named column — DuckDB's planner
# handles the flat chain fine; no exponential nesting because each
# round references the PREVIOUS ROUND'S ALIAS, not its expression).

ICEBERG = {
    "icebergHash": icebergHash,
    "icebergBucket": icebergBucket,
    "icebergTruncate": icebergTruncate,
}


def _sql_u32(x: str) -> str:
    return f"({x}) & 4294967295"


def _sql_mul32(x: str, c: int) -> str:
    return _sql_u32(f"(({x}) & 65535) * {c} "
                    f"+ ((((({x}) >> 16) & 65535) * {c} & 65535) << 16)")


def _sql_rotl32(x: str, r: int) -> str:
    return _sql_u32(f"(({x}) << {r}) | (({x}) >> {32 - r})")


def iceberg_hash_long_sql(col: str, val: str = "v") -> str:
    """DuckDB SQL: a correlated scalar subquery computing icebergHash
    of BIGINT expression ``col`` — each murmur round is a LATERAL-style
    chained CTE column, so the text stays linear in rounds."""
    # build as nested SELECTs: s0 -> s1 -> ... each adds one column
    c0 = _sql_u32(f"CAST({col} AS BIGINT)")
    c1 = _sql_u32(f"(CAST({col} AS BIGINT) >> 32)")
    steps = []
    # round 1: h = mix(0, c0)
    steps.append(("k1", _sql_mul32(_sql_rotl32(_sql_mul32(c0, _C1), 15),
                                   _C2)))
    steps.append(("h1", _sql_u32(f"({_sql_mul32(_sql_rotl32(_sql_u32('xor(0, k1)'), 13), 5)}) + 3864292196")))
    # round 2: h = mix(h1, c1)
    steps.append(("k2", _sql_mul32(_sql_rotl32(_sql_mul32(c1, _C1), 15),
                                   _C2)))
    steps.append(("h2", _sql_u32(f"({_sql_mul32(_sql_rotl32(_sql_u32('xor(h1, k2)'), 13), 5)}) + 3864292196")))
    # finish: h ^= 8; fmix
    steps.append(("h3", "xor(h2, 8)"))
    steps.append(("h4", _sql_mul32("xor(h3, h3 >> 16)", 0x85EBCA6B)))
    steps.append(("h5", _sql_mul32("xor(h4, h4 >> 13)", 0xC2B2AE35)))
    steps.append(("h6", "xor(h5, h5 >> 16)"))
    inner = "SELECT 1 AS one"
    for name, expr in steps:
        inner = f"SELECT *, ({expr}) AS {name} FROM ({inner})"
    return (f"(SELECT CAST(CASE WHEN h6 > 2147483647 "
            f"THEN h6 - 4294967296 ELSE h6 END AS INTEGER) "
            f"FROM ({inner}))")
