"""Iceberg partition transforms: bit-exact murmur3_x86_32 (seed 0) per
the PUBLIC Apache Iceberg spec Appendix B, as pure Catalyst expressions
(functions/iceberg.py).  Spec vectors from the spec's own table, plus a
property cross-check against an INDEPENDENT DuckDB-SQL implementation
of the same algorithm (iceberg_hash_long_sql — the oracle carrier)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from clickhouse_core_spark.functions.iceberg import (
    icebergBucket,
    icebergHash,
    icebergTruncate,
    iceberg_hash_long_sql,
)


def test_spec_vectors(spark):
    r = spark.range(1).select(
        icebergHash(F.lit(34), "long").alias("h_long"),
        icebergHash(F.lit(34), "int").alias("h_int"),
        icebergHash(F.lit("iceberg"), "string").alias("h_str"),
        icebergHash(F.lit("2017-11-16").cast("date"), "date")
        .alias("h_date"),
        icebergHash(F.lit("2017-11-16 22:31:08").cast("timestamp"),
                    "timestamp").alias("h_ts"),
        icebergHash(F.unhex(F.lit("00010203")), "binary").alias("h_bin"),
        icebergHash(F.lit(None).cast("long"), "long").alias("h_null"),
    ).first()
    assert r.h_long == 2017239379          # hashLong(34), spec table
    assert r.h_int == 2017239379           # int hashes as long
    assert r.h_str == 1210000089           # hashString('iceberg')
    assert r.h_date == -653330422          # 2017-11-16 (days=17486)
    assert r.h_ts == -2047944441           # micros since epoch (UTC)
    assert r.h_bin == -188683207           # bytes 00 01 02 03
    assert r.h_null is None                # NULL stays NULL


def test_bucket_and_truncate(spark):
    r = spark.range(1).select(
        icebergBucket(16, F.lit(34), "long").alias("b16"),
        icebergBucket(7, F.lit("iceberg"), "string").alias("b7"),
        icebergTruncate(10, F.lit(-17), "int").alias("t_neg"),
        icebergTruncate(10, F.lit(27), "long").alias("t_pos"),
        icebergTruncate(3, F.lit("iceberg"), "string").alias("t_str"),
    ).first()
    assert r.b16 == (2017239379 & 0x7FFFFFFF) % 16
    assert r.b7 == (1210000089 & 0x7FFFFFFF) % 7
    assert r.t_neg == -20                  # floor-to-bucket, spec example
    assert r.t_pos == 20
    assert r.t_str == "ice"


def _mm3_py(data: bytes) -> int:
    """Tiny reference murmur3_x86_32 (public algorithm) for the
    string-tail property test."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = 0
    n = len(data)
    for i in range(0, n - n % 4, 4):
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[n - n % 4:]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - (1 << 32) if h > 0x7FFFFFFF else h


def test_string_tail_residues(spark):
    """Strings of length 0..9 cover all chunk/tail residue shapes."""
    vals = ["", "a", "ab", "abc", "abcd", "abcde", "abcdef", "abcdefg",
            "abcdefgh", "abcdefghi"]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {r.s: r.h for r in
           df.select("s", icebergHash(F.col("s"), "string").alias("h"))
           .collect()}
    for v in vals:
        assert got[v] == _mm3_py(v.encode()), v


def test_long_hash_matches_duckdb_mirror(spark):
    """Property: the Catalyst expression and the DuckDB-SQL mirror are
    two independent spellings of the same published algorithm — they
    must agree on arbitrary longs (incl. negatives)."""
    vals = [0, 1, -1, 34, 2**31, -2**31, 2**62, -2**62, 123456789012345,
            -987654321098765, 42, 7, 999999999999999999]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r.v: r.h for r in
           df.select("v", icebergHash(F.col("v"), "long").alias("h"))
           .collect()}
    con = duckdb.connect()
    expr = iceberg_hash_long_sql("t.v")
    values = ", ".join(f"({v})" for v in vals)
    want = dict(con.sql(
        f"SELECT t.v, {expr} AS h FROM (VALUES {values}) t(v)").fetchall())
    assert got == want


def test_registry_exposure(spark):
    from clickhouse_core_spark.functions import ch
    r = spark.range(1).select(
        ch.icebergBucket(4, F.lit(34)).alias("b"),
        ch.reinterpret(F.lit("\x01"), "UInt32").alias("ri"),
        ch.partitionId(F.lit(202401)).alias("pid"),
        ch.partitionId(F.lit("2024-01-15").cast("date")).alias("pd"),
    ).first()
    assert r.b == (2017239379 & 0x7FFFFFFF) % 4
    assert r.ri == 1
    assert r.pid == "202401"
    assert r.pd == "20240115"
    with pytest.raises(NotImplementedError):
        ch.partitionId(F.lit(1), F.lit(2))
