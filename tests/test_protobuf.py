"""Protobuf wire-format path (reference
src/Formats/registerFormats.cpp:57-60, ProtobufReader.h).

The wire decoder is validated against messages encoded by the sibling
encoder AND against google's documented wire examples; the JVM
spark-protobuf path is probed and exercised only when the connector jar
is present (not bundled in pip pyspark)."""

import os
import sys

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_core_spark.sources.protobuf import (  # noqa: E402
    decode_protobuf, encode_length_delimited, encode_message,
    from_protobuf_column, protobuf_available, read_protobuf,
)
from clickhouse_core_spark.sources.formats import read_format  # noqa: E402
from clickhouse_core_spark.streaming.sources import parse_value_stream  # noqa: E402

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("score", T.DoubleType()),
    T.StructField("ok", T.BooleanType()),
])

ROWS = [
    {"id": 1, "name": "alpha", "score": 1.5, "ok": True},
    {"id": -7, "name": "βeta", "score": -2.25, "ok": False},
    {"id": 1 << 40, "name": "", "score": 0.0, "ok": True},
]


def test_wire_example_matches_protoc_reference():
    # protobuf.dev encoding doc: field 1 varint 150 -> 08 96 01
    s = T.StructType([T.StructField("a", T.LongType())])
    assert encode_message({"a": 150}, s) == bytes([0x08, 0x96, 0x01])
    # field 2 string "testing" -> 12 07 74 65 73 74 69 6e 67
    s2 = T.StructType([T.StructField("b", T.StringType())])
    assert (encode_message({"b": "testing"}, s2, {"b": 2})
            == bytes([0x12, 0x07]) + b"testing")


def test_decode_roundtrip_single_messages(spark):
    payloads = [(encode_message(r, SCHEMA),) for r in ROWS]
    df = spark.createDataFrame(payloads, "value binary")
    got = sorted((r.id, r.name, r.score, r.ok)
                 for r in decode_protobuf(df, SCHEMA).collect())
    want = sorted((r["id"], r["name"], r["score"], r["ok"]) for r in ROWS)
    assert got == want


def test_negative_int_is_twos_complement_varint(spark):
    df = spark.createDataFrame(
        [(encode_message({"id": -7}, SCHEMA),)], "value binary")
    assert decode_protobuf(df, SCHEMA).first().id == -7


def test_unknown_fields_are_skipped(spark):
    # decode with a narrower schema: extra fields on the wire ignored
    narrow = T.StructType([T.StructField("id", T.LongType())])
    df = spark.createDataFrame(
        [(encode_message(ROWS[0], SCHEMA),)], "value binary")
    row = decode_protobuf(df, narrow).first()
    assert row.id == 1


def test_explicit_field_numbers(spark):
    s = T.StructType([T.StructField("x", T.LongType()),
                      T.StructField("y", T.StringType())])
    nums = {"x": 3, "y": 9}
    df = spark.createDataFrame(
        [(encode_message({"x": 42, "y": "hi"}, s, nums),)], "value binary")
    row = decode_protobuf(df, s, field_numbers=nums).first()
    assert (row.x, row.y) == (42, "hi")


def test_file_format_length_delimited(spark, tmp_path):
    path = str(tmp_path / "pb")
    os.makedirs(path)
    with open(os.path.join(path, "part-0.bin"), "wb") as fh:
        fh.write(encode_length_delimited(ROWS[:2], SCHEMA))
    with open(os.path.join(path, "part-1.bin"), "wb") as fh:
        fh.write(encode_length_delimited(ROWS[2:], SCHEMA))
    got = read_protobuf(spark, path, SCHEMA)
    assert got.count() == 3
    assert {r.name for r in got.collect()} == {"alpha", "βeta", ""}
    # and via the CH-format front door
    assert read_format(spark, path, "Protobuf", schema=SCHEMA).count() == 3


def test_parse_value_stream_protobuf(spark):
    df = spark.createDataFrame(
        [(encode_message(r, SCHEMA),) for r in ROWS], "value binary")
    out = parse_value_stream(df, "Protobuf", SCHEMA)
    assert sorted(r.id for r in out.collect()) == sorted(r["id"] for r in ROWS)


def test_jvm_path_probed_not_assumed(spark):
    # in this container the connector jar is absent: the fallback must
    # engage with a schema, and a descriptor-only call must raise the
    # named NotImplementedError rather than a py4j crash
    df = spark.createDataFrame(
        [(encode_message(ROWS[0], SCHEMA),)], "value binary")
    if protobuf_available(spark):
        pytest.skip("connector jar present; JVM path covered elsewhere")
    out = from_protobuf_column(df, "value", "M", schema=SCHEMA)
    assert out.first().name == "alpha"
    with pytest.raises(NotImplementedError, match="spark-protobuf"):
        from_protobuf_column(df, "value", "M")


def test_wire_fallback_repeated_and_nested(spark):
    from pyspark.sql import types as T
    from clickhouse_core_spark.sources.protobuf import decode_protobuf
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("tags", T.ArrayType(T.IntegerType())),
        T.StructField("names", T.ArrayType(T.StringType())),
        T.StructField("meta", T.StructType([
            T.StructField("k", T.StringType()),
            T.StructField("n", T.LongType())])),
        T.StructField("subs", T.ArrayType(T.StructType([
            T.StructField("x", T.LongType())])))])
    rows = [{"id": 7, "tags": [1, 2, 300], "names": ["a", "bé"],
             "meta": {"k": "kk", "n": -5},
             "subs": [{"x": 1}, {"x": 2}]},
            {"id": 8, "tags": [], "names": [], "meta": None,
             "subs": []}]
    from clickhouse_core_spark.sources.protobuf import encode_message
    df = spark.createDataFrame(
        [(bytearray(encode_message(r, schema)),) for r in rows],
        "value binary")
    out = sorted(decode_protobuf(df, schema).collect(),
                 key=lambda r: r.id)
    assert out[0].id == 7 and out[0].tags == [1, 2, 300]
    assert out[0].names == ["a", "bé"]
    assert out[0].meta.k == "kk" and out[0].meta.n == -5
    assert [s.x for s in out[0].subs] == [1, 2]
    assert out[1].id == 8 and (out[1].tags or []) == []
