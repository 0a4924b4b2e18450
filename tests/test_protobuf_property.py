"""Property-based wire-format roundtrip for the protobuf codec
(sources/protobuf.py) — pure Python, no Spark session needed."""

import os
import sys

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_core_spark.sources.protobuf import (  # noqa: E402
    _decode_one, _field_plan, encode_length_delimited, encode_message,
)

SCHEMA = T.StructType([
    T.StructField("i", T.LongType()),
    T.StructField("s", T.StringType()),
    T.StructField("d", T.DoubleType()),
    T.StructField("f", T.FloatType()),
    T.StructField("b", T.BooleanType()),
    T.StructField("raw", T.BinaryType()),
])
PLAN = _field_plan(SCHEMA, None)

row_st = st.fixed_dictionaries({
    "i": st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
    "s": st.text(max_size=200),
    "d": st.floats(allow_nan=False, allow_infinity=True, width=64),
    "f": st.floats(allow_nan=False, allow_infinity=True, width=32),
    "b": st.booleans(),
    "raw": st.binary(max_size=100),
})


@settings(max_examples=300, deadline=None)
@given(row_st)
def test_roundtrip_single_message(values):
    decoded = _decode_one(encode_message(values, SCHEMA), PLAN)
    assert decoded["i"] == values["i"]
    assert decoded["s"] == values["s"]
    assert decoded["d"] == values["d"]
    import struct
    assert decoded["f"] == struct.unpack("<f", struct.pack("<f", values["f"]))[0]
    assert decoded["b"] == values["b"]
    assert bytes(decoded["raw"]) == values["raw"]


@settings(max_examples=50, deadline=None)
@given(st.lists(row_st, max_size=10))
def test_roundtrip_length_delimited_stream(rows):
    buf = encode_length_delimited(rows, SCHEMA)
    out = []
    pos = 0
    from clickhouse_core_spark.sources.protobuf import _read_varint
    while pos < len(buf):
        ln, pos = _read_varint(buf, pos)
        out.append(_decode_one(buf[pos:pos + ln], PLAN))
        pos += ln
    assert len(out) == len(rows)
    for got, want in zip(out, rows):
        assert got["i"] == want["i"] and got["s"] == want["s"]
