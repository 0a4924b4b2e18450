"""ClickHouse Native format codec roundtrips (reference
src/Formats/NativeReader.cpp / NativeWriter.cpp; layout documented in
sources/nativefmt.py)."""

import datetime as dt
import os
import shutil
import tempfile

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T

from clickhouse_core_spark.sources import read_format
from clickhouse_core_spark.sources.nativefmt import (
    decode_native_blob, encode_native, infer_native_schema, read_native,
)

SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("name", T.StringType(), True),
    T.StructField("score", T.DoubleType(), True),
    T.StructField("flag", T.BooleanType(), True),
    T.StructField("small", T.IntegerType(), True),
    T.StructField("tags", T.ArrayType(T.LongType()), True),
])

ROWS = [
    {"id": 1, "name": "alpha", "score": 1.5, "flag": True, "small": -3,
     "tags": [1, 2, 3]},
    {"id": 2, "name": "béta✓", "score": -2.25, "flag": False, "small": 0,
     "tags": []},
    {"id": 3, "name": None, "score": None, "flag": None, "small": None,
     "tags": None},
    {"id": -9, "name": "", "score": 0.0, "flag": True, "small": 2 ** 30,
     "tags": [-5]},
]


@pytest.fixture
def workdir():
    d = tempfile.mkdtemp(prefix="ccs_native_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _key(r):
    # Native has no Nullable(Array) (the reference forbids it) — a NULL
    # array encodes as the empty array
    tags = r["tags"]
    return (r["id"], r["name"], r["score"], r["flag"], r["small"],
            tuple(tags) if tags is not None else ())


def test_blob_roundtrip_pure_python():
    blob = encode_native(ROWS, SCHEMA)
    names, types, cols = decode_native_blob(blob)
    assert names == [f.name for f in SCHEMA.fields]
    assert types[0] == "Int64" and types[1] == "Nullable(String)"
    assert cols["id"] == [1, 2, 3, -9]
    assert cols["name"] == ["alpha", "béta✓", None, ""]
    assert cols["tags"][0] == [1, 2, 3]


def test_multi_block_concat():
    blob = encode_native(ROWS, SCHEMA, block_rows=2)  # forces 2 blocks
    _n, _t, cols = decode_native_blob(blob)
    assert cols["id"] == [1, 2, 3, -9]


def test_schema_inference():
    blob = encode_native(ROWS, SCHEMA)
    inferred = infer_native_schema(blob)
    assert [f.name for f in inferred.fields] == \
        [f.name for f in SCHEMA.fields]
    assert isinstance(inferred["score"].dataType, T.DoubleType)
    assert inferred["name"].nullable and not inferred["id"].nullable


def test_read_native_spark(spark, workdir):
    blob = encode_native(ROWS, SCHEMA)
    with open(os.path.join(workdir, "data.native"), "wb") as fh:
        fh.write(blob)
    # explicit schema
    df = read_format(spark, workdir, "Native", schema=SCHEMA)
    assert sorted(_key(r.asDict()) for r in df.collect()) == \
        sorted(_key(r) for r in ROWS)
    # self-describing inference path
    df2 = read_native(spark, workdir)
    assert sorted(_key(r.asDict()) for r in df2.collect()) == \
        sorted(_key(r) for r in ROWS)


def test_datetime_and_date_columns(spark, workdir):
    schema = T.StructType([
        T.StructField("d", T.DateType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ])
    rows = [{"d": dt.date(2021, 3, 14),
             "ts": dt.datetime(2021, 3, 14, 9, 26, 53, 589793)},
            {"d": dt.date(1970, 1, 1), "ts": dt.datetime(1970, 1, 1)}]
    blob = encode_native(rows, schema)
    _n, types, cols = decode_native_blob(blob)
    assert types == ["Date", "DateTime64(6)"]
    assert cols["d"] == [dt.date(2021, 3, 14), dt.date(1970, 1, 1)]
    assert cols["ts"][0] == dt.datetime(2021, 3, 14, 9, 26, 53, 589793)


def test_uint64_reinterpret():
    # decoding a UInt64 column with the top bit set lands on the
    # two's-complement long; re-encoding restores the original bytes
    import struct
    from clickhouse_core_spark.sources.nativefmt import (
        _decode_column, _encode_column)
    out = bytearray()
    _encode_column(out, [-1], "UInt64")         # 2^64 - 1
    assert bytes(out) == struct.pack("<Q", (1 << 64) - 1)
    vals, _ = _decode_column(bytes(out), 0, "UInt64", 1)
    assert vals == [-1]


def test_unmapped_type_raises():
    from clickhouse_core_spark.sources.nativefmt import _ch_type_to_spark
    # LowCardinality now maps to its inner type
    assert isinstance(_ch_type_to_spark("LowCardinality(String)"),
                      T.StringType)
    # AggregateFunction now carries as opaque BINARY state
    assert isinstance(_ch_type_to_spark("AggregateFunction(sum, UInt64)"),
                      T.BinaryType)
    with pytest.raises(NotImplementedError, match="not mapped"):
        _ch_type_to_spark("Tuple(UInt8, String)")


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(
    st.integers(min_value=-2 ** 63, max_value=2 ** 63 - 1),
    st.one_of(st.none(), st.text(max_size=40)),
    st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                   width=64)),
    st.one_of(st.none(), st.lists(st.integers(min_value=-10 ** 9,
                                              max_value=10 ** 9),
                                  max_size=5)),
), max_size=30))
def test_native_property_roundtrip(tuples):
    schema = T.StructType([
        T.StructField("a", T.LongType(), False),
        T.StructField("b", T.StringType(), True),
        T.StructField("c", T.DoubleType(), True),
        T.StructField("d", T.ArrayType(T.IntegerType()), True),
    ])
    rows = [{"a": a, "b": b, "c": c, "d": d} for a, b, c, d in tuples]
    _n, _t, cols = decode_native_blob(encode_native(rows, schema,
                                                    block_rows=7))
    assert cols.get("a", []) == [r["a"] for r in rows]
    assert cols.get("b", []) == [r["b"] for r in rows]
    assert cols.get("c", []) == [r["c"] for r in rows]
    assert cols.get("d", []) == [r["d"] if r["d"] is not None else []
                                 for r in rows]


# ------------------------------------------------------------ CapnProto
def test_capnproto_roundtrip_spark(spark, workdir):
    from clickhouse_core_spark.sources.capnproto import encode_capnproto
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("flag", T.BooleanType()),
        T.StructField("small", T.ShortType())])
    rows = [{"id": 1, "name": "alpha", "score": 1.5, "flag": True,
             "small": -3},
            {"id": -9, "name": "ünïcødé", "score": -0.25, "flag": False,
             "small": 300}]
    with open(os.path.join(workdir, "rows.capnp.bin"), "wb") as fh:
        fh.write(encode_capnproto(rows, schema))
    df = read_format(spark, workdir, "CapnProto", schema=schema)
    got = sorted((r.id, r.name, r.score, r.flag, r.small)
                 for r in df.collect())
    assert got == sorted((r["id"], r["name"], r["score"], r["flag"],
                          r["small"]) for r in rows)


def test_capnproto_unsupported_type():
    from clickhouse_core_spark.sources.capnproto import _layout
    # lists of pointers (composite) stay out of scope
    with pytest.raises(NotImplementedError, match="CapnProto"):
        _layout(T.StructType([
            T.StructField("a", T.ArrayType(T.StringType()))]))
    with pytest.raises(NotImplementedError, match="CapnProto"):
        _layout(T.StructType([
            T.StructField("a", T.MapType(T.StringType(), T.LongType()))]))


def test_capnproto_typed_scalar_lists():
    from clickhouse_core_spark.sources.capnproto import (
        decode_capnproto_blob, encode_capnproto)
    schema = T.StructType([
        T.StructField("i8", T.ArrayType(T.ByteType())),
        T.StructField("i16", T.ArrayType(T.ShortType())),
        T.StructField("i32", T.ArrayType(T.IntegerType())),
        T.StructField("i64", T.ArrayType(T.LongType())),
        T.StructField("f32", T.ArrayType(T.FloatType())),
        T.StructField("f64", T.ArrayType(T.DoubleType())),
        T.StructField("bl", T.ArrayType(T.BooleanType())),
        T.StructField("tag", T.StringType())])
    rows = [
        {"i8": [1, -2, 127], "i16": [300, -4], "i32": [1 << 20],
         "i64": [1 << 40, -(1 << 40)], "f32": [0.5, -1.25],
         "f64": [3.5], "bl": [True, False, True, True, False,
                              True, False, False, True], "tag": "x"},
        {"i8": [], "i16": None, "i32": [0], "i64": [],
         "f32": [], "f64": [], "bl": [], "tag": None},
    ]
    out = decode_capnproto_blob(encode_capnproto(rows, schema), schema)
    assert out[0] == rows[0]
    assert out[1]["i8"] == [] and out[1]["i16"] is None
    assert out[1]["bl"] == [] and out[1]["tag"] is None


def test_capnproto_nested_structs():
    from clickhouse_core_spark.sources.capnproto import (
        decode_capnproto_blob, encode_capnproto)
    inner = T.StructType([
        T.StructField("x", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("flags", T.ArrayType(T.BooleanType()))])
    deep = T.StructType([
        T.StructField("lvl", T.IntegerType()),
        T.StructField("leaf", inner)])
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("meta", inner),
        T.StructField("nest", deep),
        T.StructField("tail", T.StringType())])
    rows = [
        {"id": 1,
         "meta": {"x": 42, "name": "alpha", "flags": [True, False]},
         "nest": {"lvl": 2,
                  "leaf": {"x": -7, "name": "leafy", "flags": []}},
         "tail": "end"},
        {"id": 2, "meta": None, "nest": None, "tail": None},
    ]
    out = decode_capnproto_blob(encode_capnproto(rows, schema), schema)
    assert out[0] == rows[0]
    assert out[1] == rows[1]


def test_capnproto_nested_through_spark(spark, workdir):
    import os
    from clickhouse_core_spark.sources.capnproto import (
        encode_capnproto, read_capnproto)
    inner = T.StructType([
        T.StructField("lat", T.DoubleType()),
        T.StructField("lon", T.DoubleType())])
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("loc", inner),
        T.StructField("samples", T.ArrayType(T.IntegerType()))])
    rows = [{"id": i, "loc": {"lat": i * 1.5, "lon": -i * 0.5},
             "samples": list(range(i % 4))} for i in range(10)]
    d = os.path.join(workdir, "capnp_nested")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "t.capnp.bin"), "wb") as fh:
        fh.write(encode_capnproto(rows, schema))
    got = sorted(read_capnproto(spark, d, schema).collect(),
                 key=lambda r: r.id)
    assert len(got) == 10
    assert got[3].loc.lat == 4.5 and got[3].loc.lon == -1.5
    assert got[3].samples == [0, 1, 2]


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(
    st.integers(min_value=-2 ** 63, max_value=2 ** 63 - 1),
    st.one_of(st.none(), st.text(max_size=30)),
    st.booleans(),
), max_size=20))
def test_capnproto_property_roundtrip(tuples):
    from clickhouse_core_spark.sources.capnproto import (
        decode_capnproto_blob, encode_capnproto)
    schema = T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("b", T.StringType()),
        T.StructField("c", T.BooleanType())])
    rows = [{"a": a, "b": b, "c": c} for a, b, c in tuples]
    out = decode_capnproto_blob(encode_capnproto(rows, schema), schema)
    assert [(r["a"], r["b"], r["c"]) for r in out] == \
        [(r["a"], r["b"], r["c"]) for r in rows]


def test_lowcardinality_column_roundtrip():
    from clickhouse_core_spark.sources.nativefmt import (
        _decode_column, _encode_column)
    for ch_t, vals in (
            ("LowCardinality(String)", ["a", "b", "a", "c"]),
            ("LowCardinality(Nullable(String))",
             ["x", None, "x", "y", None]),
            ("LowCardinality(Int64)", [7, 7, -2, 7])):
        out = bytearray()
        _encode_column(out, vals, ch_t)
        back, pos = _decode_column(bytes(out), 0, ch_t, len(vals))
        assert back == vals and pos == len(out), ch_t


def test_lowcardinality_global_dictionary_mode():
    """Shared-global-dictionary layout (reference
    SerializationLowCardinality.cpp: NeedGlobalDictionaryBit /
    NeedUpdateDictionary; overflow indexes hit additional keys at
    idx - len(global), mapIndexWithAdditionalKeys :325)."""
    import struct
    from clickhouse_core_spark.sources.nativefmt import (
        _decode_column, _encode_column)
    # encoder global mode round-trips, incl. nullable null-slot-0
    for ch_t, vals in (
            ("LowCardinality(String)", ["a", "b", "a", "c", "b"]),
            ("LowCardinality(Nullable(String))",
             ["x", None, "x", "y", None]),
            ("LowCardinality(Int32)", [5, 5, -1, 5])):
        out = bytearray()
        _encode_column(out, vals, ch_t, "global")
        state: dict = {}
        back, pos = _decode_column(bytes(out), 0, ch_t, len(vals), state)
        assert back == vals and pos == len(out), ch_t
        assert "global" in state  # dictionary captured for later blocks

    # hand-built: global dict [a,b] + additional keys [c]; indexes 0,1,2
    # → a, b, c (overflow index 2 = additional[2 - 2])
    blob = bytearray()
    blob.extend(struct.pack("<Q", 1))                       # key version
    blob.extend(struct.pack("<Q", 0 | (1 << 8) | (1 << 9) | (1 << 10)))
    blob.extend(struct.pack("<Q", 2))                       # global dict
    for s in (b"a", b"b"):
        blob.append(len(s)); blob.extend(s)
    blob.extend(struct.pack("<Q", 1))                       # additional
    blob.append(1); blob.extend(b"c")
    blob.extend(struct.pack("<Q", 3))                       # num rows
    blob.extend(struct.pack("<3B", 0, 1, 2))
    vals, pos = _decode_column(bytes(blob), 0,
                               "LowCardinality(String)", 3, {})
    assert vals == ["a", "b", "c"] and pos == len(blob)


def test_lowcardinality_global_dict_shared_across_blocks():
    """A later block with NeedGlobalDictionary but NO update bit reuses
    the dictionary captured from the earlier block (per-stream state)."""
    import struct
    from clickhouse_core_spark.sources.nativefmt import (
        _encode_column, decode_native_blob)
    from clickhouse_core_spark.sources.rowformats import _put_varint

    def header(blob, nrows):
        _put_varint(blob, 1)
        _put_varint(blob, nrows)
        name, ch = b"cat", b"LowCardinality(String)"
        _put_varint(blob, len(name)); blob.extend(name)
        _put_varint(blob, len(ch)); blob.extend(ch)

    blob = bytearray()
    header(blob, 3)
    _encode_column(blob, ["x", "y", "x"], "LowCardinality(String)",
                   "global")                        # dict written here
    header(blob, 2)
    blob.extend(struct.pack("<Q", 1))               # key version
    blob.extend(struct.pack("<Q", 0 | (1 << 8)))    # global, NO update
    blob.extend(struct.pack("<Q", 2))               # num rows
    blob.extend(struct.pack("<2B", 1, 0))           # indexes into shared dict
    names, types, cols = decode_native_blob(bytes(blob))
    assert cols["cat"] == ["x", "y", "x", "y", "x"]


def test_simple_and_opaque_aggregate_function_columns():
    from clickhouse_core_spark.sources.nativefmt import (
        _ch_type_to_spark, _decode_column, _encode_column)
    # SimpleAggregateFunction serializes as the nested type (public
    # contract, DataTypeCustomSimpleAggregateFunction.cpp)
    assert _ch_type_to_spark(
        "SimpleAggregateFunction(sum, Int64)").simpleString() == "bigint"
    out = bytearray()
    _encode_column(out, [10, -3, 7], "SimpleAggregateFunction(sum, Int64)")
    vals, pos = _decode_column(bytes(out), 0,
                               "SimpleAggregateFunction(sum, Int64)", 3)
    assert vals == [10, -3, 7] and pos == len(out)
    assert _ch_type_to_spark(
        "SimpleAggregateFunction(anyLast, Nullable(String))"
    ).simpleString() == "string"
    # AggregateFunction carried as opaque length-prefixed state bytes
    assert _ch_type_to_spark(
        "AggregateFunction(uniq, UInt64)").simpleString() == "binary"
    states = [b"\x01\x02\x03", b"", b"\xff" * 5]
    out = bytearray()
    _encode_column(out, states, "AggregateFunction(uniq, UInt64)")
    vals, pos = _decode_column(bytes(out), 0,
                               "AggregateFunction(uniq, UInt64)", 3)
    assert [bytes(v) for v in vals] == states and pos == len(out)


def test_enum_column_decode():
    import struct
    from clickhouse_core_spark.sources.nativefmt import (
        _ch_type_to_spark, _decode_column)
    blob = struct.pack("<3b", 1, 2, 1)
    vals, _p = _decode_column(blob, 0, "Enum8('yes' = 1, 'no' = 2)", 3)
    assert vals == ["yes", "no", "yes"]
    assert isinstance(_ch_type_to_spark("Enum8('a' = 1)"), T.StringType)


def test_lowcardinality_block_through_spark(spark, workdir):
    # hand-build a 2-column block (LC(String) + Int64) and read it via
    # the full schema-inference Spark path
    from clickhouse_core_spark.sources.nativefmt import _encode_column
    from clickhouse_core_spark.sources.rowformats import _put_varint
    blob = bytearray()
    _put_varint(blob, 2)
    _put_varint(blob, 4)
    for name, ch_t in ((b"cat", b"LowCardinality(String)"),
                       (b"n", b"Int64")):
        _put_varint(blob, len(name)); blob.extend(name)
        _put_varint(blob, len(ch_t)); blob.extend(ch_t)
        if ch_t.startswith(b"Low"):
            _encode_column(blob, ["x", "y", "x", "x"],
                           "LowCardinality(String)")
        else:
            _encode_column(blob, [10, 20, 30, 40], "Int64")
    with open(os.path.join(workdir, "lc.native"), "wb") as fh:
        fh.write(bytes(blob))
    df = read_native(spark, workdir)
    assert df.schema["cat"].dataType.simpleString() == "string"
    got = sorted((r.cat, r.n) for r in df.collect())
    assert got == [("x", 10), ("x", 30), ("x", 40), ("y", 20)]


@settings(max_examples=20, deadline=None)
@given(st.lists(st.one_of(st.none(),
                          st.text(alphabet="abcXYZ", max_size=6)),
                min_size=0, max_size=40))
def test_lowcardinality_global_mode_property(vals):
    """Property: the global-dictionary layout round-trips any
    Nullable(String) column, including all-null and empty."""
    from clickhouse_core_spark.sources.nativefmt import (
        _decode_column, _encode_column)
    out = bytearray()
    _encode_column(out, vals, "LowCardinality(Nullable(String))",
                   "global")
    back, pos = _decode_column(bytes(out), 0,
                               "LowCardinality(Nullable(String))",
                               len(vals), {})
    assert back == vals and pos == len(out)
