"""RowBinary / MsgPack / TSKV / JSONCompactEachRow / Values / Regexp /
CustomSeparated format roundtrips (reference
src/Formats/registerFormats.cpp; per-format Impl files cited in
sources/rowformats.py)."""

import datetime as dt
import os
import shutil
import tempfile

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T

from clickhouse_core_spark.sources import read_format
from clickhouse_core_spark.sources.rowformats import (
    _decode_rowbinary_blob, _mp_decode_value, _split_values,
    encode_msgpack, encode_rowbinary, format_values, write_tskv,
    write_json_compact_each_row,
)

SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("name", T.StringType(), True),
    T.StructField("score", T.DoubleType(), True),
    T.StructField("flag", T.BooleanType(), True),
    T.StructField("small", T.IntegerType(), True),
])

ROWS = [
    {"id": 1, "name": "alpha", "score": 1.5, "flag": True, "small": -3},
    {"id": 2, "name": "béta✓", "score": -2.25, "flag": False, "small": 0},
    {"id": 3, "name": None, "score": None, "flag": None, "small": None},
    {"id": -9, "name": "", "score": 0.0, "flag": True, "small": 2 ** 30},
]


@pytest.fixture
def workdir():
    d = tempfile.mkdtemp(prefix="ccs_rowfmt_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _assert_matches(df, rows=ROWS):
    got = sorted((r["id"], r["name"], r["score"], r["flag"], r["small"])
                 for r in (x.asDict() for x in df.collect()))
    want = sorted((r["id"], r["name"], r["score"], r["flag"], r["small"])
                  for r in rows)
    assert got == want


@pytest.mark.parametrize("fmt,wn,wt", [
    ("RowBinary", False, False),
    ("RowBinaryWithNames", True, False),
    ("RowBinaryWithNamesAndTypes", True, True),
])
def test_rowbinary_roundtrip(spark, workdir, fmt, wn, wt):
    blob = encode_rowbinary(ROWS, SCHEMA, with_names=wn, with_types=wt)
    with open(os.path.join(workdir, "data.bin"), "wb") as fh:
        fh.write(blob)
    _assert_matches(read_format(spark, workdir, fmt, schema=SCHEMA))


def test_rowbinary_date_datetime(spark, workdir):
    schema = T.StructType([
        T.StructField("d", T.DateType(), False),
        T.StructField("ts", T.TimestampType(), False)])
    rows = [{"d": dt.date(2024, 2, 29),
             "ts": dt.datetime(2024, 2, 29, 12, 34, 56)},
            {"d": dt.date(1970, 1, 1), "ts": dt.datetime(1970, 1, 1)}]
    with open(os.path.join(workdir, "d.bin"), "wb") as fh:
        fh.write(encode_rowbinary(rows, schema))
    got = sorted((r.d, r.ts) for r in
                 read_format(spark, workdir, "RowBinary",
                             schema=schema).collect())
    assert got == sorted((r["d"], r["ts"]) for r in rows)


def test_msgpack_roundtrip(spark, workdir):
    with open(os.path.join(workdir, "data.msgpack"), "wb") as fh:
        fh.write(encode_msgpack(ROWS, SCHEMA))
    _assert_matches(read_format(spark, workdir, "MsgPack", schema=SCHEMA))


def test_tskv_roundtrip(spark, workdir):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", None)],
        "id bigint, s string, v double")
    path = os.path.join(workdir, "tskv")
    write_tskv(df, path)
    back = read_format(spark, path, "TSKV",
                       schema="id bigint, s string, v double")
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, df.collect()))


def test_json_compact_each_row(spark, workdir):
    df = spark.createDataFrame(
        [(1, "a,b", 1.5), (2, "c\"d", 2.5), (3, "e", None)],
        "id bigint, s string, v double")
    path = os.path.join(workdir, "jc")
    write_json_compact_each_row(df, path)
    back = read_format(spark, path, "JSONCompactEachRow",
                       schema="id bigint, s string, v double")
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, df.collect()))


def test_values_roundtrip(spark, workdir):
    schema = T.StructType([
        T.StructField("id", T.LongType(), True),
        T.StructField("s", T.StringType(), True),
        T.StructField("v", T.DoubleType(), True)])
    rows = [{"id": 1, "s": "a, with comma", "v": 1.5},
            {"id": 2, "s": "it''s quoted", "v": None},
            {"id": None, "s": "(parens)", "v": -0.25}]
    text = format_values(
        [{**r, "s": r["s"].replace("''", "'")} for r in rows], schema)
    with open(os.path.join(workdir, "v.values"), "w") as fh:
        fh.write(text)
    got = sorted(map(tuple, read_format(
        spark, workdir, "Values", schema=schema).collect()),
        key=repr)
    assert got == sorted(
        [(1, "a, with comma", 1.5), (2, "it's quoted", None),
         (None, "(parens)", -0.25)], key=repr)


def test_values_tokenizer_edges():
    rows = _split_values("(1, 'a,b'), (2, 'c''d') , (3, '(x)')")
    assert rows == [["1", "'a,b'"], ["2", "'c''d'"], ["3", "'(x)'"]]


def test_regexp_format(spark, workdir):
    with open(os.path.join(workdir, "log.txt"), "w") as fh:
        fh.write("2024-01-01 GET /a 200\n"
                 "2024-01-02 POST /b 404\n"
                 "garbage line\n")
    schema = T.StructType([
        T.StructField("day", T.DateType(), True),
        T.StructField("verb", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("code", T.IntegerType(), True)])
    df = read_format(spark, workdir, "Regexp", schema=schema,
                     pattern=r"^(\S+) (\S+) (\S+) (\d+)$")
    got = sorted(map(tuple, df.collect()))
    assert got == [
        (dt.date(2024, 1, 1), "GET", "/a", 200),
        (dt.date(2024, 1, 2), "POST", "/b", 404)]


def test_custom_separated(spark, workdir):
    with open(os.path.join(workdir, "rows.txt"), "w") as fh:
        fh.write("id|s|v\n1|a|1.5\n2|b|2.5\n")
    df = read_format(spark, workdir, "CustomSeparated",
                     schema="id bigint, s string, v double",
                     field_delimiter="|", with_names=True)
    assert sorted(map(tuple, df.collect())) == [
        (1, "a", 1.5), (2, "b", 2.5)]


def test_npy_roundtrip_1d(spark, workdir):
    import numpy as np
    from clickhouse_core_spark.sources import read_npy, write_npy
    np.save(os.path.join(workdir, "a.npy"),
            np.array([1.5, -2.25, 3.0], dtype=np.float64))
    df = read_npy(spark, workdir, column="v")
    assert sorted(r.v for r in df.collect()) == [-2.25, 1.5, 3.0]
    out = os.path.join(workdir, "out")
    write_npy(df, out, column="v")
    back = read_npy(spark, out, column="v")
    assert sorted(r.v for r in back.collect()) == [-2.25, 1.5, 3.0]


def test_npy_2d_arrays(spark, workdir):
    import numpy as np
    from clickhouse_core_spark.sources import read_npy
    np.save(os.path.join(workdir, "m.npy"),
            np.array([[1, 2], [3, 4]], dtype=np.int64))
    rows = sorted(tuple(r.array) for r in
                  read_npy(spark, workdir).collect())
    assert rows == [(1, 2), (3, 4)]


def test_npy_strings(spark, workdir):
    import numpy as np
    from clickhouse_core_spark.sources import read_npy
    np.save(os.path.join(workdir, "s.npy"),
            np.array(["aa", "bb"], dtype="<U2"))
    assert sorted(r.array for r in read_npy(spark, workdir).collect()) == \
        ["aa", "bb"]


# ------------------------------------------------------- codec property tests

_scalar_row = st.fixed_dictionaries({
    "id": st.integers(min_value=-(2 ** 62), max_value=2 ** 62),
    "name": st.one_of(st.none(), st.text(max_size=40)),
    "score": st.one_of(st.none(), st.floats(
        allow_nan=False, allow_infinity=False, width=64)),
    "flag": st.one_of(st.none(), st.booleans()),
    "small": st.one_of(st.none(), st.integers(
        min_value=-(2 ** 31), max_value=2 ** 31 - 1)),
})


@settings(max_examples=200, deadline=None)
@given(st.lists(_scalar_row, max_size=20))
def test_rowbinary_codec_property(rows):
    blob = encode_rowbinary(rows, SCHEMA, with_names=True, with_types=True)
    back = _decode_rowbinary_blob(blob, SCHEMA, True, True)
    assert back == rows


@settings(max_examples=200, deadline=None)
@given(st.lists(_scalar_row, max_size=20))
def test_msgpack_codec_property(rows):
    blob = encode_msgpack(rows, SCHEMA)
    pos, out = 0, []
    for _ in rows:
        row = {}
        for f in SCHEMA.fields:
            v, pos = _mp_decode_value(blob, pos)
            row[f.name] = v
        out.append(row)
    assert pos == len(blob)
    for got, want in zip(out, rows):
        for k in want:
            if isinstance(want[k], float):
                assert got[k] == pytest.approx(want[k], nan_ok=True)
            elif isinstance(want[k], bool) or want[k] is None:
                assert got[k] == want[k]
            else:
                assert got[k] == want[k]


def test_decode_rowbinary_value_column(spark):
    from clickhouse_core_spark.sources import decode_rowbinary
    blob1 = encode_rowbinary(ROWS[:2], SCHEMA)
    blob2 = encode_rowbinary(ROWS[2:], SCHEMA)
    df = spark.createDataFrame([(bytearray(blob1),), (bytearray(blob2),)],
                               "value binary")
    _assert_matches(decode_rowbinary(df, SCHEMA))


def test_decode_msgpack_value_column(spark):
    from clickhouse_core_spark.sources import decode_msgpack
    df = spark.createDataFrame(
        [(bytearray(encode_msgpack(ROWS, SCHEMA)),)], "value binary")
    _assert_matches(decode_msgpack(df, SCHEMA))


def test_decode_rowbinary_streaming(spark, workdir):
    # streaming frames accept the same decoder (rate source smoke)
    import pyspark.sql.functions as F
    from clickhouse_core_spark.sources import decode_rowbinary
    stream = (spark.readStream.format("rate").option("rowsPerSecond", "2")
              .load()
              .select(F.lit(bytearray(encode_rowbinary(ROWS[:1], SCHEMA)))
                      .alias("value")))
    out = decode_rowbinary(stream, SCHEMA)
    assert out.isStreaming and [f.name for f in out.schema.fields] == \
        [f.name for f in SCHEMA.fields]
