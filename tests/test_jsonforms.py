"""JSON document formats, MySQLDump/Form readers, render formats
(sources/jsonforms.py; reference src/Formats/registerFormats.cpp and
the per-format Impl files cited in the module)."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import types as T

from clickhouse_core_spark.sources import (
    format_markdown, format_sql_insert, format_vertical, format_xml,
    read_format,
)

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("score", T.DoubleType()),
])


@pytest.fixture
def workdir():
    d = tempfile.mkdtemp(prefix="ccs_jsonfmt_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write(workdir, name, text):
    with open(os.path.join(workdir, name), "w") as fh:
        fh.write(text)


def _rows(df):
    return sorted((r.id, r.name, r.score) for r in df.collect())


WANT = [(1, "alpha", 1.5), (2, "beta", -2.0)]


def test_json_document(spark, workdir):
    _write(workdir, "d.json", """
{"meta": [{"name":"id"}], "data": [
  {"id": 1, "name": "alpha", "score": 1.5},
  {"id": 2, "name": "beta", "score": -2.0}
], "rows": 2}""")
    assert _rows(read_format(spark, workdir, "JSON", schema=SCHEMA)) == WANT


def test_json_compact(spark, workdir):
    _write(workdir, "d.json",
           '{"data": [[1, "alpha", 1.5], [2, "beta", -2.0]]}')
    assert _rows(read_format(spark, workdir, "JSONCompact",
                             schema=SCHEMA)) == WANT


@pytest.mark.parametrize("fmt,body", [
    ("JSONColumns",
     '{"id": [1, 2], "name": ["alpha", "beta"], "score": [1.5, -2.0]}'),
    ("JSONColumnsWithMetadata",
     '{"meta": [], "data": {"id": [1, 2], "name": ["alpha", "beta"],'
     ' "score": [1.5, -2.0]}}'),
    ("JSONCompactColumns",
     '[[1, 2], ["alpha", "beta"], [1.5, -2.0]]'),
])
def test_json_columns(spark, workdir, fmt, body):
    _write(workdir, "d.json", body)
    assert _rows(read_format(spark, workdir, fmt, schema=SCHEMA)) == WANT


def test_json_object_each_row(spark, workdir):
    _write(workdir, "d.json", """
{"r1": {"id": 1, "name": "alpha", "score": 1.5},
 "r2": {"id": 2, "name": "beta", "score": -2.0}}""")
    assert _rows(read_format(spark, workdir, "JSONObjectEachRow",
                             schema=SCHEMA)) == WANT
    named = read_format(spark, workdir, "JSONObjectEachRow",
                        schema=SCHEMA, name_col="rowname")
    assert sorted(r.rowname for r in named.collect()) == ["r1", "r2"]


def test_json_as_string(spark, workdir):
    _write(workdir, "d.json",
           '{"a": 1, "t": "has } brace"}\n{"b": {"nested": 2}}')
    got = sorted(r.json for r in read_format(
        spark, workdir, "JSONAsString").collect())
    assert got == ['{"a": 1, "t": "has } brace"}', '{"b": {"nested": 2}}']


def test_mysql_dump(spark, workdir):
    _write(workdir, "dump.sql", """
-- MySQL dump
CREATE TABLE t (id bigint, name varchar(10), score double);
INSERT INTO `t` VALUES (1, 'alpha', 1.5), (2, 'beta', -2.0);
INSERT INTO other VALUES (9, 'skip, me', 0.0);
""")
    assert _rows(read_format(spark, workdir, "MySQLDump",
                             schema=SCHEMA, table="t")) == WANT
    # without table filter, both statements parse
    allr = read_format(spark, workdir, "MySQLDump", schema=SCHEMA)
    assert len(allr.collect()) == 3


def test_form_one_null(spark, workdir):
    _write(workdir, "f.txt", "id=5&name=caf%C3%A9+x&score=2.5")
    r = read_format(spark, workdir, "Form", schema=SCHEMA).first()
    assert (r.id, r.name, r.score) == (5, "café x", 2.5)
    one = read_format(spark, "", "One")
    assert [(r.dummy) for r in one.collect()] == [0]
    nul = read_format(spark, "", "Null", schema=SCHEMA)
    assert nul.collect() == [] and nul.columns == ["id", "name", "score"]


def test_hive_text(spark, workdir):
    _write(workdir, "h.txt", "1\x01alpha\x011.5\n2\x01beta\x01-2.0\n")
    assert _rows(read_format(spark, workdir, "HiveText",
                             schema=SCHEMA)) == WANT


def test_renderers(spark):
    df = spark.createDataFrame([(1, "a", None)], SCHEMA)
    md = format_markdown(df)
    assert md.startswith("| id | name | score |")
    assert "| 1 | a |  |" in md
    v = format_vertical(df)
    assert "Row 1:" in v and "ᴺᵁᴸᴸ" in v
    ins = format_sql_insert(df, table="t")
    assert ins == "INSERT INTO t (`id`, `name`, `score`) " \
        "VALUES (1, 'a', NULL);\n"
    x = format_xml(df)
    assert "<rows>1</rows>" in x and "<name>score</name>" in x
    with pytest.raises(ValueError, match="display"):
        format_markdown(spark.range(100).toDF("id"), max_rows=10)


def test_bson_each_row(spark, workdir):
    from clickhouse_core_spark.sources import encode_bson
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("tags", T.ArrayType(T.IntegerType())),
        T.StructField("raw", T.BinaryType())])
    rows = [{"id": 1, "name": "alpha", "score": 1.5, "ok": True,
             "tags": [1, 2], "raw": bytearray(b"\x00\xff")},
            {"id": 2, "name": None, "score": None, "ok": False,
             "tags": [], "raw": bytearray(b"")}]
    with open(os.path.join(workdir, "rows.bson"), "wb") as fh:
        fh.write(encode_bson(rows, schema))
    got = sorted((r.id, r.name, r.score, r.ok, tuple(r.tags or []),
                  bytes(r.raw or b""))
                 for r in read_format(spark, workdir, "BSONEachRow",
                                      schema=schema).collect())
    assert got == [(1, "alpha", 1.5, True, (1, 2), b"\x00\xff"),
                   (2, None, None, False, (), b"")]
    # pymongo-independent sanity: the canonical 5-byte empty doc plus a
    # known single-int32 document {"a": 1} from the BSON spec examples
    from clickhouse_core_spark.sources import decode_bson_blob
    known = bytes.fromhex("0c0000001061000100000000")
    assert decode_bson_blob(known) == [{"a": 1}]


def test_template_format(spark, workdir):
    _write(workdir, "t.txt",
           "row 1: id=1 name=[alpha] score->1.5\n"
           "row 2: id=2 name=[beta] score->-2.0\n")
    df = read_format(
        spark, workdir, "Template", schema=SCHEMA,
        row_format="row ${id}: id=${id} name=[${name}] score->${score}")
    assert _rows(df) == WANT
    from clickhouse_core_spark.sources import format_template
    txt = format_template(
        spark.createDataFrame([(1, "a", 0.5)], SCHEMA),
        "${name}:${score}")
    assert txt == "a:0.5\n"
