"""BSONEachRow format — pure-Python BSON codec (public bsonspec.org
layout; reference src/Processors/Formats/Impl/BSONEachRowRowInputFormat.cpp
/ BSONEachRowRowOutputFormat.cpp).

Each row is one BSON document; documents are concatenated in a file.
Supported element types (the scalar subset a Spark schema declares):
double (0x01), string (0x02), array of scalars (0x04), binary/generic
(0x05), bool (0x08), null (0x0A), int32 (0x10), int64 (0x12).
Nested documents (0x03) raise by name — use the JSON formats for
nested payloads.

Execution shape: binaryFile blobs + Arrow-batched mapInPandas, same as
the other binary codecs.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .rowformats import _schema


def _encode_value(name: bytes, v, dt: T.DataType) -> bytes:
    if v is None:
        return b"\x0A" + name + b"\x00"
    if isinstance(dt, T.DoubleType) or isinstance(dt, T.FloatType):
        return b"\x01" + name + b"\x00" + struct.pack("<d", float(v))
    if isinstance(dt, T.StringType):
        raw = v.encode("utf-8")
        return (b"\x02" + name + b"\x00"
                + struct.pack("<i", len(raw) + 1) + raw + b"\x00")
    if isinstance(dt, T.BinaryType):
        raw = bytes(v)
        return (b"\x05" + name + b"\x00"
                + struct.pack("<i", len(raw)) + b"\x00" + raw)
    if isinstance(dt, T.BooleanType):
        return b"\x08" + name + b"\x00" + (b"\x01" if v else b"\x00")
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
        return b"\x10" + name + b"\x00" + struct.pack("<i", int(v))
    if isinstance(dt, T.LongType):
        return b"\x12" + name + b"\x00" + struct.pack("<q", int(v))
    if isinstance(dt, T.ArrayType):
        inner = bytearray()
        for i, x in enumerate(v):
            inner += _encode_value(str(i).encode(), x, dt.elementType)
        body = struct.pack("<i", len(inner) + 5) + bytes(inner) + b"\x00"
        return b"\x04" + name + b"\x00" + body
    raise NotImplementedError(f"BSONEachRow: type {dt} not mapped")


def encode_bson(rows: list[dict], schema: T.StructType) -> bytes:
    schema = _schema(schema)
    out = bytearray()
    for r in rows:
        body = bytearray()
        for f in schema.fields:
            body += _encode_value(f.name.encode("utf-8"),
                                  r.get(f.name), f.dataType)
        out += struct.pack("<i", len(body) + 5) + body + b"\x00"
    return bytes(out)


def _read_cstring(buf: bytes, pos: int) -> tuple[str, int]:
    end = buf.index(0, pos)
    return buf[pos:end].decode("utf-8"), end + 1


def _decode_element(buf: bytes, pos: int):
    """Return (name, value, new_pos); value type per the wire tag."""
    tag = buf[pos]
    name, pos = _read_cstring(buf, pos + 1)
    if tag == 0x01:
        return name, struct.unpack_from("<d", buf, pos)[0], pos + 8
    if tag == 0x02:
        ln = struct.unpack_from("<i", buf, pos)[0]
        s = buf[pos + 4:pos + 4 + ln - 1].decode("utf-8", "replace")
        return name, s, pos + 4 + ln
    if tag == 0x05:
        ln = struct.unpack_from("<i", buf, pos)[0]
        raw = bytearray(buf[pos + 5:pos + 5 + ln])
        return name, raw, pos + 5 + ln
    if tag == 0x08:
        return name, bool(buf[pos]), pos + 1
    if tag == 0x0A:
        return name, None, pos
    if tag == 0x10:
        return name, struct.unpack_from("<i", buf, pos)[0], pos + 4
    if tag == 0x12:
        return name, struct.unpack_from("<q", buf, pos)[0], pos + 8
    if tag == 0x04:
        ln = struct.unpack_from("<i", buf, pos)[0]
        end = pos + ln - 1  # exclude trailing 0x00
        p = pos + 4
        vals = []
        while p < end:
            _n, v, p = _decode_element(buf, p)
            vals.append(v)
        return name, vals, pos + ln
    raise NotImplementedError(
        f"BSONEachRow: element type 0x{tag:02x} not mapped")


def decode_bson_blob(buf: bytes) -> list[dict]:
    rows = []
    pos, n = 0, len(buf)
    while pos + 4 <= n:
        doc_len = struct.unpack_from("<i", buf, pos)[0]
        end = pos + doc_len - 1
        p = pos + 4
        row: dict = {}
        while p < end:
            name, v, p = _decode_element(buf, p)
            row[name] = v
        rows.append(row)
        pos += doc_len
    return rows


def read_bson(spark: SparkSession, path: str,
              schema: T.StructType) -> DataFrame:
    """BSONEachRow file source."""
    schema = _schema(schema)
    names = [f.name for f in schema.fields]
    blobs = spark.read.format("binaryFile").load(path).select("content")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[dict] = []
            for blob in pdf["content"]:
                rows.extend(decode_bson_blob(bytes(blob)))
            yield pd.DataFrame(
                {c: [r.get(c) for r in rows] for c in names},
                columns=names)

    return blobs.mapInPandas(batches, schema=schema)
