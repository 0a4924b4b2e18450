"""Protobuf input format (reference
src/Formats/registerFormats.cpp:57-60 — registerInputFormatProtobuf /
ProtobufSingle; src/Formats/ProtobufReader.h).

Two execution paths, same schema contract:

- **JVM path** (production): when the ``spark-protobuf`` connector jar
  is on the session classpath, ``from_protobuf_column`` delegates to
  ``pyspark.sql.protobuf.functions.from_protobuf`` — codegen'd,
  Arrow-free, the right thing on a cluster.  The jar ships with Spark
  distributions but is not bundled in pip pyspark, so availability is
  probed at call time.
- **Wire-format path** (fallback, always available): a pure-Python
  decoder for the public protobuf wire format (varint / fixed64 /
  length-delimited / fixed32), Arrow-batched via ``mapInPandas``.
  Field interpretation is driven by the Spark output schema plus an
  optional ``field_numbers`` map (defaults to 1..n in schema order,
  protoc's default numbering for a schema-derived message).

Supported fallback field types: integral (int32/int64 varint,
two's-complement negatives), bool, double (fixed64), float (fixed32),
string / binary (length-delimited), repeated scalars (proto3 packed
AND unpacked encodings), nested messages (length-delimited
submessages) and repeated nested messages.  Maps, groups and oneof
introspection still need the JVM path — named NotImplementedError.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_SCALAR_OK = (T.LongType, T.IntegerType, T.ShortType, T.ByteType,
              T.BooleanType, T.DoubleType, T.FloatType, T.StringType,
              T.BinaryType)


def protobuf_available(spark: SparkSession) -> bool:
    """True when the spark-protobuf connector classes are loadable."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.protobuf.ProtobufDataToCatalyst")
        return True
    except Exception:
        return False


def from_protobuf_column(df: DataFrame, value_col: str, message_name: str,
                         desc_file_path: str | None = None,
                         binary_descriptor_set: bytes | None = None,
                         schema: T.StructType | None = None,
                         field_numbers: dict[str, int] | None = None) -> DataFrame:
    """Decode a binary protobuf column to a struct of fields.

    Uses the JVM ``from_protobuf`` when the connector jar is present
    (pass descriptor file / bytes); otherwise falls back to the wire
    decoder, which needs the target ``schema``.
    """
    spark = df.sparkSession
    if protobuf_available(spark) and (desc_file_path or binary_descriptor_set):
        from pyspark.sql.protobuf.functions import from_protobuf
        kwargs = {}
        if desc_file_path:
            kwargs["descFilePath"] = desc_file_path
        if binary_descriptor_set:
            kwargs["binaryDescriptorSet"] = binary_descriptor_set
        out = df.select(from_protobuf(value_col, message_name, **kwargs)
                        .alias("__r"))
        return out.select("__r.*")
    if schema is None:
        raise NotImplementedError(
            "protobuf decode without the spark-protobuf jar needs an "
            "explicit output schema for the wire-format fallback")
    return decode_protobuf(df, schema, field_numbers=field_numbers,
                           value_col=value_col)


# ---------------------------------------------------------------- wire format

def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint")


def _field_plan(schema: T.StructType,
                field_numbers: dict[str, int] | None) -> dict:
    """field number -> (name, dataType, subplan).  subplan is the
    recursive plan for nested messages (StructType or
    Array(StructType)); None for scalars.  Repeated scalars map to
    ArrayType, nested messages to StructType — round 4 extended the
    wire fallback to both (proto3 packed + unpacked repeated encoding,
    length-delimited submessages); deeper exotica (maps, groups,
    oneof introspection) still need the spark-protobuf jar."""
    plan = {}
    for i, f in enumerate(schema.fields):
        dt = f.dataType
        sub = None
        if isinstance(dt, T.StructType):
            sub = _field_plan(dt, None)
        elif isinstance(dt, T.ArrayType):
            el = dt.elementType
            if isinstance(el, T.StructType):
                sub = _field_plan(el, None)
            elif not isinstance(el, _SCALAR_OK):
                raise NotImplementedError(
                    f"protobuf wire fallback: repeated element type "
                    f"{el.simpleString()} needs the spark-protobuf jar")
        elif not isinstance(dt, _SCALAR_OK):
            raise NotImplementedError(
                f"protobuf wire fallback: field {f.name!r} has type "
                f"{dt.simpleString()}; use the spark-protobuf jar")
        num = (field_numbers or {}).get(f.name, i + 1)
        plan[num] = (f.name, dt, sub)
    return plan


def _coerce(val, wire_type: int, dt: T.DataType):
    if wire_type == 0:  # varint
        if isinstance(dt, T.BooleanType):
            return bool(val)
        if val >= 1 << 63:  # two's-complement negative int64
            val -= 1 << 64
        return int(val)
    if wire_type == 1:  # fixed64
        if isinstance(dt, T.DoubleType):
            return struct.unpack("<d", val)[0]
        return struct.unpack("<q", val)[0]
    if wire_type == 5:  # fixed32
        if isinstance(dt, T.FloatType):
            return struct.unpack("<f", val)[0]
        return struct.unpack("<i", val)[0]
    # length-delimited
    if isinstance(dt, T.StringType):
        return val.decode("utf-8")
    if isinstance(dt, T.BinaryType):
        return bytearray(val)
    raise NotImplementedError(
        f"length-delimited payload for type {dt.simpleString()} "
        f"(nested messages need the spark-protobuf jar)")


def _unpack_packed(blob: bytes, el: T.DataType) -> list:
    """proto3 packed repeated numerics: back-to-back varints or fixed
    widths inside one length-delimited payload."""
    vals, pos, n = [], 0, len(blob)
    if isinstance(el, T.DoubleType):
        return [struct.unpack_from("<d", blob, i)[0]
                for i in range(0, n, 8)]
    if isinstance(el, T.FloatType):
        return [struct.unpack_from("<f", blob, i)[0]
                for i in range(0, n, 4)]
    while pos < n:
        v, pos = _read_varint(blob, pos)
        if isinstance(el, T.BooleanType):
            vals.append(bool(v))
        else:
            if v >= 1 << 63:
                v -= 1 << 64
            vals.append(int(v))
    return vals


def _decode_one(buf: bytes, plan: dict) -> dict:
    out: dict = {}
    pos, n = 0, len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        num, wt = tag >> 3, tag & 7
        if wt == 0:
            val, pos = _read_varint(buf, pos)
        elif wt == 1:
            val = buf[pos:pos + 8]
            pos += 8
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        if num not in plan:
            continue
        name, dt, sub = plan[num]
        if isinstance(dt, T.StructType):
            out[name] = _decode_one(bytes(val), sub)
        elif isinstance(dt, T.ArrayType):
            el = dt.elementType
            if isinstance(el, T.StructType):
                out.setdefault(name, []).append(
                    _decode_one(bytes(val), sub))
            elif wt == 2 and not isinstance(el, (T.StringType,
                                                 T.BinaryType)):
                out.setdefault(name, []).extend(_unpack_packed(val, el))
            else:  # unpacked occurrence (or repeated string/bytes)
                out.setdefault(name, []).append(_coerce(val, wt, el))
        else:
            out[name] = _coerce(val, wt, dt)
    return out


def decode_protobuf(df: DataFrame, schema: T.StructType,
                    field_numbers: dict[str, int] | None = None,
                    value_col: str = "value") -> DataFrame:
    """Wire-format decode of one message per row (ProtobufSingle / the
    Kafka payload shape).  Arrow-batched mapInPandas; works on batch and
    streaming DataFrames."""
    plan = _field_plan(schema, field_numbers)
    names = [f.name for f in schema.fields]
    idx = df.columns.index(value_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [_decode_one(bytes(b), plan) if b is not None else {}
                    for b in pdf.iloc[:, idx]]
            yield pd.DataFrame(
                {n: [r.get(n) for r in rows] for n in names},
                columns=names)

    return df.mapInPandas(batches, schema=schema)


def read_protobuf(spark: SparkSession, path: str, schema: T.StructType,
                  field_numbers: dict[str, int] | None = None) -> DataFrame:
    """Protobuf *file* format: varint-length-delimited message stream
    per file (the reference's Protobuf input format row framing,
    src/Processors/Formats/Impl/ProtobufRowInputFormat.h).  Files ship
    as blobs through binaryFile (splittable across executors); each
    executor walks the length prefixes locally."""
    plan = _field_plan(schema, field_numbers)
    names = [f.name for f in schema.fields]
    blobs = spark.read.format("binaryFile").load(path).select("content")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for blob in pdf["content"]:
                buf = bytes(blob)
                pos = 0
                while pos < len(buf):
                    ln, pos = _read_varint(buf, pos)
                    rows.append(_decode_one(buf[pos:pos + ln], plan))
                    pos += ln
            yield pd.DataFrame(
                {n: [r.get(n) for r in rows] for n in names},
                columns=names)

    return blobs.mapInPandas(batches, schema=schema)


# ------------------------------------------------------------------- encoder

def encode_message(values: dict, schema: T.StructType,
                   field_numbers: dict[str, int] | None = None) -> bytes:
    """Encode one row dict to protobuf wire bytes (test fixtures and the
    write-side analog of the reference's output format)."""
    plan = _field_plan(schema, field_numbers)
    by_name = {name: (num, dt, sub)
               for num, (name, dt, sub) in plan.items()}
    out = bytearray()

    def put_varint(v: int, buf: bytearray | None = None) -> None:
        buf = out if buf is None else buf
        if v < 0:
            v += 1 << 64
        while True:
            b = v & 0x7F
            v >>= 7
            buf.append(b | (0x80 if v else 0))
            if not v:
                return

    def put_scalar(num: int, dt: T.DataType, v) -> None:
        if isinstance(dt, T.DoubleType):
            put_varint(num << 3 | 1)
            out.extend(struct.pack("<d", float(v)))
        elif isinstance(dt, T.FloatType):
            put_varint(num << 3 | 5)
            out.extend(struct.pack("<f", float(v)))
        elif isinstance(dt, (T.StringType, T.BinaryType)):
            raw = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            put_varint(num << 3 | 2)
            put_varint(len(raw))
            out.extend(raw)
        else:  # integral / bool -> varint
            put_varint(num << 3 | 0)
            put_varint(int(v))

    for name, (num, dt, sub) in by_name.items():
        v = values.get(name)
        if v is None:
            continue
        if isinstance(dt, T.StructType):
            msg = encode_message(dict(v), dt)
            put_varint(num << 3 | 2)
            put_varint(len(msg))
            out.extend(msg)
        elif isinstance(dt, T.ArrayType):
            el = dt.elementType
            if isinstance(el, T.StructType):
                for item in v:
                    msg = encode_message(dict(item), el)
                    put_varint(num << 3 | 2)
                    put_varint(len(msg))
                    out.extend(msg)
            elif isinstance(el, (T.StringType, T.BinaryType)):
                for item in v:
                    put_scalar(num, el, item)
            else:  # proto3 packed numerics
                packed = bytearray()
                for item in v:
                    if isinstance(el, T.DoubleType):
                        packed.extend(struct.pack("<d", float(item)))
                    elif isinstance(el, T.FloatType):
                        packed.extend(struct.pack("<f", float(item)))
                    else:
                        put_varint(int(item), packed)
                put_varint(num << 3 | 2)
                put_varint(len(packed))
                out.extend(packed)
        else:
            put_scalar(num, dt, v)
    return bytes(out)


def encode_length_delimited(rows: list[dict], schema: T.StructType,
                            field_numbers: dict[str, int] | None = None) -> bytes:
    """Concatenate rows as a varint-length-delimited stream (the
    Protobuf file-format framing)."""
    out = bytearray()
    for r in rows:
        msg = encode_message(r, schema, field_numbers)
        n = len(msg)
        while True:
            b = n & 0x7F
            n >>= 7
            out.append(b | (0x80 if n else 0))
            if not n:
                break
        out += msg
    return bytes(out)
