"""ClickHouse Native format — the engine's own columnar wire/file format.

Reference: src/Formats/NativeReader.cpp / NativeWriter.cpp and the
public format documentation (docs/interfaces/formats `Native`): a file
is a sequence of blocks, each block is

    num_columns  varint
    num_rows     varint
    per column:
        name        varint-length UTF-8
        type        varint-length UTF-8 (ClickHouse type name)
        data        columnar payload:
            fixed-width numerics   little-endian values × rows
            String                 per value varint length + bytes
            FixedString(N)         N raw bytes per value
            Date / Date32          UInt16 / Int32 days since epoch
            DateTime               UInt32 seconds
            DateTime64(p)          Int64 ticks at 10^-p s
            Nullable(T)            rows × UInt8 null map, then T payload
            Array(T)               rows × UInt64 cumulative offsets,
                                   then the flattened T payload

This implementation covers that documented core (the layout every
public client library re-implements) plus LowCardinality(T) in BOTH
serialization modes — the per-block ("additional keys") dictionary and
the shared-global-dictionary layout — Enum8/16 decode
(``_decode_lowcardinality``), SimpleAggregateFunction (stored as its
inner type), and AggregateFunction state columns surfaced as opaque
BINARY values.
The format is self-describing, so ``read_native`` can infer the Spark
schema from the first blob's header.

Execution shape: blobs via ``binaryFile`` (one task per file,
executor-local decode), Arrow-batched ``mapInPandas`` back to the JVM
— same contract as the RowBinary/MsgPack codecs in rowformats.py, and
columnar decode here is a straight ``struct`` unpack per column, not a
per-row walk.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .rowformats import _put_varint, _read_varint, _schema

# ---------------------------------------------------------------- type names

_CH_FIXED = {  # CH type -> (struct letter, width, signed-reinterpret)
    "Int8": ("b", 1), "Int16": ("h", 2), "Int32": ("i", 4), "Int64": ("q", 8),
    "UInt8": ("B", 1), "UInt16": ("H", 2), "UInt32": ("I", 4),
    "UInt64": ("Q", 8),
    "Float32": ("f", 4), "Float64": ("d", 8),
}

_CH_TO_SPARK = {
    "Int8": T.ByteType(), "Int16": T.ShortType(), "Int32": T.IntegerType(),
    "Int64": T.LongType(),
    # unsigned widths widen to the next signed carrier; UInt64 lands on
    # LongType by two's-complement reinterpretation (documented — the
    # 2^63.. range is rare in analytics payloads and stays bit-exact
    # through an encode/decode roundtrip)
    "UInt8": T.ShortType(), "UInt16": T.IntegerType(),
    "UInt32": T.LongType(), "UInt64": T.LongType(),
    "Float32": T.FloatType(), "Float64": T.DoubleType(),
    "String": T.StringType(), "Date": T.DateType(),
    "Date32": T.DateType(), "DateTime": T.TimestampType(),
    "Bool": T.BooleanType(),
}

_SPARK_TO_CH = {
    T.ByteType: "Int8", T.ShortType: "Int16", T.IntegerType: "Int32",
    T.LongType: "Int64", T.FloatType: "Float32", T.DoubleType: "Float64",
    T.StringType: "String", T.BinaryType: "String",
    T.BooleanType: "Bool", T.DateType: "Date",
    T.TimestampType: "DateTime64(6)", T.TimestampNTZType: "DateTime64(6)",
}


def _ch_type_to_spark(ch: str) -> T.DataType:
    ch = ch.strip()
    if ch.startswith("Nullable(") and ch.endswith(")"):
        return _ch_type_to_spark(ch[9:-1])
    if ch.startswith("Array(") and ch.endswith(")"):
        return T.ArrayType(_ch_type_to_spark(ch[6:-1]))
    if ch.startswith("FixedString(") and ch.endswith(")"):
        return T.BinaryType()
    if ch.startswith("DateTime64"):
        return T.TimestampType()
    if ch.startswith("DateTime"):  # DateTime('tz')
        return T.TimestampType()
    if ch.startswith("LowCardinality(") and ch.endswith(")"):
        return _ch_type_to_spark(ch[15:-1])
    if ch.startswith("Enum8(") or ch.startswith("Enum16("):
        return T.StringType()     # decoded through the value map
    if ch.startswith("SimpleAggregateFunction(") and ch.endswith(")"):
        # public contract (reference src/DataTypes/
        # DataTypeCustomSimpleAggregateFunction.cpp): serialization IS
        # the nested type's — full interop with any writer
        return _ch_type_to_spark(_simple_agg_inner(ch))
    if ch.startswith("AggregateFunction("):
        # opaque state carrier: varint length + bytes per value (the
        # String framing).  Exact round-trip for states THIS engine
        # emits (operators/sketches.py DataSketches payloads); real
        # reference files frame states per-function
        # (src/DataTypes/Serializations/SerializationAggregateFunction
        # .cpp calls function->serialize with no generic length), so
        # foreign state columns stay out of scope — see LIMITS.md
        return T.BinaryType()
    try:
        return _CH_TO_SPARK[ch]
    except KeyError:
        raise NotImplementedError(f"Native: column type {ch!r} not mapped")


def _spark_type_to_ch(dt: T.DataType, nullable: bool) -> str:
    if isinstance(dt, T.ArrayType):
        return f"Array({_spark_type_to_ch(dt.elementType, False)})"
    base = _SPARK_TO_CH.get(type(dt))
    if base is None:
        raise NotImplementedError(f"Native: Spark type {dt} not mapped")
    return f"Nullable({base})" if nullable else base


# ------------------------------------------------------------------- decode

def _read_str(buf: bytes, pos: int) -> tuple[str, int]:
    ln, pos = _read_varint(buf, pos)
    return buf[pos:pos + ln].decode("utf-8"), pos + ln


_LC_HAS_ADDITIONAL = 1 << 9
_LC_NEED_GLOBAL = 1 << 8
_LC_NEED_UPDATE = 1 << 10
_LC_WIDTHS = {0: ("B", 1), 1: ("H", 2), 2: ("I", 4), 3: ("Q", 8)}


def _simple_agg_inner(ch: str) -> str:
    """SimpleAggregateFunction(name, T) -> T (T may itself contain
    commas, e.g. Decimal — split on the FIRST top-level comma)."""
    inner = ch[ch.index("(") + 1:ch.rindex(")")]
    depth = 0
    for i, c in enumerate(inner):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            return inner[i + 1:].strip()
    raise NotImplementedError(f"Native: malformed {ch!r}")


def _decode_lowcardinality(buf: bytes, pos: int, inner: str, n: int,
                           state: dict | None = None):
    """LowCardinality(T) column payload (reference
    src/DataTypes/Serializations/SerializationLowCardinality.cpp:
    KeysSerializationVersion u64, IndexesSerializationType u64
    [width | HasAdditionalKeysBit | NeedGlobalDictionaryBit |
    NeedUpdateDictionary]).

    Per-block ("additional keys") mode: additional keys (u64 count +
    nested-T values), u64 row count, fixed-width indexes.

    Shared-global-dictionary mode (NeedGlobalDictionaryBit, written by
    the reference when low_cardinality_use_single_dictionary_for_part
    applies): the global dictionary (u64 count + nested-T values)
    appears when NeedUpdateDictionary is set or no dictionary has been
    seen yet on this stream, persists across blocks via ``state``, and
    indexes < len(global) hit the global dictionary while overflow
    indexes hit the block's additional keys at idx - len(global)
    (mapIndexWithAdditionalKeys, SerializationLowCardinality.cpp:325).
    For nullable T, global-dictionary position 0 is the null slot."""
    _ver = struct.unpack_from("<Q", buf, pos)[0]
    pos += 8
    if n == 0:
        return [], pos
    idx_type = struct.unpack_from("<Q", buf, pos)[0]
    pos += 8
    nullable = inner.startswith("Nullable(")
    keys_type = inner[9:-1] if nullable else inner
    if idx_type & _LC_NEED_GLOBAL:
        have_dict = state is not None and "global" in state
        if (idx_type & _LC_NEED_UPDATE) or not have_dict:
            num_g = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
            gkeys, pos = _decode_column(buf, pos, keys_type, num_g)
            if state is not None:
                state["global"] = gkeys
        else:
            gkeys = state["global"]
        add: list = []
        if idx_type & _LC_HAS_ADDITIONAL:
            num_a = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
            add, pos = _decode_column(buf, pos, keys_type, num_a)
        num_rows = struct.unpack_from("<Q", buf, pos)[0]
        pos += 8
        letter, w = _LC_WIDTHS[idx_type & 0xFF]
        idxs = struct.unpack_from(f"<{num_rows}{letter}", buf, pos)
        pos += w * num_rows
        g = len(gkeys)
        vals = []
        for i in idxs:
            if nullable and i == 0:
                vals.append(None)
            else:
                vals.append(gkeys[i] if i < g else add[i - g])
        return vals, pos
    num_keys = struct.unpack_from("<Q", buf, pos)[0]
    pos += 8
    keys, pos = _decode_column(buf, pos, keys_type, num_keys)
    num_rows = struct.unpack_from("<Q", buf, pos)[0]
    pos += 8
    letter, w = _LC_WIDTHS[idx_type & 0xFF]
    idxs = struct.unpack_from(f"<{num_rows}{letter}", buf, pos)
    pos += w * num_rows
    if nullable:
        vals = [None if i == 0 else keys[i] for i in idxs]
    else:
        vals = [keys[i] for i in idxs]
    return vals, pos


def _encode_lowcardinality(out: bytearray, vals: list, inner: str,
                           mode: str = "additional") -> None:
    """mode='additional' → per-block dictionary (the wire default);
    mode='global' → shared-global-dictionary layout (NeedGlobalDictionary
    + NeedUpdateDictionary, dictionary inline, no additional keys) —
    the other public layout, which our decoder also accepts from
    reference-written part files."""
    nullable = inner.startswith("Nullable(")
    keys_type = inner[9:-1] if nullable else inner
    out.extend(struct.pack("<Q", 1))          # key serialization version
    if not vals:
        return
    uniq: list = [_default_for(keys_type)] if nullable else []
    index_of: dict = {}
    idxs = []
    for v in vals:
        if v is None and nullable:
            idxs.append(0)
            continue
        key = v if not isinstance(v, (bytearray, list)) else repr(v)
        if key not in index_of:
            index_of[key] = len(uniq)
            uniq.append(v)
        idxs.append(index_of[key])
    width = 0 if len(uniq) <= 0xFF else 1 if len(uniq) <= 0xFFFF else 2
    letter, _w = _LC_WIDTHS[width]
    if mode == "global":
        out.extend(struct.pack(
            "<Q", width | _LC_NEED_GLOBAL | _LC_NEED_UPDATE))
        out.extend(struct.pack("<Q", len(uniq)))
        _encode_column(out, uniq, keys_type)
        out.extend(struct.pack("<Q", len(idxs)))
        out.extend(struct.pack(f"<{len(idxs)}{letter}", *idxs))
        return
    out.extend(struct.pack("<Q", width | _LC_HAS_ADDITIONAL))
    out.extend(struct.pack("<Q", len(uniq)))
    _encode_column(out, uniq, keys_type)
    out.extend(struct.pack("<Q", len(idxs)))
    out.extend(struct.pack(f"<{len(idxs)}{letter}", *idxs))


def _parse_enum_map(ch_type: str) -> dict[int, str]:
    """Enum8('a' = 1, 'b' = 2) -> {1: 'a', 2: 'b'} (the value map lives
    in the type string itself)."""
    import re
    inner = ch_type[ch_type.index("(") + 1:ch_type.rindex(")")]
    return {int(num): name for name, num in
            re.findall(r"'((?:[^'\\]|\\.)*)'\s*=\s*(-?\d+)", inner)}


def _decode_column(buf: bytes, pos: int, ch_type: str, n: int,
                   state: dict | None = None):
    """Return (values list, new pos) for one column payload."""
    import datetime as _dt
    ch_type = ch_type.strip()
    if ch_type.startswith("Enum8(") or ch_type.startswith("Enum16("):
        emap = _parse_enum_map(ch_type)
        w, letter = (1, "b") if ch_type.startswith("Enum8") else (2, "h")
        raw = struct.unpack_from(f"<{n}{letter}", buf, pos)
        return [emap.get(v, str(v)) for v in raw], pos + w * n
    if ch_type.startswith("LowCardinality(") and ch_type.endswith(")"):
        return _decode_lowcardinality(buf, pos, ch_type[15:-1], n, state)
    if ch_type.startswith("SimpleAggregateFunction(") and ch_type.endswith(")"):
        # serialization is the nested type's (see _ch_type_to_spark)
        return _decode_column(buf, pos, _simple_agg_inner(ch_type), n, state)
    if ch_type.startswith("AggregateFunction("):
        # opaque state carrier, String framing (see _ch_type_to_spark)
        vals = []
        for _ in range(n):
            ln, pos = _read_varint(buf, pos)
            vals.append(bytearray(buf[pos:pos + ln]))
            pos += ln
        return vals, pos
    if ch_type.startswith("Nullable("):
        nulls = list(buf[pos:pos + n])
        pos += n
        vals, pos = _decode_column(buf, pos, ch_type[9:-1], n)
        return [None if nz else v for nz, v in zip(nulls, vals)], pos
    if ch_type.startswith("Array("):
        offs = struct.unpack_from(f"<{n}Q", buf, pos)
        pos += 8 * n
        total = offs[-1] if n else 0
        flat, pos = _decode_column(buf, pos, ch_type[6:-1], total)
        out, prev = [], 0
        for o in offs:
            out.append(flat[prev:o])
            prev = o
        return out, pos
    if ch_type == "String":
        vals = []
        for _ in range(n):
            ln, pos = _read_varint(buf, pos)
            vals.append(buf[pos:pos + ln].decode("utf-8", "replace"))
            pos += ln
        return vals, pos
    if ch_type.startswith("FixedString("):
        w = int(ch_type[12:-1])
        vals = [bytearray(buf[pos + i * w:pos + (i + 1) * w])
                for i in range(n)]
        return vals, pos + w * n
    if ch_type == "Date":
        raw = struct.unpack_from(f"<{n}H", buf, pos)
        epoch = _dt.date(1970, 1, 1)
        return [epoch + _dt.timedelta(days=d) for d in raw], pos + 2 * n
    if ch_type == "Date32":
        raw = struct.unpack_from(f"<{n}i", buf, pos)
        epoch = _dt.date(1970, 1, 1)
        return [epoch + _dt.timedelta(days=d) for d in raw], pos + 4 * n
    if ch_type.startswith("DateTime64"):
        prec = 3
        inner = ch_type[ch_type.find("(") + 1:ch_type.rfind(")")] \
            if "(" in ch_type else "3"
        prec = int(inner.split(",")[0].strip() or 3)
        raw = struct.unpack_from(f"<{n}q", buf, pos)
        scale = 10 ** prec
        return [_dt.datetime.fromtimestamp(v / scale, tz=_dt.timezone.utc)
                .replace(tzinfo=None) for v in raw], pos + 8 * n
    if ch_type.startswith("DateTime"):
        raw = struct.unpack_from(f"<{n}I", buf, pos)
        return [_dt.datetime.fromtimestamp(v, tz=_dt.timezone.utc)
                .replace(tzinfo=None) for v in raw], pos + 4 * n
    if ch_type == "Bool":
        raw = buf[pos:pos + n]
        return [bool(b) for b in raw], pos + n
    if ch_type in _CH_FIXED:
        letter, w = _CH_FIXED[ch_type]
        vals = list(struct.unpack_from(f"<{n}{letter}", buf, pos))
        if ch_type == "UInt64":  # two's-complement into LongType
            vals = [v - (1 << 64) if v >= (1 << 63) else v for v in vals]
        return vals, pos + w * n
    raise NotImplementedError(f"Native: column type {ch_type!r} not mapped")


def decode_native_blob(buf: bytes) -> tuple[list[str], list[str],
                                            dict[str, list]]:
    """Decode all blocks; returns (names, ch_types, columns)."""
    pos, total = 0, len(buf)
    names: list[str] = []
    types: list[str] = []
    cols: dict[str, list] = {}
    # per-column decode state: LowCardinality shared global dictionaries
    # persist across blocks of the same stream
    lc_states: dict[str, dict] = {}
    while pos < total:
        ncols, pos = _read_varint(buf, pos)
        nrows, pos = _read_varint(buf, pos)
        for _ in range(ncols):
            name, pos = _read_str(buf, pos)
            ch_t, pos = _read_str(buf, pos)
            vals, pos = _decode_column(buf, pos, ch_t, nrows,
                                       lc_states.setdefault(name, {}))
            if name not in cols:
                names.append(name)
                types.append(ch_t)
                cols[name] = []
            cols[name].extend(vals)
    return names, types, cols


def infer_native_schema(buf: bytes) -> T.StructType:
    """Spark schema from the first block header (self-describing)."""
    pos = 0
    ncols, pos = _read_varint(buf, pos)
    _nrows, pos = _read_varint(buf, pos)
    fields = []
    for _ in range(ncols):
        name, pos = _read_str(buf, pos)
        ch_t, pos = _read_str(buf, pos)
        fields.append(T.StructField(
            name, _ch_type_to_spark(ch_t),
            nullable=ch_t.strip().startswith("Nullable(")))
        # skip the payload to reach the next header
        _vals, pos = _decode_column(buf, pos, ch_t, _nrows)
    return T.StructType(fields)


# ------------------------------------------------------------------- encode

def _encode_column(out: bytearray, vals: list, ch_type: str,
                   lc_mode: str = "additional") -> None:
    import datetime as _dt
    ch_type = ch_type.strip()
    if ch_type.startswith("LowCardinality(") and ch_type.endswith(")"):
        _encode_lowcardinality(out, vals, ch_type[15:-1], lc_mode)
        return
    if ch_type.startswith("SimpleAggregateFunction(") and ch_type.endswith(")"):
        _encode_column(out, vals, _simple_agg_inner(ch_type), lc_mode)
        return
    if ch_type.startswith("AggregateFunction("):
        for v in vals:
            raw = bytes(v) if v is not None else b""
            _put_varint(out, len(raw))
            out.extend(raw)
        return
    if ch_type.startswith("Nullable("):
        out.extend(1 if v is None else 0 for v in vals)
        inner = ch_type[9:-1]
        _encode_column(out, [_default_for(inner) if v is None else v
                             for v in vals], inner)
        return
    if ch_type.startswith("Array("):
        off = 0
        for v in vals:
            off += len(v or [])
            out.extend(struct.pack("<Q", off))
        flat = [x for v in vals for x in (v or [])]
        _encode_column(out, flat, ch_type[6:-1])
        return
    if ch_type == "String":
        for v in vals:
            raw = v.encode("utf-8") if isinstance(v, str) else bytes(v or b"")
            _put_varint(out, len(raw))
            out.extend(raw)
        return
    if ch_type.startswith("FixedString("):
        w = int(ch_type[12:-1])
        for v in vals:
            raw = bytes(v or b"")[:w]
            out.extend(raw.ljust(w, b"\x00"))
        return
    if ch_type == "Date":
        epoch = _dt.date(1970, 1, 1)
        for v in vals:
            out.extend(struct.pack("<H", (v - epoch).days if v else 0))
        return
    if ch_type.startswith("DateTime64"):
        prec = int((ch_type[ch_type.find("(") + 1:ch_type.rfind(")")]
                    if "(" in ch_type else "3").split(",")[0].strip() or 3)
        scale = 10 ** prec
        for v in vals:
            if v is None:
                out.extend(struct.pack("<q", 0))
                continue
            ts = v.replace(tzinfo=_dt.timezone.utc).timestamp()
            out.extend(struct.pack(
                "<q", round(ts * scale)))
        return
    if ch_type.startswith("DateTime"):
        for v in vals:
            ts = 0 if v is None else int(
                v.replace(tzinfo=_dt.timezone.utc).timestamp())
            out.extend(struct.pack("<I", ts))
        return
    if ch_type == "Bool":
        out.extend(1 if v else 0 for v in vals)
        return
    if ch_type in _CH_FIXED:
        letter, _w = _CH_FIXED[ch_type]
        if ch_type == "UInt64":
            vals = [v + (1 << 64) if v < 0 else v for v in vals]
        out.extend(struct.pack(f"<{len(vals)}{letter}",
                               *[v if v is not None else 0 for v in vals]))
        return
    raise NotImplementedError(f"Native: column type {ch_type!r} not mapped")


def _default_for(ch_type: str):
    ch_type = ch_type.strip()
    if ch_type == "String" or ch_type.startswith("FixedString"):
        return ""
    if ch_type.startswith("Array"):
        return []
    if ch_type == "Date":
        import datetime as _dt
        return _dt.date(1970, 1, 1)
    if ch_type.startswith("DateTime"):
        import datetime as _dt
        return _dt.datetime(1970, 1, 1)
    if ch_type == "Bool":
        return False
    return 0


def encode_native(rows: list[dict], schema: T.StructType,
                  block_rows: int = 65536,
                  ch_types: dict | None = None,
                  lc_mode: str = "additional") -> bytes:
    """Encode rows into Native blocks (column order = schema order).
    ``ch_types`` overrides the derived ClickHouse type per column name
    (e.g. {'name': 'LowCardinality(String)'}); ``lc_mode='global'``
    writes LowCardinality columns in the shared-global-dictionary
    layout."""
    schema = _schema(schema)
    out = bytearray()
    for start in range(0, max(len(rows), 1), block_rows):
        chunk = rows[start:start + block_rows]
        if not chunk and start > 0:
            break
        _put_varint(out, len(schema.fields))
        _put_varint(out, len(chunk))
        for f in schema.fields:
            ch_t = (ch_types or {}).get(f.name) \
                or _spark_type_to_ch(f.dataType, f.nullable)
            raw = f.name.encode("utf-8")
            _put_varint(out, len(raw))
            out.extend(raw)
            raw = ch_t.encode("utf-8")
            _put_varint(out, len(raw))
            out.extend(raw)
            _encode_column(out, [r.get(f.name) for r in chunk], ch_t,
                           lc_mode)
        if not chunk:
            break
    return bytes(out)


# ------------------------------------------------------------------- readers

def read_native(spark: SparkSession, path: str,
                schema: T.StructType | None = None) -> DataFrame:
    """Native file source.  With no schema, the first file's header is
    read driver-side (one small blob — the documented inference cost;
    pass an explicit schema to keep the driver out of the data path)."""
    blobs = spark.read.format("binaryFile").load(path).select("content")
    if schema is None:
        first = blobs.limit(1).collect()
        if not first:
            raise ValueError(f"Native: no files at {path}")
        schema = infer_native_schema(bytes(first[0][0]))
    schema = _schema(schema)
    names = [f.name for f in schema.fields]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            frames = []
            for blob in pdf["content"]:
                _n, _t, cols = decode_native_blob(bytes(blob))
                frames.append(pd.DataFrame(
                    {n: cols.get(n, []) for n in names}, columns=names))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return blobs.mapInPandas(batches, schema=schema)


def decode_native(df: DataFrame, schema: T.StructType,
                  value_col: str = "value") -> DataFrame:
    """Decode a binary column carrying Native-block payloads (the Kafka
    message shape, kafka_format='Native')."""
    schema = _schema(schema)
    names = [f.name for f in schema.fields]
    idx = df.columns.index(value_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            frames = []
            for blob in pdf.iloc[:, idx]:
                if blob is None:
                    continue
                _n, _t, cols = decode_native_blob(bytes(blob))
                frames.append(pd.DataFrame(
                    {n: cols.get(n, []) for n in names}, columns=names))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return df.mapInPandas(batches, schema=schema)
