"""Cap'n Proto format — flat-struct subset, pure-Python wire codec.

Reference: src/Processors/Formats/Impl/CapnProtoRowInputFormat.cpp /
CapnProtoRowOutputFormat.cpp (libcapnp there).  This implements the
PUBLIC encoding spec (capnproto.org/encoding.html) for the subset a
Spark schema can express without a .capnp compiler run:

- one root struct per message, one message per row, messages
  concatenated in a file (the stream framing the reference reads);
- scalar fields Bool / Int8-64 / Float32-64 (+ unsigned carriers) in
  the data section, slot-allocated with the canonical buddy/first-fit
  algorithm the capnp compiler uses for sequentially-declared non-union
  fields — so a struct compiled from the equivalent sequential .capnp
  schema is wire-compatible;
- Text fields as list-of-bytes pointers (NUL-terminated, word-padded)
  in declaration order;
- nested structs (Spark StructType fields → capnp struct pointers,
  recursively — children appended depth-first after the parent's word
  block, offsets relative per the spec);
- typed lists of scalars (Spark ArrayType(scalar) → capnp list
  pointers with the per-type element-size code: Bool bit-packed (C=1),
  Int8 C=2, Int16 C=3, Int32/Float32 C=4, Int64/Float64 C=5);
- single-segment messages with the standard 32-bit segment table.

Out of scope (raise by name): unions, groups, lists of pointers /
structs (composite C=7), Data vs Text distinction (both map to
StringType / BinaryType), non-zero field defaults (the XOR rule
collapses to raw values when defaults are zero, which is what a Spark
schema declares).

Execution shape: binaryFile blobs + Arrow-batched mapInPandas, same as
rowformats.py / nativefmt.py.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .rowformats import _schema

_LG_BITS = {
    T.BooleanType: 0, T.ByteType: 3, T.ShortType: 4,
    T.IntegerType: 5, T.FloatType: 5, T.LongType: 6, T.DoubleType: 6,
}

_PACK = {
    T.ByteType: "<b", T.ShortType: "<h", T.IntegerType: "<i",
    T.LongType: "<q", T.FloatType: "<f", T.DoubleType: "<d",
}


class _SlotAllocator:
    """Canonical capnp data-section slot allocation: holes tracked per
    power-of-two size; a new field takes the smallest suitable hole,
    splitting the remainder top-down; otherwise a fresh word is
    appended.  Offsets are in bits."""

    def __init__(self) -> None:
        self.data_words = 0
        self.holes: dict[int, list[int]] = {}

    def alloc(self, lg: int) -> int:
        for l in range(lg, 7):
            if self.holes.get(l):
                off = self.holes[l].pop(0)
                for l2 in range(lg, l):
                    self.holes.setdefault(l2, []).append(off + (1 << l2))
                    self.holes[l2].sort()
                return off
        off = self.data_words * 64
        self.data_words += 1
        for l2 in range(lg, 6):
            self.holes.setdefault(l2, []).append(off + (1 << l2))
            self.holes[l2].sort()
        return off


# list-pointer element-size codes (encoding spec §lists)
_LIST_ELEM = {
    T.BooleanType: 1, T.ByteType: 2, T.ShortType: 3,
    T.IntegerType: 4, T.FloatType: 4, T.LongType: 5, T.DoubleType: 5,
}
_ELEM_BYTES = {2: 1, 3: 2, 4: 4, 5: 8}


def _layout(schema: T.StructType):
    """Return (data_words, n_ptrs, slots) where slots[i] is
    ('data', bit_offset) or ('ptr', ptr_index) per schema field.
    Pointer-section fields: Text/Data, List(scalar), nested struct."""
    alloc = _SlotAllocator()
    slots = []
    n_ptrs = 0
    for f in schema.fields:
        dt = type(f.dataType)
        if dt in (T.StringType, T.BinaryType, T.StructType):
            slots.append(("ptr", n_ptrs))
            n_ptrs += 1
        elif dt is T.ArrayType:
            if type(f.dataType.elementType) not in _LIST_ELEM:
                raise NotImplementedError(
                    f"CapnProto: List({f.dataType.elementType}) not in "
                    f"the typed-scalar-list subset")
            slots.append(("ptr", n_ptrs))
            n_ptrs += 1
        elif dt in _LG_BITS:
            slots.append(("data", alloc.alloc(_LG_BITS[dt])))
        else:
            raise NotImplementedError(
                f"CapnProto: field type {f.dataType} not in the flat-"
                f"struct subset")
    return alloc.data_words, n_ptrs, slots


def _write_ptr(seg: bytearray, ptr_word: int, value: int) -> None:
    struct.pack_into("<Q", seg, ptr_word * 8, value & ((1 << 64) - 1))


def _encode_struct(seg: bytearray, row: dict,
                   schema: T.StructType) -> None:
    """Append this struct's data+ptr word block to ``seg``, then its
    pointed-to children depth-first.  Pointer offsets are computed at
    child-append time (words from end of pointer word to target), so
    interleaved growth stays consistent — the same object ordering the
    capnp builder produces."""
    data_words, n_ptrs, slots = _layout(schema)
    start = len(seg)
    seg.extend(b"\x00" * (data_words + n_ptrs) * 8)

    for f, (kind, off) in zip(schema.fields, slots):
        v = row.get(f.name) if row is not None else None
        dt = type(f.dataType)
        if kind == "data":
            if v is None:
                continue  # zero = capnp default
            if dt is T.BooleanType:
                if v:
                    seg[start + off // 8] |= 1 << (off % 8)
            else:
                struct.pack_into(_PACK[dt], seg, start + off // 8, v)
            continue
        if v is None:
            continue  # null pointer stays zero
        ptr_word = start // 8 + data_words + off
        target_word = len(seg) // 8
        rel = target_word - (ptr_word + 1)
        if dt is T.StructType:
            d = v.asDict() if hasattr(v, "asDict") else v
            cdw, cnp, _s = _layout(f.dataType)
            _write_ptr(seg, ptr_word,
                       ((rel << 2) | (cdw << 32) | (cnp << 48)))
            _encode_struct(seg, d, f.dataType)
        elif dt is T.ArrayType:
            et = type(f.dataType.elementType)
            code = _LIST_ELEM[et]
            n = len(v)
            _write_ptr(seg, ptr_word,
                       (1 | (rel << 2) | (code << 32) | (n << 35)))
            if code == 1:                      # Bool: bit-packed
                bits = bytearray((n + 7) // 8)
                for i, e in enumerate(v):
                    if e:
                        bits[i // 8] |= 1 << (i % 8)
                seg.extend(bits + b"\x00" * ((-len(bits)) % 8))
            else:
                fmt = _PACK[et][1]
                raw = struct.pack(f"<{n}{fmt}", *v) if n else b""
                seg.extend(raw + b"\x00" * ((-len(raw)) % 8))
        else:                                  # Text / Data
            raw = (v.encode("utf-8") if isinstance(v, str)
                   else bytes(v)) + b"\x00"
            count = len(raw)
            _write_ptr(seg, ptr_word,
                       (1 | (rel << 2) | (2 << 32) | (count << 35)))
            seg.extend(raw + b"\x00" * ((-count) % 8))


def _encode_row(row: dict, schema: T.StructType,
                data_words: int, n_ptrs: int, slots) -> bytes:
    seg = bytearray()
    # root struct pointer: A=0, offset 0, data size, ptr size
    seg.extend(struct.pack("<Q", (data_words << 32) | (n_ptrs << 48)))
    _encode_struct(seg, row, schema)
    seg_words = len(seg) // 8
    return struct.pack("<II", 0, seg_words) + bytes(seg)


def encode_capnproto(rows: list[dict], schema: T.StructType) -> bytes:
    """One single-segment message per row, concatenated."""
    schema = _schema(schema)
    data_words, n_ptrs, slots = _layout(schema)
    out = bytearray()
    for r in rows:
        out.extend(_encode_row(r, schema, data_words, n_ptrs, slots))
    return bytes(out)


def _signed30(v: int) -> int:
    v &= 0x3FFFFFFF
    return v - (1 << 30) if v & 0x20000000 else v


def _decode_struct_content(buf: bytes, content: int, data_words: int,
                           n_ptrs: int, schema: T.StructType) -> dict:
    """Decode one struct's content block against the schema's expected
    layout; wire data/ptr section sizes bound the reads (forward
    compatibility: a shorter wire struct yields defaults/None)."""
    _dw, _np, slots = _layout(schema)
    row: dict = {}
    for f, (kind, off) in zip(schema.fields, slots):
        dt = type(f.dataType)
        if kind == "data":
            if off // 64 >= data_words:
                row[f.name] = None
                continue
            if dt is T.BooleanType:
                row[f.name] = bool(
                    buf[content + off // 8] >> (off % 8) & 1)
            else:
                row[f.name] = struct.unpack_from(
                    _PACK[dt], buf, content + off // 8)[0]
            continue
        if off >= n_ptrs:
            row[f.name] = None
            continue
        ptr_pos = content + (data_words + off) * 8
        w = struct.unpack_from("<Q", buf, ptr_pos)[0]
        if w == 0:
            row[f.name] = None
            continue
        if dt is T.StructType:
            if w & 3 != 0:
                raise ValueError("CapnProto: expected struct pointer "
                                 f"for field {f.name!r}")
            cdw = (w >> 32) & 0xFFFF
            cnp = (w >> 48) & 0xFFFF
            child = ptr_pos + 8 + _signed30(w >> 2) * 8
            row[f.name] = _decode_struct_content(
                buf, child, cdw, cnp, f.dataType)
            continue
        if w & 3 != 1:
            raise ValueError(f"CapnProto: expected list pointer for "
                             f"field {f.name!r}")
        code = (w >> 32) & 7
        count = w >> 35
        body = ptr_pos + 8 + _signed30(w >> 2) * 8
        if dt is T.ArrayType:
            et = type(f.dataType.elementType)
            if code != _LIST_ELEM[et]:
                raise ValueError(
                    f"CapnProto: list element size code {code} does not "
                    f"match schema type {f.dataType.elementType} for "
                    f"field {f.name!r}")
            if code == 1:                      # Bool bit-packed
                row[f.name] = [bool(buf[body + i // 8] >> (i % 8) & 1)
                               for i in range(count)]
            else:
                fmt = _PACK[et][1]
                row[f.name] = list(struct.unpack_from(
                    f"<{count}{fmt}", buf, body))
            continue
        if code != 2:
            raise ValueError("CapnProto: expected byte-list pointer")
        blob = buf[body:body + count - 1]      # strip NUL
        row[f.name] = (blob.decode("utf-8", "replace")
                       if dt is T.StringType else bytearray(blob))
    return row


def _decode_row(buf: bytes, pos: int, schema: T.StructType,
                slots) -> tuple[dict, int]:
    nseg_m1, first_len = struct.unpack_from("<II", buf, pos)
    if nseg_m1 != 0:
        raise NotImplementedError(
            "CapnProto: multi-segment messages not supported")
    seg_start = pos + 8
    root = struct.unpack_from("<Q", buf, seg_start)[0]
    if root & 3 != 0:
        raise ValueError("CapnProto: root is not a struct pointer")
    data_words = (root >> 32) & 0xFFFF
    n_ptrs = (root >> 48) & 0xFFFF
    content = seg_start + 8 + _signed30(root >> 2) * 8
    row = _decode_struct_content(buf, content, data_words, n_ptrs, schema)
    return row, seg_start + (first_len * 8)


def decode_capnproto_blob(buf: bytes, schema: T.StructType) -> list[dict]:
    schema = _schema(schema)
    _dw, _np, slots = _layout(schema)
    rows = []
    pos, n = 0, len(buf)
    while pos < n:
        row, pos = _decode_row(buf, pos, schema, slots)
        rows.append(row)
    return rows


def read_capnproto(spark: SparkSession, path: str,
                   schema: T.StructType) -> DataFrame:
    """CapnProto file source: blobs via binaryFile, executor-local
    message walk, Arrow-batched back to the JVM."""
    schema = _schema(schema)
    names = [f.name for f in schema.fields]
    blobs = spark.read.format("binaryFile").load(path).select("content")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[dict] = []
            for blob in pdf["content"]:
                rows.extend(decode_capnproto_blob(bytes(blob), schema))
            yield pd.DataFrame(
                {c: [r.get(c) for r in rows] for c in names},
                columns=names)

    return blobs.mapInPandas(batches, schema=schema)
