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
- single-segment messages with the standard 32-bit segment table.

Out of scope (raise by name): unions, groups, nested structs, lists of
non-byte elements, Data vs Text distinction (both map to StringType /
BinaryType), non-zero field defaults (the XOR rule collapses to raw
values when defaults are zero, which is what a Spark schema declares).

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


def _layout(schema: T.StructType):
    """Return (data_words, n_ptrs, slots) where slots[i] is
    ('data', bit_offset) or ('ptr', ptr_index) per schema field."""
    alloc = _SlotAllocator()
    slots = []
    n_ptrs = 0
    for f in schema.fields:
        dt = type(f.dataType)
        if dt in (T.StringType, T.BinaryType):
            slots.append(("ptr", n_ptrs))
            n_ptrs += 1
        elif dt in _LG_BITS:
            slots.append(("data", alloc.alloc(_LG_BITS[dt])))
        else:
            raise NotImplementedError(
                f"CapnProto: field type {f.dataType} not in the flat-"
                f"struct subset")
    return alloc.data_words, n_ptrs, slots


def _encode_row(row: dict, schema: T.StructType,
                data_words: int, n_ptrs: int, slots) -> bytes:
    data = bytearray(data_words * 8)
    ptr_words = [0] * n_ptrs
    blobs = bytearray()
    blob_word_base = 1 + data_words + n_ptrs  # after root ptr

    for f, (kind, off) in zip(schema.fields, slots):
        v = row.get(f.name)
        dt = type(f.dataType)
        if kind == "data":
            if v is None:
                continue  # zero = capnp default
            if dt is T.BooleanType:
                if v:
                    data[off // 8] |= 1 << (off % 8)
            else:
                struct.pack_into(_PACK[dt], data, off // 8, v)
        else:
            if v is None:
                continue  # null pointer
            raw = (v.encode("utf-8") if isinstance(v, str)
                   else bytes(v)) + b"\x00"
            count = len(raw)
            pad = (-count) % 8
            # list pointer: B=1, offset = words from END of this ptr
            # word to blob start, elem size 2 (1 byte), count
            ptr_word_pos = 1 + data_words + off
            blob_start_word = blob_word_base + len(blobs) // 8
            rel = blob_start_word - (ptr_word_pos + 1)
            ptr_words[off] = (1 | (rel << 2) | (2 << 32)
                              | (count << 35))
            blobs.extend(raw + b"\x00" * pad)

    seg = bytearray()
    # root struct pointer: A=0, offset 0, data size, ptr size
    seg.extend(struct.pack("<Q", (data_words << 32) | (n_ptrs << 48)))
    seg.extend(data)
    for w in ptr_words:
        seg.extend(struct.pack("<Q", w & ((1 << 64) - 1)))
    seg.extend(blobs)
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
    root_off = (root >> 2) & 0x3FFFFFFF
    if root_off & 0x20000000:  # signed 30-bit
        root_off -= 1 << 30
    data_words = (root >> 32) & 0xFFFF
    n_ptrs = (root >> 48) & 0xFFFF
    content = seg_start + 8 + root_off * 8
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
        else:
            if off >= n_ptrs:
                row[f.name] = None
                continue
            ptr_pos = content + (data_words + off) * 8
            w = struct.unpack_from("<Q", buf, ptr_pos)[0]
            if w == 0:
                row[f.name] = None
                continue
            if w & 3 != 1 or (w >> 32) & 7 != 2:
                raise ValueError("CapnProto: expected byte-list pointer")
            rel = (w >> 2) & 0x3FFFFFFF
            if rel & 0x20000000:
                rel -= 1 << 30
            count = w >> 35
            blob = buf[ptr_pos + 8 + rel * 8:
                       ptr_pos + 8 + rel * 8 + count - 1]  # strip NUL
            row[f.name] = (blob.decode("utf-8", "replace")
                           if dt is T.StringType else bytearray(blob))
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
