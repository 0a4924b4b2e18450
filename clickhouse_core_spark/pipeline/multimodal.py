"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side contract is real and tested — schema, Arrow-batched
mapInPandas pipeline shape, partitioning; the actual codec calls are
stubbed (decode libs are not in this container) behind
``DETERMINISTIC_FAKE`` so the distributed plumbing can be exercised
end-to-end with stable outputs.

Schema convention:
    content:   binary                  (the raw bytes)
    media:     struct<kind:string, mime:string, width:int, height:int,
                      duration_ms:bigint>
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, DoubleType, IntegerType, LongType, StringType, StructField,
    StructType,
)

MEDIA_STRUCT = StructType([
    StructField("kind", StringType()),
    StructField("mime", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", LongType()),
])

# When True, decode_images/extract_features return deterministic fakes
# derived from the byte content instead of raising; flip to False in an
# environment with real codec libraries.
DETERMINISTIC_FAKE = True


def _fake_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic pseudo-dimensions from content bytes."""
    h = int.from_bytes(payload[:8].ljust(8, b"\0"), "little")
    return 16 + (h % 1024), 16 + ((h >> 10) % 1024)


def decode_images(df: DataFrame, content_col: str = "content",
                  out_prefix: str = "img") -> DataFrame:
    """Decode image binaries to (width, height, n_pixels) metadata via
    a mapInArrow pass — record batches are consumed and produced as raw
    Arrow, skipping the pandas conversion on both sides (a codec only
    needs the byte buffers).  Batch shape and schema are the production
    contract; the decode itself is stubbed.

    Real implementation would call PIL/turbojpeg per buffer here.
    """
    import pyarrow as pa

    out_schema = StructType(df.schema.fields + [
        StructField(f"{out_prefix}_width", IntegerType()),
        StructField(f"{out_prefix}_height", IntegerType()),
        StructField(f"{out_prefix}_pixels", LongType()),
    ])
    content_idx = df.schema.names.index(content_col)

    def batches(it: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for rb in it:
            if not DETERMINISTIC_FAKE:
                raise NotImplementedError("image codecs unavailable in this container")
            dims = [_fake_dims(bytes(b)) if b is not None else (0, 0)
                    for b in rb.column(content_idx).to_pylist()]
            arrays = list(rb.columns) + [
                pa.array([d[0] for d in dims], pa.int32()),
                pa.array([d[1] for d in dims], pa.int32()),
                pa.array([d[0] * d[1] for d in dims], pa.int64()),
            ]
            names = list(rb.schema.names) + [
                f"{out_prefix}_width", f"{out_prefix}_height",
                f"{out_prefix}_pixels"]
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return df.mapInArrow(batches, schema=out_schema)


def extract_features(df: DataFrame, content_col: str = "content",
                     dim: int = 8, out_col: str = "features") -> DataFrame:
    """Feature-extraction stub: deterministic pseudo-embedding of the
    binary content (real impl: a vision/audio encoder per Arrow batch).
    Output is array<float> of ``dim`` — matches the embeddings table
    contract so downstream similarity ops compose.

    The fake is portable: feature i = (md5_60bit(content || '|' || i)
    mod 2000 - 1000) / 1000, where md5_60bit is the first 15 hex digits
    of the md5 as an integer — re-computable in any SQL engine, so the
    full mapInPandas plumbing is oracle-checkable end-to-end (values in
    [-1, 1) at 1e-3 granularity survive float32 exactly at 6 dp)."""
    import hashlib

    from pyspark.sql.types import ArrayType, FloatType

    out_schema = StructType(df.schema.fields + [
        StructField(out_col, ArrayType(FloatType()))])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not DETERMINISTIC_FAKE:
                raise NotImplementedError("feature encoders unavailable in this container")
            feats = []
            for b in pdf[content_col]:
                if b is None:
                    feats.append(None)
                    continue
                raw = bytes(b)
                feats.append(np.array(
                    [(int(hashlib.md5(raw + b"|%d" % i).hexdigest()[:15], 16)
                      % 2000 - 1000) / 1000.0
                     for i in range(dim)], dtype=np.float32).tolist())
            pdf[out_col] = feats
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def sample_frames(df: DataFrame, content_col: str = "content",
                  every_ms: int = 1000, out_col: str = "frame_offsets_ms") -> DataFrame:
    """Frame-sampling plan for video binaries: emits the sampled frame
    timestamps from the (stubbed) duration; the real implementation
    would decode keyframes per batch.  Pure built-in expressions."""
    duration = (F.length(F.col(content_col)).cast("long") * 10)  # fake: 10ms/byte
    return df.withColumn(
        out_col, F.sequence(F.lit(0), duration, F.lit(int(every_ms))))


def decode_wav(df: DataFrame, content_col: str = "content",
               out_prefix: str = "wav") -> DataFrame:
    """REAL audio decode for the one container format the standard
    library fully specifies: WAV/RIFF PCM (no codec library needed —
    the public RIFF chunk layout + raw PCM samples).  Emits
    sample_rate, channels, bits, n_samples, duration_ms plus two
    signal features computed from the PCM payload: RMS level and
    zero-crossing count of channel 0.  Arrow-batched mapInPandas;
    malformed/non-WAV payloads yield NULLs rather than failing the
    batch (the ingest-pipeline contract).  Unlike decode_images this
    path has no DETERMINISTIC_FAKE — it is the genuine decoder."""
    import io
    import struct as _st
    import wave

    fields = ["sample_rate", "channels", "bits", "n_samples",
              "duration_ms", "rms", "zero_crossings"]
    out_cols = [f"{out_prefix}_{f}" for f in fields]

    def one(raw):
        if raw is None:
            return (None,) * 7
        try:
            with wave.open(io.BytesIO(bytes(raw)), "rb") as w:
                nch, width, rate, n = (w.getnchannels(), w.getsampwidth(),
                                       w.getframerate(), w.getnframes())
                pcm = w.readframes(n)
        except Exception:
            return (None,) * 7
        dur = int(n * 1000 / rate) if rate else None
        if width == 2:
            samples = np.frombuffer(pcm, dtype="<i2")
        elif width == 1:
            samples = np.frombuffer(pcm, dtype=np.uint8).astype(
                np.int16) - 128
        else:   # 24/32-bit: keep header metadata, skip signal features
            return (rate, nch, width * 8, n, dur, None, None)
        ch0 = samples[::nch] if nch else samples
        if len(ch0):
            rms = float(np.sqrt(np.mean(ch0.astype(np.float64) ** 2)))
            sb = np.signbit(np.where(ch0 == 0, 1, ch0))  # zeros count +
            zc = int(np.count_nonzero(np.diff(sb)))
        else:
            rms, zc = 0.0, 0
        return (rate, nch, width * 8, n, dur, rms, zc)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vals = [one(b) for b in pdf[content_col]]
            out = pdf.copy()
            for i, c in enumerate(out_cols):
                out[c] = [v[i] for v in vals]
            yield out

    schema = StructType(
        list(df.schema.fields)
        + [StructField(out_cols[0], IntegerType()),
           StructField(out_cols[1], IntegerType()),
           StructField(out_cols[2], IntegerType()),
           StructField(out_cols[3], LongType()),
           StructField(out_cols[4], LongType()),
           StructField(out_cols[5], DoubleType()),
           StructField(out_cols[6], LongType())])
    return df.mapInPandas(batches, schema)
