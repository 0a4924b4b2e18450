"""Streaming window operators.

Reference semantics: WindowView tumble/hop windows
(reference src/Storages/WindowView/StorageWindowView.h:41-53), watermark
modes strictly-ascending / ascending / bounded (:74-91,
src/Processors/Transforms/WatermarkTransform.h:10-21), allowed lateness
(:90-91).  Spark mapping is direct: ``F.window`` for tumble/hop,
``withWatermark`` for bounded-lateness firing; late rows beyond the
watermark are dropped — the same contract as the reference's default
(late data discarded unless ALLOWED_LATENESS fires partial updates).

These helpers work identically on batch and streaming DataFrames (the
batch path is how the oracle correctness gate exercises them).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumble(df: DataFrame, ts_col: str, size: str,
           alias: str = "window") -> DataFrame:
    """tumble(t, INTERVAL size): assign each row to its fixed window."""
    return df.withColumn(alias, F.window(F.col(ts_col), size))


def hop(df: DataFrame, ts_col: str, slide: str, size: str,
        alias: str = "window") -> DataFrame:
    """hop(t, slide, size): overlapping windows — rows replicate into
    size/slide windows (Spark's sliding window does the replication)."""
    return df.withColumn(alias, F.window(F.col(ts_col), size, slide))


def with_watermark(df: DataFrame, ts_col: str, delay: str) -> DataFrame:
    """Bounded-out-of-orderness watermark (WATERMARK = INTERVAL delay):
    window state older than max(ts) - delay is finalized and late rows
    are dropped."""
    return df.withWatermark(ts_col, delay)


def windowed_aggregate(df: DataFrame, ts_col: str, size: str,
                       aggs: Sequence[Column], keys: Sequence[str] = (),
                       slide: str | None = None,
                       watermark: str | None = None) -> DataFrame:
    """Tumbling/hopping windowed aggregation, batch or streaming.

    Streaming: pass ``watermark`` to bound state; output mode 'append'
    emits each window once its watermark passes — the reference's
    fire-at-window-end semantics.
    """
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), size, slide) if slide else F.window(F.col(ts_col), size)
    agged = df.groupBy(win.alias("window"), *keys).agg(*aggs)
    value_cols = [c for c in agged.columns if c != "window" and c not in keys]
    return agged.select(F.col("window.start").alias("wstart"),
                        F.col("window.end").alias("wend"),
                        *keys, *value_cols)


def stateful_sessionize(df: DataFrame, key_col: str, ts_col: str,
                        value_col: str, gap_seconds: int) -> DataFrame:
    """Custom stateful streaming operator: gap-based session aggregation
    via ``applyInPandasWithState`` — the Spark surface for operators the
    built-in windowed aggs can't express (the reference's equivalent is
    a WindowView with AggregateFunction inner state, reference
    src/Storages/WindowView/StorageWindowView.h:28-40).

    Per key, state = (session_start, last_ts, n_events, v_sum).  A new
    event more than ``gap_seconds`` after the last one CLOSES the open
    session (emitted downstream) and starts a new one; the final open
    session stays in state until more data or timeout.  State is
    per-key-bounded (four scalars), so 100 TB scale-out is governed by
    key cardinality only — identical to the reference's per-window
    aggregate state contract.

    Works on a streaming DataFrame (output mode 'append'); pandas
    receives Arrow batches per key.
    """
    import pandas as pd  # local import: executors ship this lazily

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (DoubleType, LongType, StringType,
                                   StructField, StructType)

    out_schema = StructType([
        StructField("k", StringType()),
        StructField("session_start", LongType()),
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
        StructField("v_sum", DoubleType()),
    ])
    state_schema = StructType([
        StructField("start", LongType()), StructField("last", LongType()),
        StructField("cnt", LongType()), StructField("vsum", DoubleType()),
    ])

    def fn(key, pdfs, state: GroupState):
        evs = pd.concat(list(pdfs), ignore_index=True)
        evs = evs.sort_values("__ts_s")
        if state.exists:
            start, last, cnt, vsum = state.get
        else:
            start = last = None
            cnt, vsum = 0, 0.0
        closed = []
        for ts_s, v in zip(evs["__ts_s"], evs["__v"]):
            ts_s = int(ts_s)
            if last is not None and ts_s - last > gap_seconds:
                closed.append((key[0], start, last, cnt, vsum))
                start, cnt, vsum = ts_s, 0, 0.0
            if start is None:
                start = ts_s
            last = ts_s
            cnt += 1
            vsum += float(v) if v is not None else 0.0
        state.update((start, last, cnt, vsum))
        if closed:
            yield pd.DataFrame(closed, columns=[f.name for f in out_schema.fields])

    prepared = df.select(
        F.col(key_col).cast("string").alias("k"),
        F.unix_timestamp(F.col(ts_col)).alias("__ts_s"),
        F.col(value_col).cast("double").alias("__v"))
    return (prepared.groupBy("k")
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append", GroupStateTimeout.NoTimeout))
