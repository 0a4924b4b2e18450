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
