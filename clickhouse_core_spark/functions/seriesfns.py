"""Time-series scalar functions over array columns: FFT period
detection and seasonal decomposition.

Reference:
- src/Functions/seriesPeriodDetectFFT.cpp — pocketfft r2c there,
  numpy.fft.rfft here: the SAME discrete transform, so the dominant-bin
  walk below (spec_len = (len-1)//2, argmax over bins 1..spec_len-1,
  step = 0.5/(spec_len-1), period = round(1/freq)) reproduces the
  reference to float rounding.
- src/Functions/seriesDecomposeSTL.cpp — stl-cpp LOESS there; here the
  textbook CLASSICAL additive decomposition (centered moving-average
  trend, phase-mean seasonal, residual) — a documented divergence
  (LIMITS.md): same contract shape ([seasonal, trend, residual]), same
  exact recovery on clean periodic + linear-trend series, different
  smoothing on noisy interiors.

Arrow-batched pandas UDFs (numpy per batch) — map-side only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .unicode_ext import _UDF_CACHE


def _c(x) -> Column:
    return x if isinstance(x, Column) else (
        F.col(x) if isinstance(x, str) else F.lit(x))


def period_detect_fft(vals) -> float:
    import numpy as np
    a = np.asarray(vals, dtype=np.float64)
    n = len(a)
    if n < 4:
        return float("nan")
    out = np.fft.rfft(a)
    spec_len = (n - 1) // 2
    mags = np.abs(out[1:spec_len])
    if mags.size == 0 or float(mags.max()) == 0.0:
        return 0.0
    idx = 1 + int(mags.argmax())
    step = 0.5 / (spec_len - 1)
    # std::round = half away from zero (Python round is banker's)
    import math
    return float(math.floor(1.0 / (idx * step) + 0.5))


def decompose_classical(vals, period: int):
    """[seasonal, trend, residual] lists; None on invalid input."""
    import numpy as np
    a = np.asarray(vals, dtype=np.float64)
    n = len(a)
    if period < 2 or n < 2 * period:
        return None
    # centered moving average of window `period` (even windows use the
    # standard half-weight endpoints via a second MA(2) pass)
    if period % 2 == 1:
        kernel = np.full(period, 1.0 / period)
        trend_core = np.convolve(a, kernel, mode="valid")
        pad_l = (period - 1) // 2
    else:
        kernel = np.full(period, 1.0 / period)
        ma = np.convolve(a, kernel, mode="valid")
        trend_core = (ma[:-1] + ma[1:]) / 2.0
        pad_l = period // 2
    pad_r = n - pad_l - len(trend_core)
    trend = np.concatenate([
        np.full(pad_l, trend_core[0]), trend_core,
        np.full(pad_r, trend_core[-1])])
    # phase means use only the interior (where the centered MA is
    # valid) — the padded edges would bias the seasonal estimate
    detrended = a - trend
    interior = np.full(n, np.nan)
    interior[pad_l:pad_l + len(trend_core)] = \
        detrended[pad_l:pad_l + len(trend_core)]
    phase_means = np.array([
        np.nanmean(interior[p::period]) for p in range(period)])
    phase_means -= phase_means.mean()
    seasonal = np.tile(phase_means, n // period + 1)[:n]
    residual = a - trend - seasonal
    return [seasonal.tolist(), trend.tolist(), residual.tolist()]


def build() -> tuple[dict, dict]:
    def _period_udf():
        udf = _UDF_CACHE.get("series_period_fft")
        if udf is None:
            import pandas as pd
            from pyspark.sql.pandas.functions import pandas_udf
            from pyspark.sql.types import DoubleType

            def _apply(s):
                return s.map(lambda v: None if v is None
                             else period_detect_fft(list(v)))

            _apply.__annotations__ = {"s": pd.Series, "return": pd.Series}
            udf = pandas_udf(_apply, DoubleType())
            _UDF_CACHE["series_period_fft"] = udf
        return udf

    def _stl_udf(period: int):
        key = f"series_stl_{period}"
        udf = _UDF_CACHE.get(key)
        if udf is None:
            import pandas as pd
            from pyspark.sql.pandas.functions import pandas_udf
            from pyspark.sql.types import ArrayType, DoubleType

            def _apply(s):
                return s.map(lambda v: None if v is None
                             else decompose_classical(list(v), period))

            _apply.__annotations__ = {"s": pd.Series, "return": pd.Series}
            udf = pandas_udf(_apply, ArrayType(ArrayType(DoubleType())))
            _UDF_CACHE[key] = udf
        return udf

    fns = {
        "seriesPeriodDetectFFT": lambda x: _period_udf()(
            _c(x).cast("array<double>")),
        "seriesDecomposeSTL": lambda x, period: _stl_udf(int(period))(
            _c(x).cast("array<double>")),
    }
    return fns, {}
