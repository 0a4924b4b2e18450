"""Histogram / reservoir quantile variants beyond the exact family.

Reference semantics:
- quantileTiming (reference src/AggregateFunctions/QuantileTiming.h:241-425):
  fixed-precision timing histogram — values < 1024 counted exactly,
  1024 <= x < 30000 in 16-wide buckets, >= 30000 clamped to 30000; the
  quantile walks cumulative counts to ceil(count * level).
- quantileBFloat16 (src/AggregateFunctions/QuantileBFloat16Histogram.h:43):
  histogram over the value truncated to bfloat16 (high 16 bits of the
  float32 representation), quantile at ceil(sum_weight * level).
- quantileDeterministic (src/AggregateFunctions/ReservoirSamplerDeterministic.h:111):
  linear-interpolated quantile at index level*(n-1) over a
  determinator-keyed reservoir of at most 8192 samples.
- quantileInterpolatedWeighted
  (src/AggregateFunctions/AggregateFunctionQuantileInterpolatedWeighted.cpp:112):
  weighted-percentile method — distinct values with summed weights,
  positions x_i = (cumw_i - w_i/2) / W, piecewise-linear interpolation
  with flat extrapolation beyond the ends.

All are expressed as groupBy + window passes over bucketed/deduplicated
values — the histogram cardinality (not the row count) bounds the
per-group work, so partial aggregation and AQE keep them scalable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TIMING_SMALL = 1024
_TIMING_BIG = 30000
_TIMING_PRECISION = 16


def _histogram_quantile(counts: DataFrame, keys: Sequence[str],
                        key_col: str, weight_col: str, level: float,
                        alias: str) -> DataFrame:
    """First bucket key where the running count reaches
    ceil(total * level) — the shared walk of QuantileTiming.h:408 and
    QuantileBFloat16Histogram.h:148. ``counts`` has one row per
    (keys, bucket); the window sort is over bucket cardinality."""
    keys = list(keys)
    wo = Window.partitionBy(*keys).orderBy(key_col)
    wa = Window.partitionBy(*keys)
    d = (counts.withColumn("__cum", F.sum(weight_col).over(wo))
         .withColumn("__thr", F.ceil(F.sum(weight_col).over(wa) * F.lit(float(level)))))
    return (d.filter(F.col("__cum") >= F.col("__thr"))
            .groupBy(*keys).agg(F.min(key_col).alias(alias)))


def quantile_timing(df: DataFrame, keys: Sequence[str], value_col: str,
                    level: float, alias: str = "q",
                    weight_col: str | None = None) -> DataFrame:
    """quantileTiming(level)(value) (QuantileTiming.h:241).

    Bucket key: x < 1024 exact; 1024 <= x < 30000 in 16-wide buckets;
    x >= 30000 (and the reference's "beyond stored data" fallthrough,
    QuantileTiming.h:424) collapses to the 30000 sentinel.  The
    reference jitters big-bucket representatives by intHash32(i) % 16 - 8
    (QuantileTiming.h:265) purely so results don't all look even; we use
    the deterministic bucket midpoint (+8) instead — within the same
    16-wide bucket, engine-portable, and reproducible by any oracle.
    Negative inputs count toward bucket 0 like the reference's unsigned
    wrap never occurs in timing data; we clamp at 0 explicitly.
    """
    x = F.greatest(F.floor(F.col(value_col)).cast("long"), F.lit(0).cast("long"))
    bucket = (F.when(x < _TIMING_SMALL, x)
              .when(x < _TIMING_BIG,
                    (F.floor((x - _TIMING_SMALL) / _TIMING_PRECISION)
                     * _TIMING_PRECISION + _TIMING_SMALL + _TIMING_PRECISION // 2)
                    .cast("long"))
              .otherwise(F.lit(_TIMING_BIG).cast("long")))
    w = (F.count("*") if weight_col is None
         else F.sum(F.col(weight_col).cast("long")))  # TimingWeighted
    counts = (df.filter(F.col(value_col).isNotNull())
              .groupBy(*keys, bucket.alias("__b"))
              .agg(w.alias("__w")))
    return _histogram_quantile(counts, keys, "__b", "__w", level, alias)


def bfloat16_expr(col: Column | str) -> Column:
    """Truncate to bfloat16 via exponent/mantissa arithmetic (the
    high-16-bits cut of QuantileBFloat16Histogram.h:104, expressed
    without bit reinterpretation): keep 7 mantissa bits, truncating
    toward zero.  Zero and NULL pass through; the double is cast to
    float32 first so the cast's rounding matches the reference's
    static_cast<Float32> before the cut."""
    v = (F.col(col) if isinstance(col, str) else col).cast("float").cast("double")
    av = F.abs(v)
    e = F.floor(F.log2(av))
    scale = F.pow(F.lit(2.0), e)
    truncated = (F.signum(v) * F.floor(av / scale * 128.0) / 128.0 * scale)
    return F.when(v.isNull() | (v == 0.0) | F.isnan(v), v).otherwise(truncated)


def quantile_bfloat16(df: DataFrame, keys: Sequence[str], value_col: str,
                      level: float, weight_col: str | None = None,
                      alias: str = "q") -> DataFrame:
    """quantileBFloat16[Weighted](level)(value[, weight])
    (QuantileBFloat16Histogram.h:43): histogram of bfloat16-truncated
    values, quantile at the first bucket reaching ceil(W * level).
    NaNs are skipped like the reference's add()."""
    w = (F.lit(1).cast("long") if weight_col is None
         else F.col(weight_col).cast("long"))
    counts = (df.filter(F.col(value_col).isNotNull()
                        & ~F.isnan(F.col(value_col).cast("double")))
              .groupBy(*keys, bfloat16_expr(value_col).alias("__b"))
              .agg(F.sum(w).alias("__w")))
    return _histogram_quantile(counts, keys, "__b", "__w", level, alias)


def _nth_sorted(df: DataFrame, keys: Sequence[str], value_col: str,
                n_of_s, alias: str) -> DataFrame:
    """Value at 0-based index ``n_of_s(group_size)`` of the per-group
    sorted values (ties among equal values are index-irrelevant)."""
    keys = list(keys)
    wo = Window.partitionBy(*keys).orderBy(value_col)
    wa = Window.partitionBy(*keys)
    d = (df.filter(F.col(value_col).isNotNull())
         .withColumn("__rn", F.row_number().over(wo))
         .withColumn("__s", F.count("*").over(wa)))
    n = n_of_s(F.col("__s"))
    return (d.filter(F.col("__rn") == n + 1)
            .groupBy(*keys).agg(F.min(value_col).alias(alias)))


def quantile_exact_low(df: DataFrame, keys: Sequence[str], value_col: str,
                       level: float, alias: str = "q") -> DataFrame:
    """quantileExactLow (reference QuantileExact.h:263): python
    statistics.median_low at level 0.5 (even size takes the LOWER of the
    middle pair); otherwise the element at floor(level * size)."""
    def n_of_s(s):
        if level == 0.5:
            return F.when(s % 2 == 1, F.floor(s / 2)) \
                    .otherwise(F.floor(s / 2) - 1).cast("long")
        return F.least(F.floor(F.lit(float(level)) * s), s - 1).cast("long")
    return _nth_sorted(df, keys, value_col, n_of_s, alias)


def quantile_exact_high(df: DataFrame, keys: Sequence[str], value_col: str,
                        level: float, alias: str = "q") -> DataFrame:
    """quantileExactHigh (QuantileExact.h:345): statistics.median_high
    at 0.5 (even size takes the UPPER middle); else floor(level*size)."""
    def n_of_s(s):
        if level == 0.5:
            return F.floor(s / 2).cast("long")
        return F.least(F.floor(F.lit(float(level)) * s), s - 1).cast("long")
    return _nth_sorted(df, keys, value_col, n_of_s, alias)


def _excel_quantile(df: DataFrame, keys: Sequence[str], value_col: str,
                    h_of_s, alias: str) -> DataFrame:
    """Shared Excel-style interpolation: h = h_of_s(size), n = floor(h),
    result = arr[n-1] + (h - n) * (arr[n] - arr[n-1]) (1-based),
    clamped to min/max outside [1, size)."""
    keys = list(keys)
    wo = Window.partitionBy(*keys).orderBy(value_col)
    wa = Window.partitionBy(*keys)
    d = (df.filter(F.col(value_col).isNotNull())
         .withColumn("__rn", F.row_number().over(wo))
         .withColumn("__s", F.count("*").over(wa)))
    v = F.col(value_col).cast("double")
    h = h_of_s(F.col("__s"))
    n = F.floor(h).cast("long")
    d = (d.withColumn("__h", h).withColumn("__n", n)
         .withColumn("__vlo", F.when(F.col("__rn") == n, v))
         .withColumn("__vhi", F.when(F.col("__rn") == n + 1, v)))
    agg = (d.groupBy(*keys)
           .agg(F.first("__h").alias("__h"), F.first("__n").alias("__n"),
                F.first("__s").alias("__s"),
                F.min("__vlo").alias("__vlo"), F.min("__vhi").alias("__vhi"),
                F.min(v).alias("__mn"), F.max(v).alias("__mx")))
    hn, nn, sn = F.col("__h"), F.col("__n"), F.col("__s")
    res = (F.when(nn >= sn, F.col("__mx"))
           .when(nn < 1, F.col("__mn"))
           .otherwise(F.col("__vlo")
                      + (hn - nn) * (F.col("__vhi") - F.col("__vlo"))))
    return agg.select(*keys, res.alias(alias))


def quantile_exact_exclusive(df: DataFrame, keys: Sequence[str],
                             value_col: str, level: float,
                             alias: str = "q") -> DataFrame:
    """quantileExactExclusive — Excel PERCENTILE.EXC / R-6
    (QuantileExact.h:129): h = level * (size + 1).  Level must be
    strictly inside (0, 1)."""
    if not 0.0 < level < 1.0:
        raise ValueError("quantileExactExclusive needs 0 < level < 1")
    return _excel_quantile(df, keys, value_col,
                           lambda s: F.lit(float(level)) * (s + 1), alias)


def quantile_exact_inclusive(df: DataFrame, keys: Sequence[str],
                             value_col: str, level: float,
                             alias: str = "q") -> DataFrame:
    """quantileExactInclusive — Excel PERCENTILE.INC / R-7
    (QuantileExact.h:191): h = level * (size - 1) + 1."""
    return _excel_quantile(df, keys, value_col,
                           lambda s: F.lit(float(level)) * (s - 1) + 1, alias)


def quantile_deterministic(df: DataFrame, keys: Sequence[str],
                           value_col: str, determinator_col: str,
                           level: float, max_samples: int = 8192,
                           alias: str = "q") -> DataFrame:
    """quantileDeterministic(level)(value, determinator)
    (ReservoirSamplerDeterministic.h:111): interpolated quantile at
    index level*(n-1) over a reservoir keyed by the determinator.

    Deterministic refinement of the sampling step: the reference's
    skip-degree reservoir keeps values whose intHash64(determinator)
    has enough trailing zero bits — arrival-order-free but tied to an
    engine-private hash.  We keep the ``max_samples`` rows with the
    smallest md5(determinator) (same determinator ⇒ same fate, any
    engine reproduces the draw).  Groups with n <= max_samples keep
    everything, where both contracts agree exactly with the plain
    interpolated quantile.
    """
    keys = list(keys)
    draw = F.md5(F.col(determinator_col).cast("string"))
    wd = Window.partitionBy(*keys).orderBy(draw, determinator_col, value_col)
    sample = (df.filter(F.col(value_col).isNotNull())
              .withColumn("__keep", F.row_number().over(wd))
              .filter(F.col("__keep") <= max_samples))
    wo = Window.partitionBy(*keys).orderBy(value_col)
    wa = Window.partitionBy(*keys)
    d = (sample.withColumn("__rn", F.row_number().over(wo))
         .withColumn("__n", F.count("*").over(wa)))
    n, rn = F.col("__n"), F.col("__rn")
    v = F.col(value_col).cast("double")
    idx = F.lit(float(level)) * (n - 1)
    left = F.floor(idx).cast("long") + 1        # 1-based left index
    vlo = F.min(F.when(rn == left, v))
    vhi = F.min(F.when(rn == left + 1, v))
    frac = F.min(idx - (left - 1))
    return (d.groupBy(*keys)
            .agg((vlo + F.coalesce(frac * (vhi - vlo), F.lit(0.0))).alias(alias)))


def quantile_interpolated_weighted(df: DataFrame, keys: Sequence[str],
                                   value_col: str, weight_col: str,
                                   level: float,
                                   alias: str = "q") -> DataFrame:
    """quantileInterpolatedWeighted(level)(value, weight)
    (AggregateFunctionQuantileInterpolatedWeighted.cpp:112): weighted
    percentile over distinct values — positions
    x_i = (cumw_i - w_i/2) / W, then piecewise-linear interpolation
    between the bracketing (x_l, x_u], flat beyond the ends.

    The interpolation segment is the one the reference's binary search
    picks: l = the last position <= level, capped to the second-to-last
    row (cpp:166 clamps idx to size-2), with the level<x_l / level>x_r
    overrides of cpp:298-301 collapsing to the boundary value.
    """
    keys = list(keys)
    lvl = F.lit(float(level))
    per_val = (df.filter(F.col(value_col).isNotNull())
               .groupBy(*keys, value_col)
               .agg(F.sum(F.col(weight_col).cast("double")).alias("__w")))
    wo = Window.partitionBy(*keys).orderBy(value_col)
    wa = Window.partitionBy(*keys)
    d = (per_val.withColumn("__cum", F.sum("__w").over(wo))
         .withColumn("__tot", F.sum("__w").over(wa))
         .withColumn("__x", (F.col("__cum") - 0.5 * F.col("__w")) / F.col("__tot"))
         .withColumn("__rn", F.row_number().over(wo))
         .withColumn("__n", F.count("*").over(wa))
         .withColumn("__xn", F.lead("__x").over(wo))
         .withColumn("__yn", F.lead(F.col(value_col).cast("double")).over(wo)))
    # the row the reference interpolates from: last x_i <= level,
    # defaulting to the first row, capped at n-1
    pick = F.max(F.when(F.col("__x") <= lvl, F.col("__rn"))).over(wa)
    d = (d.withColumn("__pick",
                      F.least(F.greatest(F.coalesce(pick, F.lit(1)), F.lit(1)),
                              F.greatest(F.col("__n") - 1, F.lit(1))))
         .filter(F.col("__rn") == F.col("__pick")))
    y = F.col(value_col).cast("double")
    xl, xr, yl, yr = F.col("__x"), F.col("__xn"), y, F.col("__yn")
    interp = (F.when(xr.isNull() | (xr == xl), yl)
              .when(lvl < xl, yl)
              .when(lvl > xr, yr)
              .otherwise(yl + (lvl - xl) * (yr - yl) / (xr - xl)))
    return d.select(*keys, interp.alias(alias))
