"""PromQL-style time-series regridding aggregates.

Reference: the timeSeries*ToGrid family (src/AggregateFunctions/
AggregateFunctionTimeseriesExtrapolatedValue.h — rate/delta with
Prometheus extrapolation, Apache-2.0 logic vendored there from
prometheus/promql/functions.go; AggregateFunctionTimeseriesInstantValue.h
— irate/idelta over the last two samples;
AggregateFunctionTimeseriesToGridSparse.h — resample with staleness;
AggregateFunctionTimeseriesBase.h — bucketing, duplicate timestamps keep
the max value).

Semantics per grid point t = start + i*step, i in [0, (end-start)/step]:

- samples considered are those with  t - window <= ts <= t  (both ends
  inclusive: the reference evicts when ``front.ts + window < t``);
- ``rate`` / ``delta``: need >= 2 in-window samples; value difference
  last - first (+ accumulated counter resets for rate), scaled by the
  Prometheus boundary-extrapolation factor; rate divides by window;
- ``instant_rate`` / ``instant_delta``: last two samples with ts <= t,
  provided the older one is still within the window; NULL when the two
  share a timestamp; instant_rate treats a decrease as a counter reset
  (uses the raw new value);
- ``resample``: value of the newest in-window sample (staleness =
  window), else NULL.

Spark shape — built for the 100 TB case: each sample affects at most
``window/step + 1`` grid points, so samples EXPLODE to their (series,
grid index) cells and aggregate with one shuffle — an equi-join on
(keys, i), never a range/theta join against the grid.  Per-cell math is
a fold over the cell's sorted sample array in pure Catalyst expressions.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KINDS = ("rate", "delta", "instant_rate", "instant_delta", "resample",
         "last_two")


def _epoch_seconds(col: Column, dtype: str) -> Column:
    if dtype.startswith("timestamp"):
        return F.unix_micros(col.cast("timestamp")) / F.lit(1e6)
    return col.cast("double")


def time_series_to_grid(df: DataFrame, keys: Sequence[str], ts_col: str,
                        value_col: str, start: float, end: float,
                        step: float, window: float,
                        kind: str | Sequence[str] = "rate",
                        out_col: str | Sequence[str] = "result") -> DataFrame:
    """One row per (series, grid point): ``keys + [grid_ts, out_col]``
    (for ``last_two``: ts1/v1 newest, ts2/v2 previous).  Grid points a
    series never samples near still appear, with NULL result — the
    reference emits a full bucket array per group.

    r14: ``kind``/``out_col`` may be parallel SEQUENCES — every kind is
    a different projection of the SAME per-cell sample array, so N
    kinds in one call share one grid pipeline (sample pass, explode,
    cell aggregation, grid join) where N separate calls ran it N times
    and joined (ts_instant_rate_grid: 2 pipelines + join → 1 pipeline,
    4 parquet scans → 2)."""
    kinds = [kind] if isinstance(kind, str) else list(kind)
    out_cols = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(kinds) != len(out_cols):
        raise ValueError("kind and out_col must have the same length")
    for k in kinds:
        if k not in KINDS:
            raise ValueError(f"kind must be one of {KINDS}")
    if "last_two" in kinds and len(kinds) > 1:
        raise ValueError("last_two emits fixed columns; request it alone")
    keys = list(keys)
    n_buckets = int((end - start) // step) + 1

    t = _epoch_seconds(F.col(ts_col), dict(df.dtypes)[ts_col])
    # duplicate timestamps keep max value (Base.h Bucket::add) — one
    # map-side-combinable pre-aggregation
    samples = (df.select(*keys, t.alias("__t"),
                         F.col(value_col).cast("double").alias("__v"))
               .filter(F.col("__t") <= F.lit(float(end)))
               .filter(F.col("__t") >= F.lit(float(start - window)))
               .groupBy(*keys, "__t").agg(F.max("__v").alias("__v")))

    # sample at __t affects grid i where start+i*step-window <= __t <= start+i*step
    i_min = F.greatest(F.ceil((F.col("__t") - F.lit(float(start))) / F.lit(float(step))).cast("long"),
                       F.lit(0))
    i_max = F.least(F.floor((F.col("__t") - F.lit(float(start)) + F.lit(float(window)))
                            / F.lit(float(step))).cast("long"),
                    F.lit(n_buckets - 1))
    # explode skips NULL arrays, dropping samples that land between the
    # last grid point they could serve and the next (i_min > i_max)
    exploded = samples.withColumn("__i", F.explode(
        F.when(i_min <= i_max, F.sequence(i_min, i_max))))

    cells = (exploded.groupBy(*keys, "__i")
             .agg(F.array_sort(F.collect_list(F.struct(
                 F.col("__t").alias("t"), F.col("__v").alias("v"))))
                 .alias("__arr")))

    # full (series x grid) frame so sample-free cells emit NULL
    grid = (df.select(*keys).distinct()
            .select(*keys, F.explode(F.sequence(
                F.lit(0).cast("long"), F.lit(n_buckets - 1).cast("long")))
                .alias("__i")))
    full = grid.join(cells, keys + ["__i"], "left")

    gt = (F.lit(float(start)) + F.col("__i") * F.lit(float(step)))
    arr = F.col("__arr")
    n_s = F.coalesce(F.size(arr), F.lit(0))
    first = F.element_at(arr, 1)
    last = F.element_at(arr, -1)

    out = []
    for k, oc in zip(kinds, out_cols):
        if k == "resample":
            result = F.when(n_s > 0, last["v"])
            out.append(result.alias(oc))
        elif k in ("instant_delta", "instant_rate"):
            prev = F.element_at(arr, -2)
            dt = last["t"] - prev["t"]
            if k == "instant_rate":
                # counter reset: a decrease uses the raw new value
                vd = F.when(last["v"] < prev["v"], last["v"]) \
                      .otherwise(last["v"] - prev["v"])
                val = vd / dt
            else:
                val = last["v"] - prev["v"]
            result = F.when((n_s >= 2) & (dt != 0), val)
            out.append(result.alias(oc))
        elif k == "last_two":
            prev = F.element_at(arr, -2)
            out.extend([F.when(n_s >= 1, last["t"]).alias("ts1"),
                        F.when(n_s >= 1, last["v"]).alias("v1"),
                        F.when(n_s >= 2, prev["t"]).alias("ts2"),
                        F.when(n_s >= 2, prev["v"]).alias("v2")])
        else:  # rate / delta with Prometheus extrapolation
            is_rate = k == "rate"
            ti = last["t"] - first["t"]  # sampled interval
            resets = F.aggregate(
                F.sequence(F.lit(1), n_s - 1), F.lit(0.0),
                lambda acc, i: acc + F.when(
                    F.element_at(arr, (i + 1).cast("int"))["v"]
                    < F.element_at(arr, i.cast("int"))["v"],
                    F.element_at(arr, i.cast("int"))["v"]).otherwise(F.lit(0.0)))
            vd = (last["v"] - first["v"]) + (resets if is_rate else F.lit(0.0))
            avg_dur = ti / (n_s - 1).cast("double")
            thr = avg_dur * 1.1
            dts = first["t"] - (gt - F.lit(float(window)))
            dte = gt - last["t"]
            dts = F.when(dts >= thr, avg_dur / 2).otherwise(dts)
            if is_rate:
                # extrapolate only to the counter's zero point, never below
                dts = F.when((vd > 0) & (first["v"] >= 0),
                             F.least(ti * (first["v"] / vd), dts)).otherwise(dts)
            dte = F.when(dte >= thr, avg_dur / 2).otherwise(dte)
            factor = (ti + dts + dte) / ti
            if is_rate:
                factor = factor / F.lit(float(window))
            result = F.when((n_s >= 2) & (ti != 0), vd * factor)
            out.append(result.alias(oc))

    return full.select(*keys, gt.alias("grid_ts"), *out)
