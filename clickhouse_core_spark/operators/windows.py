"""Window-function extensions.

Reference: WindowTransform.cpp registers non-SQL-standard window
functions — nonNegativeDerivative (reference
src/Processors/Transforms/WindowTransform.cpp:2569), the
exponentialTimeDecayed{Sum,Max,Count,Avg} family (:1617,1714,1789,1874),
lagInFrame/leadInFrame (:2269).  All are expressed as compositions of
Spark window expressions so they stay inside whole-stage codegen.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F


def non_negative_derivative(value: Column | str, ts: Column | str,
                            w: WindowSpec, per_seconds: float = 1.0) -> Column:
    """(value - lag(value)) / (ts - lag(ts)) scaled to ``per_seconds``,
    clamped at 0; 0.0 for the first row of each partition (reference
    WindowTransform.cpp:2569 emits the default value when no prior row)."""
    value = F.col(value) if isinstance(value, str) else value
    ts = F.col(ts) if isinstance(ts, str) else ts
    dv = value - F.lag(value).over(w)
    dt = ts.cast("double") - F.lag(ts.cast("double")).over(w)
    deriv = F.when(dt > 0, F.greatest(dv / dt * F.lit(per_seconds), F.lit(0.0)))
    return F.coalesce(deriv, F.lit(0.0))


def _decay_parts(value: Column, ts: Column, decay_seconds: float,
                 w: WindowSpec):
    """Shared machinery for the exponentialTimeDecayed* family.

    S(t_i) = sum_j v_j * exp(-(t_i - t_j)/lambda) over the frame
           = exp(-t_i'/lambda) * sum_j v_j * exp(t_j'/lambda)

    with t' = t - first(t) over the partition to keep exp() in range
    (epoch seconds would overflow double).  This keeps the whole
    computation in built-in expressions — no pandas UDF, no per-row
    Python — at the cost of requiring the partition's time span to be
    << lambda * 700 (exp double overflow), which holds for any real
    decay window.
    """
    t = ts.cast("double")
    t0 = F.first(t).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    rel = t - t0
    weight = F.exp(rel / F.lit(decay_seconds))
    return rel, weight


def exponential_time_decayed_sum(value: Column | str, ts: Column | str,
                                 decay_seconds: float, w: WindowSpec) -> Column:
    value = F.col(value) if isinstance(value, str) else value
    ts = F.col(ts) if isinstance(ts, str) else ts
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rel, weight = _decay_parts(value, ts, decay_seconds, w)
    return F.sum(value * weight).over(frame) / F.exp(rel / F.lit(decay_seconds))


def exponential_time_decayed_count(ts: Column | str, decay_seconds: float,
                                   w: WindowSpec) -> Column:
    ts = F.col(ts) if isinstance(ts, str) else ts
    return exponential_time_decayed_sum(F.lit(1.0), ts, decay_seconds, w)


def exponential_time_decayed_avg(value: Column | str, ts: Column | str,
                                 decay_seconds: float, w: WindowSpec) -> Column:
    value = F.col(value) if isinstance(value, str) else value
    num = exponential_time_decayed_sum(value, ts, decay_seconds, w)
    den = exponential_time_decayed_count(ts, decay_seconds, w)
    return num / den


def exponential_time_decayed_max(value: Column | str, ts: Column | str,
                                 decay_seconds: float, w: WindowSpec) -> Column:
    """max_j v_j * exp(-(t_i-t_j)/lambda) — same normalization trick."""
    value = F.col(value) if isinstance(value, str) else value
    ts = F.col(ts) if isinstance(ts, str) else ts
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rel, weight = _decay_parts(value, ts, decay_seconds, w)
    return F.max(value * weight).over(frame) / F.exp(rel / F.lit(decay_seconds))


def groups_frame_sum(df, keys: Sequence[str], order_col: str,
                     value_col: str, preceding: int, following: int,
                     alias: str = "groups_sum"):
    """GROUPS BETWEEN n PRECEDING AND m FOLLOWING frame emulation.

    The reference parses GROUPS frames (WindowDescription.h:32); Spark
    lacks them.  Rewrite: dense_rank over the ORDER BY column turns
    peer groups into consecutive integers, and a RANGE frame over that
    rank is exactly a GROUPS frame.  Two window passes over the same
    partitioning — one shuffle."""
    w_rank = Window.partitionBy(*keys).orderBy(order_col)
    ranked = df.withColumn("__grp_rank", F.dense_rank().over(w_rank))
    w_groups = (Window.partitionBy(*keys).orderBy("__grp_rank")
                .rangeBetween(-preceding, following))
    return (ranked.withColumn(alias, F.sum(value_col).over(w_groups))
            .drop("__grp_rank"))


def lag_in_frame(value: Column | str, offset: int, w: WindowSpec) -> Column:
    """lagInFrame: like lag but clamped to the frame — emulated with
    nth-from-end over a rows frame."""
    value = F.col(value) if isinstance(value, str) else value
    return F.first(value).over(w.rowsBetween(-offset, -offset))


def lead_in_frame(value: Column | str, offset: int, w: WindowSpec) -> Column:
    value = F.col(value) if isinstance(value, str) else value
    return F.first(value).over(w.rowsBetween(offset, offset))


def exponential_time_decayed_table(df, keys, ts_col, value_col,
                                   decay_seconds: float,
                                   tiebreak=(),
                                   out_sum: str = "dsum",
                                   out_avg: str = "davg"):
    """Numerically-stable exponentialTimeDecayedSum/Avg over arbitrary
    time spans (reference WindowTransform.cpp:1617+).

    The Column-returning forms above use the rebased-weight window trick,
    which overflows double once the partition's time span exceeds
    ~700 * decay: exp((t - t0)/decay) saturates.  This DataFrame-level
    variant folds the per-key time-sorted events with the decay
    RECURRENCE  s_i = v_i + s_{i-1} * exp(-(t_i - t_{i-1})/decay)  whose
    factors never exceed 1 — stable for any span.  Same state contract
    as window_funnel: one key's events are folded as an array.

    Returns df columns ``keys + tiebreak + [out_sum, out_avg]``.
    """
    keys = list(keys)
    tiebreak = list(tiebreak)
    ev = F.struct(
        (F.unix_micros(F.col(ts_col)) / 1e6).alias("t"),
        *[F.col(c).alias(c) for c in tiebreak],
        F.col(value_col).cast("double").alias("v"))
    per_key = (df.groupBy(*keys)
               .agg(F.array_sort(F.collect_list(ev)).alias("__evs")))

    init = F.struct(
        F.lit(None).cast("double").alias("pt"),
        F.lit(0.0).alias("s"), F.lit(0.0).alias("c"),
        F.array().cast("array<struct<s:double,c:double>>").alias("out"))

    def step(acc, e):
        decay = F.when(acc["pt"].isNull(), F.lit(1.0)) \
                 .otherwise(F.exp((acc["pt"] - e["t"]) / F.lit(decay_seconds)))
        s = acc["s"] * decay + e["v"]
        c = acc["c"] * decay + 1
        return F.struct(
            e["t"].alias("pt"), s.alias("s"), c.alias("c"),
            F.concat(acc["out"], F.array(F.struct(
                s.alias("s"), c.alias("c")))).alias("out"))

    folded = (per_key.withColumn(
        "__out", F.aggregate("__evs", init, step, lambda a: a["out"]))
        .withColumn("__z", F.explode(F.arrays_zip("__evs", "__out")))
        .select(*keys,
                *[F.col(f"__z.__evs.{c}").alias(c) for c in tiebreak],
                F.col("__z.__out.s").alias(out_sum),
                (F.col("__z.__out.s") / F.col("__z.__out.c")).alias(out_avg)))
    return folded


def running_difference(value: Column | str, w: WindowSpec) -> Column:
    """runningDifference(x) (reference src/Functions/runningDifference.h):
    difference to the previous row, 0 on the first row.  The reference
    computes this per block (order = insertion order); here the order is
    the explicit window spec — the deterministic refinement of the same
    contract (the reference docs themselves deprecate the block form in
    favor of window functions)."""
    v = F.col(value) if isinstance(value, str) else value
    return v - F.lag(v, 1, None).over(w) if False else \
        F.coalesce(v - F.lag(v).over(w), F.lit(0))


def running_difference_starting_with_first_value(value: Column | str,
                                                 w: WindowSpec) -> Column:
    """runningDifferenceStartingWithFirstValue (same registration file
    as runningDifference): the first row yields its own value instead
    of 0."""
    v = F.col(value) if isinstance(value, str) else value
    return F.coalesce(v - F.lag(v).over(w), v)


def running_accumulate(value: Column | str, w: WindowSpec) -> Column:
    """runningAccumulate(agg_state) (reference
    src/Functions/runningAccumulate.cpp): cumulative aggregation in
    window order — for the sum state this is the running-total window
    (the reference's block-order semantics map to the explicit window
    spec, the same deprecation note as runningDifference)."""
    v = F.col(value) if isinstance(value, str) else value
    return F.sum(v).over(w.rowsBetween(Window.unboundedPreceding, 0))


def row_number_in_all_blocks(w: WindowSpec) -> Column:
    """rowNumberInAllBlocks() — 0-based global row number in window
    order (rowNumberInBlock coincides: blocks are an execution detail
    the DataFrame model doesn't expose)."""
    return F.row_number().over(w) - 1


def neighbor(value: Column | str, offset: int, w: WindowSpec,
             default=None) -> Column:
    """neighbor(x, offset[, default]) (reference
    src/Functions/neighbor.cpp): the value ``offset`` rows away in the
    window order; ``default`` (NULL if omitted) past the edge."""
    v = F.col(value) if isinstance(value, str) else value
    if offset >= 0:
        return F.lead(v, offset, default).over(w)
    return F.lag(v, -offset, default).over(w)
