"""Aggregate-state sketches: the -State / -Merge combinator surface.

Reference: AggregateFunction(f, T) columns store partial aggregate
state that later queries finish with -Merge (reference
src/DataTypes/DataTypeAggregateFunction.h, combinators
src/AggregateFunctions/Combinators/AggregateFunctionState.h /
AggregateFunctionMerge.h); uniq/uniqTheta/quantileTDigest keep sketch
states (AggregateFunctionUniq.h, AggregateFunctionQuantile*.h).

Spark mapping: DataSketches builtins — HLL for uniqState/uniqMerge,
KLL for quantile states, Theta for uniqTheta. The state is a BinaryType
column exactly like the reference's serialized AggregateFunction value:
storable in a table (AggregatingMergeTree pattern), mergeable across
partial aggregations, and finishable with an estimate function. This is
the scale path for pre-aggregated rollup tables: day-level states merge
into month-level answers without rescanning raw data.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ------------------------------------------------------------ uniq (HLL)

def uniq_state(col: Column | str, lg_k: int = 12) -> Column:
    """uniqState(x): HLL sketch of the distinct set (binary state)."""
    return F.hll_sketch_agg(col, F.lit(lg_k))


def uniq_merge(state_col: Column | str) -> Column:
    """uniqMerge(state): merge partial HLL states -> distinct estimate."""
    return F.hll_sketch_estimate(F.hll_union_agg(state_col))


def uniq_theta_state(col: Column | str) -> Column:
    """uniqThetaState(x): Theta sketch state (supports set operations)."""
    return F.theta_sketch_agg(col)


def uniq_theta_estimate(state: Column | str) -> Column:
    return F.theta_sketch_estimate(state)


# -------------------------------------------------------- quantile (KLL)

def quantile_state(col: Column | str, k: int = 200) -> Column:
    """quantileState(x): KLL sketch of a double column."""
    return F.kll_sketch_agg_double(col, F.lit(k))


def _kll_fold(states_arr: Column) -> Column:
    """Fold an array of KLL states into one (kll_sketch_merge_double is
    a binary scalar, not an aggregate — fold head into tail)."""
    head = F.element_at(states_arr, 1)
    tail = F.slice(states_arr, 2,
                   F.greatest(F.size(states_arr) - 1, F.lit(0)))
    return F.aggregate(tail, head,
                       lambda acc, s: F.kll_sketch_merge_double(acc, s))


def quantile_merge(state_col: Column | str, q: float) -> Column:
    """quantileMerge(q)(state): merge KLL states -> q-quantile estimate.
    Aggregate form: collects the group's states and folds them (state
    count per group = upstream partition count, i.e. small)."""
    return F.kll_sketch_get_quantile_double(
        _kll_fold(F.collect_list(state_col)), F.lit(q))


# ---------------------------------------------------- rollup table helper

def rollup_states(df: DataFrame, keys: Sequence[str],
                  uniq_cols: Sequence[str] = (),
                  quantile_cols: Sequence[str] = (),
                  sum_cols: Sequence[str] = ()) -> DataFrame:
    """Build a pre-aggregated state table (AggregatingMergeTree insert
    transform): per key, HLL states for ``uniq_cols``, KLL states for
    ``quantile_cols``, plain sums for ``sum_cols``.

    The output is storable Parquet (binary state columns) and re-mergeable
    to any coarser key set with :func:`merge_states` — the aggregate
    projection / summary-table scale pattern.
    """
    aggs: list[Column] = []
    for c in uniq_cols:
        aggs.append(uniq_state(c).alias(f"{c}__uniq_state"))
    for c in quantile_cols:
        aggs.append(quantile_state(F.col(c).cast("double")).alias(f"{c}__q_state"))
    for c in sum_cols:
        aggs.append(F.sum(c).alias(f"{c}__sum"))
        # non-null count so a routed avg can divide by the F.avg denominator
        aggs.append(F.count(c).alias(f"{c}__cnt"))
    aggs.append(F.count("*").alias("__rows"))
    return df.groupBy(*keys).agg(*aggs)


def merge_states(states: DataFrame, keys: Sequence[str],
                 quantiles: Sequence[float] = (0.5,)) -> DataFrame:
    """Finish a state table at a coarser grouping: HLL states union into
    distinct estimates, KLL states merge into quantiles, sums add."""
    aggs: list[Column] = []
    for f_ in states.schema.fields:
        if f_.name.endswith("__uniq_state"):
            base = f_.name[:-len("__uniq_state")]
            aggs.append(uniq_merge(f_.name).alias(f"{base}_uniq"))
        elif f_.name.endswith("__q_state"):
            base = f_.name[:-len("__q_state")]
            merged = _kll_fold(F.collect_list(f_.name))
            for q in quantiles:
                aggs.append(F.kll_sketch_get_quantile_double(merged, F.lit(q))
                            .alias(f"{base}_q{int(q * 100)}"))
        elif f_.name.endswith("__sum"):
            base = f_.name[:-len("__sum")]
            aggs.append(F.sum(f_.name).alias(f"{base}_sum"))
        elif f_.name.endswith("__cnt"):
            base = f_.name[:-len("__cnt")]
            aggs.append(F.sum(f_.name).alias(f"{base}_cnt"))
        elif f_.name == "__rows":
            aggs.append(F.sum("__rows").alias("rows"))
    return states.groupBy(*keys).agg(*aggs)


def aggregating_final(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """AggregatingMergeTree FINAL (reference
    src/Processors/Merges/AggregatingSortedTransform.h): merge the
    per-part partial STATES per key — HLL states union into one state,
    KLL states fold into one state, sums/counts add — keeping every
    state column re-mergeable (finishing stays a query-time -Merge, as
    in the reference).  Non-state, non-key columns keep an arbitrary
    row's value (the reference keeps the first — pick-any contract,
    refined to F.min for determinism)."""
    from .final import _key_exprs
    orig_fields = list(df.schema.fields)
    df, keys, hidden = _key_exprs(df, list(keys))
    aggs: list[Column] = []
    for f_ in orig_fields:
        if f_.name in keys:
            continue
        if f_.name.endswith("__uniq_state"):
            aggs.append(F.hll_union_agg(f_.name).alias(f_.name))
        elif f_.name.endswith("__q_state"):
            aggs.append(_kll_fold(F.collect_list(f_.name)).alias(f_.name))
        elif f_.name.endswith("__sum") or f_.name.endswith("__cnt") \
                or f_.name == "__rows":
            aggs.append(F.sum(f_.name).alias(f_.name))
        else:
            aggs.append(F.min(f_.name).alias(f_.name))
    return df.groupBy(*keys).agg(*aggs).drop(*hidden)


def merge_state_table(states: DataFrame, keys: Sequence[str]) -> DataFrame:
    """-MergeState combinator analog (reference
    src/AggregateFunctions/Combinators/AggregateFunctionState.h:
    merge states WITHOUT finalizing): re-aggregate a state table at a
    coarser key set, keeping every column a state — the multi-level
    rollup tree (hour -> day -> month summary tables), where only the
    final read finishes with :func:`merge_states`."""
    aggs: list[Column] = []
    for f_ in states.schema.fields:
        if f_.name.endswith("__uniq_state"):
            aggs.append(F.hll_union_agg(f_.name).alias(f_.name))
        elif f_.name.endswith("__q_state"):
            aggs.append(_kll_fold(F.collect_list(f_.name)).alias(f_.name))
        elif f_.name.endswith("__sum") or f_.name.endswith("__cnt") \
                or f_.name == "__rows":
            aggs.append(F.sum(f_.name).alias(f_.name))
    return states.groupBy(*keys).agg(*aggs)
