"""Bitmap states and their algebra, Spark-first.

Reference: src/AggregateFunctions/AggregateFunctionGroupBitmap.cpp
(groupBitmap / groupBitmapState / groupBitmapAnd / groupBitmapOr /
groupBitmapXor over a RoaringBitmap state) and
src/Functions/FunctionsBitmap.cpp (bitmapBuild, bitmapAnd/Or/Xor/Andnot
[+Cardinality], bitmapContains, bitmapHasAll/Any, bitmapMin/Max,
bitmapSubsetInRange, bitmapSubsetLimit, subBitmap, bitmapToArray).

Representation: a bitmap *state* is a DEDUPLICATED, SORTED
``array<long>`` column — the exact-value analog of the reference's
roaring bitmap.  The whole algebra lowers to Catalyst's native array
set operations (``array_intersect`` / ``array_union`` /
``array_except`` / ``filter`` / ``slice``), so every function here is
JVM-side, codegen-friendly, and shuffle-free given already-aggregated
states.

Scale: state size is the group's exact distinct cardinality.  That is
the same contract as the reference's bitmap type (roaring compresses
but still materializes every member).  For web-scale distinct sets
where exactness can be traded away, use the HLL/theta sketch states in
``operators/sketches.py``; this module is the exact path, sized for
dimension-bounded key domains (user cohorts, label sets, enum ids).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


# ---------------------------------------------------------------- build

def bitmap_build(values: Column | str) -> Column:
    """bitmapBuild(array) (FunctionsBitmap.cpp): canonical state from an
    array column — deduplicated and sorted."""
    return F.array_sort(F.array_distinct(_c(values)))


def group_bitmap_state(df: DataFrame, keys: Sequence[str], value_col: str,
                       alias: str = "bm") -> DataFrame:
    """groupBitmapState(x) per group (AggregateFunctionGroupBitmap.cpp):
    one sorted distinct-value array per key.  collect_set is map-side
    combinable, so the shuffle carries partial sets, not raw rows."""
    return (df.groupBy(*keys)
            .agg(F.array_sort(F.collect_set(_c(value_col).cast("long")))
                 .alias(alias)))


# -------------------------------------------------------------- algebra

def bitmap_and(a, b) -> Column:
    return F.array_sort(F.array_intersect(_c(a), _c(b)))


def bitmap_or(a, b) -> Column:
    return F.array_sort(F.array_union(_c(a), _c(b)))


def bitmap_xor(a, b) -> Column:
    return F.array_sort(F.array_except(F.array_union(_c(a), _c(b)),
                                       F.array_intersect(_c(a), _c(b))))


def bitmap_andnot(a, b) -> Column:
    return F.array_sort(F.array_except(_c(a), _c(b)))


def bitmap_cardinality(a) -> Column:
    return F.size(_c(a)).cast("long")


def bitmap_and_cardinality(a, b) -> Column:
    return F.size(F.array_intersect(_c(a), _c(b))).cast("long")


def bitmap_or_cardinality(a, b) -> Column:
    return F.size(F.array_union(_c(a), _c(b))).cast("long")


def bitmap_xor_cardinality(a, b) -> Column:
    return F.size(F.array_except(F.array_union(_c(a), _c(b)),
                                 F.array_intersect(_c(a), _c(b)))).cast("long")


def bitmap_andnot_cardinality(a, b) -> Column:
    return F.size(F.array_except(_c(a), _c(b))).cast("long")


# ------------------------------------------------------------ membership

def bitmap_contains(a, x) -> Column:
    return F.array_contains(_c(a), x if isinstance(x, Column) else F.lit(x))


def bitmap_has_any(a, b) -> Column:
    return F.arrays_overlap(_c(a), _c(b))


def bitmap_has_all(a, b) -> Column:
    """True when every member of b is in a (bitmapHasAll(a, b))."""
    return F.size(F.array_except(_c(b), _c(a))) == 0


def bitmap_min(a) -> Column:
    return F.array_min(_c(a))


def bitmap_max(a) -> Column:
    return F.array_max(_c(a))


def bitmap_to_array(a) -> Column:
    """bitmapToArray: states are already sorted arrays — identity plus a
    defensive sort for states built outside this module."""
    return F.array_sort(_c(a))


# --------------------------------------------------------------- subsets

def bitmap_subset_in_range(a, lo, hi) -> Column:
    """Members in [lo, hi) (bitmapSubsetInRange)."""
    lo_c = lo if isinstance(lo, Column) else F.lit(lo)
    hi_c = hi if isinstance(hi, Column) else F.lit(hi)
    return F.filter(_c(a), lambda x: (x >= lo_c) & (x < hi_c))


def bitmap_subset_limit(a, start, limit) -> Column:
    """At most ``limit`` members >= start, in sorted order
    (bitmapSubsetLimit)."""
    start_c = start if isinstance(start, Column) else F.lit(start)
    return F.slice(F.filter(_c(a), lambda x: x >= start_c), 1, limit)


def sub_bitmap(a, offset, limit) -> Column:
    """``limit`` members from 0-based sorted ``offset`` (subBitmap)."""
    return F.slice(_c(a), offset + 1, limit)


# ----------------------------------------------- state-merging aggregates

def _merge_states(state_col: Column, combine) -> Column:
    """Fold collected states with ``combine``; NULL seed so the first
    state passes through unchanged (groupBitmapAnd needs a true
    intersection identity, which empty-array is not)."""
    return F.aggregate(
        F.collect_list(state_col),
        F.lit(None).cast("array<long>"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(combine(acc, x)))


def group_bitmap_and(df: DataFrame, keys: Sequence[str], state_col: str,
                     alias: str = "bm_and") -> DataFrame:
    """groupBitmapAnd: intersect all states per group."""
    out = _merge_states(_c(state_col), bitmap_and)
    return df.groupBy(*keys).agg(out.alias(alias))


def group_bitmap_or(df: DataFrame, keys: Sequence[str], state_col: str,
                    alias: str = "bm_or") -> DataFrame:
    """groupBitmapOr: union all states per group (equals re-aggregating
    the raw values, but merges pre-built states without re-scanning)."""
    out = _merge_states(_c(state_col), bitmap_or)
    return df.groupBy(*keys).agg(out.alias(alias))


def group_bitmap_xor(df: DataFrame, keys: Sequence[str], state_col: str,
                     alias: str = "bm_xor") -> DataFrame:
    """groupBitmapXor: symmetric difference across states — keeps values
    present in an odd number of states."""
    out = _merge_states(_c(state_col), bitmap_xor)
    return df.groupBy(*keys).agg(out.alias(alias))
