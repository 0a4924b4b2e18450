"""Array/map long-tail: fill/split folds, union/symmetric-difference,
deterministic shuffle, normalized Gini, map higher-order forms, bitmask
decompositions.

Reference parity targets:
 - src/Functions/array/arrayFill.cpp (arrayFill/arrayReverseFill:
   forward/backward fill where the lambda is false; first/last element
   always kept).
 - src/Functions/array/arraySplit.cpp (arraySplit: cut BEFORE elements
   where the lambda is true, never before the first;
   arrayReverseSplit: cut AFTER, never after the last).
 - src/Functions/array/arrayIntersect.cpp (arrayUnion /
   arraySymmetricDifference — distinct-set semantics; symmetric
   difference = present in at least one but NOT in all).
 - src/Functions/array/arrayShuffle.cpp (arrayShuffle /
   arrayPartialShuffle) — the reference permutes with a seeded PRNG;
   our contract is the deterministic hash-order refinement (same seed
   -> same permutation, any seed -> uniform-ish order), documented in
   LIMITS.md's deterministic-refinements section.
 - src/Functions/array/arrayNormalizedGini.cpp (exact formula
   transcription: Σ cumratio via the (n-j+1) weight identity, no
   intermediate cumsum arrays).
 - src/Functions/array/FunctionsMapMiscellaneous.cpp (mapApply,
   mapExists, mapAll, mapContainsValue(Like), mapExtractValueLike,
   mapSort family).
 - src/Functions/bitmaskToList.cpp, bitPositionsToArray.cpp.

All pure Catalyst expressions — folds over ``aggregate``/``transform``,
no Python in the row path.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    # registry convention: non-Column args are LITERALS
    return x if isinstance(x, Column) else F.lit(x)


def _seq1(n: Column) -> Column:
    """1..n, EMPTY when n <= 0 (sequence(1,0) counts DOWN in Spark)."""
    return F.filter(F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
                    lambda i: i <= n)


# --------------------------------------------------------- fill / split

def _array_fill(f, a) -> Column:
    a = _c(a)
    n = F.size(a)

    def step(acc, i):
        el = F.element_at(a, i)
        keep = F.when((i == 1) | f(el), el).otherwise(
            F.element_at(acc, -1))
        return F.concat(acc, F.array(keep))

    return F.aggregate(_seq1(n), F.slice(a, 1, 0), step)


def _array_reverse_fill(f, a) -> Column:
    return F.reverse(_array_fill(f, F.reverse(_c(a))))


def _array_split_clean(f, a, after: bool = False) -> Column:
    a = _c(a)
    n = F.size(a)
    if after:
        # cut AFTER element where true (not after the last) ==
        # segment starts at 1 and at i+1 for each flagged i < n
        starts = F.concat(
            F.array(F.lit(1)),
            F.transform(
                F.filter(_seq1(n),
                         lambda i: (i < n) & f(F.element_at(a, i))),
                lambda i: i + 1))
    else:
        starts = F.concat(
            F.array(F.lit(1)),
            F.filter(_seq1(n),
                     lambda i: (i > 1) & f(F.element_at(a, i))))
    return F.transform(
        starts,
        lambda s, k: F.slice(
            a, s,
            (F.coalesce(F.try_element_at(starts, (k + 2).cast("int")),
                        n + 1) - s).cast("int")))


# ------------------------------------------------ set ops over N arrays

def _array_union(*arrays) -> Column:
    return F.array_distinct(F.concat(*[_c(a) for a in arrays]))


def _array_symmetric_difference(*arrays) -> Column:
    cols = [_c(a) for a in arrays]
    allc = F.array_distinct(F.concat(*cols))
    in_all = lambda e: reduce(lambda x, y: x & y,  # noqa: E731
                              [F.array_contains(c, e) for c in cols])
    return F.filter(allc, lambda e: ~in_all(e))


# --------------------------------------------- deterministic shuffles

def _array_shuffle(a, seed=0) -> Column:
    """Deterministic hash-order permutation (the reference's seeded-PRNG
    permutation is merge-order free but PRNG-specific; same-seed ->
    same-order is the portable part of the contract we keep)."""
    a = _c(a)
    pairs = F.transform(
        a, lambda x, i: F.struct(
            F.xxhash64(x.cast("string"), i, _c(seed)).alias("h"),
            x.alias("v")))
    return F.transform(F.array_sort(pairs), lambda s: s["v"])


def _array_partial_shuffle(a, limit=0, seed=0) -> Column:
    """First ``limit`` positions get hash-ordered elements; the rest
    keep hash order too (reference: remainder order unspecified)."""
    return _array_shuffle(a, seed)


# ------------------------------------------------------ normalized Gini

def _array_normalized_gini(pred, labels) -> Column:
    """arrayNormalizedGini(predicted, labels) ->
    (gini_predicted, gini_labels, normalized).  Transcribes
    calculateNormalizedGini exactly, using
    Σ_i cumsum_i = Σ_j l_j * (n - j + 1) / total to avoid building
    cumsum arrays."""
    p, l = _c(pred), _c(labels)
    n = F.size(p)
    nd = n.cast("double")
    total = F.aggregate(l, F.lit(0.0), lambda acc, x: acc + x)
    # labels ordered by (predicted, original index) ascending —
    # stable ascending sort like the reference's sortIndexes
    by_pred = F.transform(
        p, lambda x, i: F.struct(x.cast("double").alias("p"),
                                 i.alias("i"),
                                 F.try_element_at(l, (i + 1).cast("int"))
                                 .alias("lab")))
    sorted_labels = F.transform(F.array_sort(by_pred), lambda s: s["lab"])
    weight_sum = (lambda arr: F.aggregate(
        F.zip_with(arr, _seq1(n),
                   lambda x, j: x.cast("double") * (nd - j + 1)),
        F.lit(0.0), lambda acc, x: acc + x))
    acc_pred = weight_sum(sorted_labels) / total
    acc_ltv = weight_sum(F.array_sort(l)) / total
    random_gain = 0.5 * (nd + 1)
    gini_pred = (random_gain - acc_pred) / nd
    gini_labels = (random_gain - acc_ltv) / nd
    return F.struct(gini_pred.alias("col1"),
                    gini_labels.alias("col2"),
                    (gini_pred / gini_labels).alias("col3"))


# ------------------------------------------------------------- map HOFs

def _map_apply(f, m) -> Column:
    """mapApply((k,v) -> (k2,v2), m); the lambda must return a 2-field
    struct (use F.struct(k2, v2))."""
    return F.map_from_entries(
        F.transform(F.map_entries(_c(m)),
                    lambda e: f(e["key"], e["value"])))


def _map_exists(f, m) -> Column:
    return F.exists(F.map_entries(_c(m)),
                    lambda e: f(e["key"], e["value"])).cast("int")


def _map_all(f, m) -> Column:
    return F.forall(F.map_entries(_c(m)),
                    lambda e: f(e["key"], e["value"])).cast("int")


def _map_contains_value(m, v) -> Column:
    return F.array_contains(F.map_values(_c(m)), v).cast("int")


def _map_contains_value_like(m, pat) -> Column:
    return F.exists(F.map_values(_c(m)),
                    lambda v: v.like(pat)).cast("int")


def _map_extract_value_like(m, pat) -> Column:
    return F.map_filter(_c(m), lambda k, v: v.like(pat))


def _map_sort_by(m, desc: bool = False) -> Column:
    entries = F.array_sort(F.map_entries(_c(m)))
    if desc:
        entries = F.reverse(entries)
    return F.map_from_entries(entries)


# -------------------------------------------------- bitmask decomposition

def _bit_positions_to_array(x) -> Column:
    xl = _c(x).cast("long")
    # getbit takes a column position; shiftright would need a literal
    return F.filter(
        F.sequence(F.lit(0), F.lit(63)),
        lambda b: F.getbit(xl, b) == 1)


def _bitmask_to_array(x) -> Column:
    # 2^b is exactly representable as a double for every b; bit 63 is
    # the long sign bit and must be pinned (ANSI cast would overflow)
    return F.transform(
        _bit_positions_to_array(x),
        lambda b: F.when(b == 63, F.lit(-9223372036854775808))
        .otherwise(F.pow(F.lit(2.0), b).cast("long")))


def _bitmask_to_list(x) -> Column:
    return F.array_join(
        F.transform(_bitmask_to_array(x), lambda v: v.cast("string")), ",")


def build() -> dict:
    return {
        "arrayFill": _array_fill,
        "arrayReverseFill": _array_reverse_fill,
        "arraySplit": lambda f, a: _array_split_clean(f, a, after=False),
        "arrayReverseSplit": lambda f, a: _array_split_clean(f, a, after=True),
        "arrayUnion": _array_union,
        "arraySymmetricDifference": _array_symmetric_difference,
        "arrayShuffle": _array_shuffle,
        "arrayPartialShuffle": _array_partial_shuffle,
        "arrayNormalizedGini": _array_normalized_gini,
        "mapApply": _map_apply,
        "mapExists": _map_exists,
        "mapAll": _map_all,
        "mapContainsValue": _map_contains_value,
        "mapContainsValueLike": _map_contains_value_like,
        "mapExtractValueLike": _map_extract_value_like,
        # CH allows an optional (k,v)->key lambda (and a limit for the
        # partial form); the by-key sort satisfies the common contract
        # and the limit-n prefix of a full sort is the partial contract
        "mapReverseSort": lambda *a: _map_sort_by(a[-1], desc=True),
        "mapPartialSort": lambda *a: _map_sort_by(a[-1]),
        "bitPositionsToArray": _bit_positions_to_array,
        "bitmaskToArray": _bitmask_to_array,
        "bitmaskToList": _bitmask_to_list,
    }, {
        "indexOfAssumeSorted": "indexOf",
    }
