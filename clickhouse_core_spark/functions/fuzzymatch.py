"""multiFuzzyMatchAny / AnyIndex / AllIndices — approximate multi-pattern
substring matching.

Reference: src/Functions/MultiMatchAnyImpl.h fuzzy registrations (
multiFuzzyMatchAny etc.), which run Vectorscan/hyperscan with an edit
distance.  Hyperscan is a native library; this implementation covers the
LITERAL-pattern subset with the textbook Sellers approximate-matching DP
(substring Levenshtein, O(|haystack|·|pattern|) per pattern) — exact for
plain-text patterns; patterns containing regex metacharacters raise by
name (documented in LIMITS.md).

Execution shape: Arrow-batched pandas UDFs; patterns and max_distance
are literals (same constraint as the reference, which compiles the
pattern set once).
"""

from __future__ import annotations

_REGEX_METAS = set(".^$*+?()[]{}|\\")


def _check_literal(patterns: list[str]) -> None:
    for p in patterns:
        if any(c in _REGEX_METAS for c in p):
            raise NotImplementedError(
                f"multiFuzzyMatch*: regex pattern {p!r} needs hyperscan; "
                f"only literal patterns are supported")


def fuzzy_substring_within(haystack: str, pattern: str, d: int) -> bool:
    """Sellers DP: does haystack contain a substring with Levenshtein
    distance <= d from pattern?"""
    m = len(pattern)
    if m == 0:
        return True
    if d >= m:
        return True
    prev = list(range(m + 1))
    best = prev[m]
    for ch in haystack:
        cur = [0] * (m + 1)
        for i in range(1, m + 1):
            cur[i] = min(prev[i - 1] + (pattern[i - 1] != ch),
                         prev[i] + 1, cur[i - 1] + 1)
        if cur[m] < best:
            best = cur[m]
        if best <= d:
            return True
        prev = cur
    return best <= d


def match_indices(haystack: str, patterns: list[str], d: int) -> list[int]:
    return [i + 1 for i, p in enumerate(patterns)
            if fuzzy_substring_within(haystack, p, d)]


def build() -> tuple[dict, dict]:
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    from .unicode_ext import _UDF_CACHE

    def _c(x) -> Column:
        return x if isinstance(x, Column) else (
            F.col(x) if isinstance(x, str) else F.lit(x))

    def _norm_args(distance, patterns):
        d = int(distance)
        pats = [str(p).strip("'\"") for p in patterns]
        _check_literal(pats)
        return d, pats

    def _indices_udf(d: int, pats: tuple):
        key = f"fuzzy_{d}_{hash(pats)}"
        udf = _UDF_CACHE.get(key)
        if udf is None:
            import pandas as pd
            from pyspark.sql.pandas.functions import pandas_udf
            from pyspark.sql.types import ArrayType, IntegerType

            def _apply(s):
                return s.map(lambda v: [] if v is None
                             else match_indices(str(v), list(pats), d))

            _apply.__annotations__ = {"s": pd.Series, "return": pd.Series}
            udf = pandas_udf(_apply, ArrayType(IntegerType()))
            _UDF_CACHE[key] = udf
        return udf

    def any_match(haystack, distance, patterns):
        d, pats = _norm_args(distance, patterns)
        return (F.size(_indices_udf(d, tuple(pats))(
            _c(haystack).cast("string"))) > 0).cast("int")

    def any_index(haystack, distance, patterns):
        d, pats = _norm_args(distance, patterns)
        idx = _indices_udf(d, tuple(pats))(_c(haystack).cast("string"))
        return F.coalesce(F.element_at(idx, 1), F.lit(0))

    def all_indices(haystack, distance, patterns):
        d, pats = _norm_args(distance, patterns)
        return _indices_udf(d, tuple(pats))(_c(haystack).cast("string"))

    fns = {
        "multiFuzzyMatchAny": any_match,
        "multiFuzzyMatchAnyIndex": any_index,
        "multiFuzzyMatchAllIndices": all_indices,
    }
    return fns, {}
