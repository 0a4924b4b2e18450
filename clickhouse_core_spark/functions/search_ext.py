"""Search/similarity long-tail: case-insensitive & UTF8 multi-search
variants, regex multi-match, subsequence/substring containment, and the
fold-based edit/Jaro similarity family.

Reference parity targets:
 - src/Functions/MultiSearchAllPositionsImpl.h / MultiSearchImpl.h
   (multiSearch*CaseInsensitive[UTF8] variants are the same scan with a
   case-folding transform — here ``lower()`` on both sides).
 - src/Functions/MultiMatchAnyImpl.h (multiMatchAny/AnyIndex/AllIndices;
   the reference uses Vectorscan when available, else RE2 one-by-one —
   the one-by-one contract is what we express, as an OR-fold of
   ``rlike`` so Catalyst keeps it codegen'd).
 - src/Functions/HasSubsequenceImpl.h (hasSubsequence* — subsequence,
   not substring: chars in order with gaps allowed).
 - src/Functions/array/hasSubstr.cpp (contiguous array containment).
 - src/Functions/FunctionsStringDistance.cpp (jaroSimilarity,
   jaroWinklerSimilarity, damerauLevenshteinDistance/OSA) — expressed
   as Catalyst ``aggregate`` folds over the code points, no Python in
   the row path.

Spark strings are code-point addressed, so every *UTF8 variant is the
base implementation (CH's non-UTF8 forms are byte-addressed; the
distinction only shows on multi-byte text — documented in LIMITS.md
under length() polymorphism).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    # registry convention: non-Column args are LITERALS
    return x if isinstance(x, Column) else F.lit(x)


def _regex_escape(s: str) -> str:
    out = []
    for ch in str(s):
        out.append("\\" + ch if ch in r"\.[]{}()*+-?^$|" else ch)
    return "".join(out)


def _seq1(n: Column) -> Column:
    """1..n as an array, EMPTY when n <= 0.  ``sequence(1, 0)`` counts
    DOWN in Spark, and folds over it would index past empty arrays —
    an ANSI-session error — so build ascending and filter."""
    return F.filter(F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
                    lambda i: i <= n)


# ------------------------------------------------- case-insensitive scans

def _multi_positions_ci(h, needles) -> Column:
    low = F.lower(_c(h))
    return F.array(*[F.instr(low, str(n).lower()).cast("long")
                     for n in needles])


def _first_position(pos_arr: Column) -> Column:
    return F.coalesce(
        F.array_min(F.filter(pos_arr, lambda p: p > 0)), F.lit(0))


def _first_index(pos_arr: Column) -> Column:
    return F.coalesce(
        F.array_position(pos_arr,
                         F.array_min(F.filter(pos_arr, lambda p: p > 0))),
        F.lit(0)).cast("long")


def _count_substrings_ci(x, n) -> Column:
    low, nl = F.lower(_c(x)), str(n).lower()
    return ((F.length(low) - F.length(F.replace(low, F.lit(nl), F.lit(""))))
            / F.length(F.lit(nl))).cast("long")


def _has_token_ci(h, tok) -> Column:
    return _c(h).rlike(
        r"(?i)(?<![A-Za-z0-9_])" + _regex_escape(tok)
        + r"(?![A-Za-z0-9_])").cast("int")


# ----------------------------------------------------- regex multi-match

def _multi_match_any(x, pats) -> Column:
    out = F.lit(False)
    for p in pats:
        out = out | _c(x).rlike(str(p))
    return out.cast("int")


def _multi_match_any_index(x, pats) -> Column:
    # reference returns *some* matching index; ours is the first (a
    # deterministic refinement of the pick-any contract)
    hits = F.array(*[F.when(_c(x).rlike(str(p)), i + 1)
                     for i, p in enumerate(pats)])
    return F.coalesce(F.array_min(hits), F.lit(0)).cast("long")


def _multi_match_all_indices(x, pats) -> Column:
    hits = F.array(*[F.when(_c(x).rlike(str(p)), i + 1)
                     for i, p in enumerate(pats)])
    return F.filter(hits, lambda v: v.isNotNull())


# ------------------------------------------------ subsequence/containment

def _has_subsequence(h, needle, ci: bool = False) -> Column:
    rx = ".*".join(_regex_escape(ch) for ch in str(needle))
    rx = "(?s)" + ("(?i)" if ci else "") + ".*" + rx + ".*"
    return _c(h).rlike(rx).cast("int") if rx else F.lit(1)


def _has_substr(a, b) -> Column:
    """hasSubstr(arr, sub): sub occurs in arr as a CONTIGUOUS run
    (array/hasSubstr.cpp).  Empty sub -> 1."""
    a, b = _c(a), _c(b)
    nb = F.size(b)
    found = F.exists(
        _seq1(F.size(a) - nb + 1),
        lambda i: F.slice(a, i, nb) == b)
    return F.when(nb == 0, F.lit(1)).otherwise(found.cast("int"))


def _compare_substrings(s1, s2, off1, off2, n) -> Column:
    """compareSubstrings(s1, s2, o1, o2, n) (src/Functions/
    compareSubstrings.cpp): memcmp of n code points starting at
    0-based offsets; -1/0/1."""
    a = F.substring(_c(s1), _c(off1) + 1, _c(n))
    b = F.substring(_c(s2), _c(off2) + 1, _c(n))
    return (F.when(a < b, -1).when(a > b, 1).otherwise(0)).cast("tinyint")


# ----------------------------------------- fold-based string similarity

def _chars(s) -> Column:
    # Spark split uses Java split(regex, -1), which KEEPS the trailing
    # empty string: split('abc', '') = [a, b, c, ''] — drop empties.
    return F.filter(F.split(_c(s), ""), lambda c: c != "")


def _jaro(a, b) -> Column:
    """jaroSimilarity (FunctionsStringDistance.cpp ByteJaroSimilarity):
    greedy in-window matching + transposition count, as one aggregate
    fold carrying the used-position set."""
    c1, c2 = _chars(a), _chars(b)
    m, n = F.size(c1), F.size(c2)
    w = F.greatest((F.greatest(m, n) / 2).cast("int") - 1, F.lit(0))

    init = F.named_struct(
        F.lit("js"), F.array().cast("array<int>"),
        F.lit("ach"), F.array().cast("array<string>"))

    def step(acc, i):
        j = F.array_min(F.filter(
            _seq1(n),
            lambda j: (F.abs(j - i) <= w)
            & ~F.array_contains(acc["js"], j.cast("int"))
            & (F.element_at(c2, j) == F.element_at(c1, i))))
        return F.when(
            j.isNotNull(),
            F.named_struct(
                F.lit("js"), F.concat(acc["js"], F.array(j.cast("int"))),
                F.lit("ach"), F.concat(acc["ach"],
                                       F.array(F.element_at(c1, i))))
        ).otherwise(acc)

    st = F.aggregate(_seq1(m), init, step)
    m1 = F.size(st["js"]).cast("double")
    bm = F.transform(F.array_sort(st["js"]),
                     lambda j: F.element_at(c2, j))
    t = (F.size(F.filter(F.zip_with(st["ach"], bm, lambda x, y: x != y),
                         lambda v: v)) / 2.0)
    jaro = (m1 / m + m1 / n + (m1 - t) / m1) / 3.0
    # reference quirk (FunctionsStringDistance.cpp shortcuts): an empty
    # side returns the OTHER side's LENGTH (so ''~''=0.0, ''~'abc'=3.0)
    # — mirrored faithfully, quirk and all.
    return (F.when(m == 0, n.cast("double"))
            .when(n == 0, m.cast("double"))
            .when(m1 == 0, 0.0)
            .otherwise(jaro))


def _jaro_winkler(a, b) -> Column:
    """jaroWinklerSimilarity: jaro + l*0.1*(1-jaro), l = common prefix
    capped at 4 (FunctionsStringDistance.cpp)."""
    c1, c2 = _chars(a), _chars(b)
    m, n = F.size(c1), F.size(c2)
    jaro = _jaro(a, b)
    lmax = F.least(F.lit(4), m, n)
    prefix = F.aggregate(
        _seq1(lmax), F.lit(0),
        lambda acc, k: F.when(
            (acc == k - 1) & (F.element_at(c1, k) == F.element_at(c2, k)),
            k.cast("int")).otherwise(acc))
    prefix = F.when(lmax >= 1, prefix).otherwise(0)
    # prefix boost applies only above the 0.7 threshold
    # (FunctionsStringDistance.cpp:445-466); empty-side length quirk
    # propagates from _jaro's shortcut branches.
    return (F.when((m == 0) | (n == 0), jaro)
            .when(jaro > 0.7,
                  jaro + prefix.cast("double") * 0.1 * (1.0 - jaro))
            .otherwise(jaro))


def _damerau_levenshtein(a, b) -> Column:
    """damerauLevenshteinDistance — the optimal-string-alignment form
    the reference implements (FunctionsStringDistance.cpp
    ByteDamerauLevenshteinDistance): Levenshtein + adjacent-swap,
    no substring moves.  Two-row DP as nested aggregate folds."""
    c1, c2 = _chars(a), _chars(b)
    m, n = F.size(c1), F.size(c2)

    init = F.named_struct(
        F.lit("pp"), F.array().cast("array<int>"),
        F.lit("p"), F.transform(F.sequence(F.lit(0), n),
                                lambda j: j.cast("int")))
    big = F.lit(1 << 30)

    def row(acc, i):
        p, pp = acc["p"], acc["pp"]

        def cell(r, j):
            sub = (F.element_at(p, j)
                   + F.when(F.element_at(c1, i) == F.element_at(c2, j), 0)
                   .otherwise(1))
            ins = F.element_at(r, j) + 1        # r holds curr[0..j-1]
            dele = F.element_at(p, j + 1) + 1
            tr = F.when(
                (i > 1) & (j > 1)
                & (F.element_at(c1, i) == F.element_at(c2, j - 1))
                & (F.element_at(c1, i - 1) == F.element_at(c2, j)),
                F.try_element_at(pp, (j - 1).cast("int")) + 1).otherwise(big)
            return F.concat(r, F.array(
                F.least(sub, ins, dele, tr).cast("int")))

        curr = F.aggregate(_seq1(n),
                           F.array(i.cast("int")), cell)
        return F.named_struct(F.lit("pp"), p, F.lit("p"), curr)

    st = F.aggregate(_seq1(m), init, row)
    return (F.when(m == 0, n).when(n == 0, m)
            .otherwise(F.element_at(st["p"], n + 1))).cast("long")


def _ngram_distance_ci(base):
    return lambda a, b: base(F.lower(_c(a)), F.lower(_c(b)))


def build(base_ngram_distance) -> dict:
    """Return the registry dict; ``base_ngram_distance`` is the
    4-gram distance already defined in registry.py."""
    nd_ci = _ngram_distance_ci(base_ngram_distance)
    d = {
        "multiSearchAnyCaseInsensitive": lambda x, needles: F.when(
            F.lower(_c(x)).rlike(
                "|".join(_regex_escape(str(n).lower()) for n in needles)),
            1).otherwise(0),
        "multiSearchAllPositionsCaseInsensitive": _multi_positions_ci,
        "multiSearchFirstPositionCaseInsensitive":
            lambda h, needles: _first_position(_multi_positions_ci(h, needles)),
        "multiSearchFirstIndexCaseInsensitive":
            lambda h, needles: _first_index(_multi_positions_ci(h, needles)),
        "countSubstringsCaseInsensitive": _count_substrings_ci,
        "countMatchesCaseInsensitive": lambda x, rx: F.size(
            F.regexp_extract_all(_c(x), F.lit("(?i)" + str(rx)), F.lit(0))
        ).cast("long"),
        "hasTokenCaseInsensitive": _has_token_ci,
        "hasTokenCaseInsensitiveOrNull": _has_token_ci,
        "notILike": lambda x, p: (~_c(x).ilike(p)).cast("int"),
        "multiMatchAny": _multi_match_any,
        "multiMatchAnyIndex": _multi_match_any_index,
        "multiMatchAllIndices": _multi_match_all_indices,
        "hasSubsequence": lambda h, n: _has_subsequence(h, n),
        "hasSubsequenceCaseInsensitive":
            lambda h, n: _has_subsequence(h, n, ci=True),
        "hasSubstr": _has_substr,
        "compareSubstrings": _compare_substrings,
        "ngramDistanceCaseInsensitive": nd_ci,
        "ngramSearchCaseInsensitive": lambda a, b: 1.0 - nd_ci(a, b),
        "jaroSimilarity": _jaro,
        "jaroWinklerSimilarity": _jaro_winkler,
        "damerauLevenshteinDistance": _damerau_levenshtein,
    }
    # UTF8 forms: Spark strings are code-point addressed, so the base
    # implementation IS the UTF8 semantics.
    utf8_alias = {
        "multiSearchAnyUTF8": "multiSearchAny",
        "multiSearchAnyCaseInsensitiveUTF8": "multiSearchAnyCaseInsensitive",
        "multiSearchAllPositionsUTF8": "multiSearchAllPositions",
        "multiSearchAllPositionsCaseInsensitiveUTF8":
            "multiSearchAllPositionsCaseInsensitive",
        "multiSearchFirstPositionUTF8": "multiSearchFirstPosition",
        "multiSearchFirstPositionCaseInsensitiveUTF8":
            "multiSearchFirstPositionCaseInsensitive",
        "multiSearchFirstIndexUTF8": "multiSearchFirstIndex",
        "multiSearchFirstIndexCaseInsensitiveUTF8":
            "multiSearchFirstIndexCaseInsensitive",
        "countSubstringsCaseInsensitiveUTF8": "countSubstringsCaseInsensitive",
        "positionCaseInsensitiveUTF8": "positionCaseInsensitive",
        "hasSubsequenceUTF8": "hasSubsequence",
        "hasSubsequenceCaseInsensitiveUTF8": "hasSubsequenceCaseInsensitive",
        "ngramDistanceUTF8": "ngramDistance",
        "ngramDistanceCaseInsensitiveUTF8": "ngramDistanceCaseInsensitive",
        "ngramSearchUTF8": "ngramSearch",
        "ngramSearchCaseInsensitiveUTF8": "ngramSearchCaseInsensitive",
        "editDistanceUTF8": "editDistance",
        "levenshteinDistanceUTF8": "levenshteinDistance",
        "damerauLevenshteinDistanceUTF8": "damerauLevenshteinDistance",
        "jaroSimilarityUTF8": "jaroSimilarity",
        "jaroWinklerSimilarityUTF8": "jaroWinklerSimilarity",
        "stringJaccardIndexUTF8": "stringJaccardIndex",
        "reverseUTF8": "reverse",
        "translateUTF8": "translate",
        "initcapUTF8": "initcap",
    }
    return d, utf8_alias
