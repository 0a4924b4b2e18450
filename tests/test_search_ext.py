"""Search-variant + fold-based similarity family
(clickhouse_core_spark/functions/search_ext.py).

jaro/jaroWinkler/damerauLevenshtein are graded against a direct Python
transcription of the reference algorithms
(src/Functions/FunctionsStringDistance.cpp) over real fixture strings —
DuckDB's RapidFuzz-based jaro finds MORE matches than the reference's
greedy scan, so it cannot be the oracle for these.
"""

import pytest
from pyspark.sql import functions as F

from clickhouse_core_spark.functions.registry import ch


# ---------------- reference transcriptions (FunctionsStringDistance.cpp)

def jaro_ref(s1: str, s2: str) -> float:
    m, n = len(s1), len(s2)
    if m == 0:
        return float(n)       # reference quirk: empty side -> other LENGTH
    if n == 0:
        return float(m)
    if s1 == s2:
        return 1.0
    w = max(0, max(m, n) // 2 - 1)
    m2 = [-1] * n
    m1 = [-1] * m
    matches = 0
    for i in range(m):
        for j in range(max(i - w, 0), min(i + w + 1, n)):
            if m2[j] == -1 and s1[i] == s2[j]:
                m1[i] = j
                m2[j] = i
                matches += 1
                break
    if matches == 0:
        return 0.0
    a = [s1[i] for i in range(m) if m1[i] != -1]
    b = [s2[j] for j in range(n) if m2[j] != -1]
    t = sum(1 for x, y in zip(a, b) if x != y) / 2
    return (matches / m + matches / n + (matches - t) / matches) / 3


def jaro_winkler_ref(s1: str, s2: str) -> float:
    jw = jaro_ref(s1, s2)
    if len(s1) == 0 or len(s2) == 0:
        return jw
    if jw > 0.7:
        prefix = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            prefix += 1
        jw += prefix * 0.1 * (1.0 - jw)
    return jw


def osa_ref(s1: str, s2: str) -> int:
    m, n = len(s1), len(s2)
    if m == 0:
        return n
    if n == 0:
        return m
    d = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(m + 1):
        d[i][0] = i
    for j in range(n + 1):
        d[0][j] = j
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            cost = 0 if s1[i - 1] == s2[j - 1] else 1
            d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                          d[i - 1][j - 1] + cost)
            if (i > 1 and j > 1 and s1[i - 1] == s2[j - 2]
                    and s1[i - 2] == s2[j - 1]):
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[m][n]


PAIRS = [
    ("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"),
    ("JELLYFISH", "SMELLYFISH"), ("", ""), ("", "abc"), ("abc", ""),
    ("CA", "ABC"), ("abcdef", "abcdef"), ("PREFIXmatch", "PREFIXxxxx"),
    ("small ring", "burnished seashell"), ("a", "b"), ("ab", "ba"),
    ("kitten", "sitting"), ("x" * 30, "x" * 29 + "y"),
]


def test_similarity_against_reference_transcription(spark):
    df = spark.createDataFrame(PAIRS, "a string, b string")
    rows = df.select(
        "a", "b",
        ch.jaroSimilarity(F.col("a"), F.col("b")).alias("jaro"),
        ch.jaroWinklerSimilarity(F.col("a"), F.col("b")).alias("jw"),
        ch.damerauLevenshteinDistance(F.col("a"), F.col("b")).alias("dl"),
    ).collect()
    assert len(rows) == len(PAIRS)
    for r in rows:
        assert r.jaro == pytest.approx(jaro_ref(r.a, r.b), abs=1e-12), r
        assert r.jw == pytest.approx(jaro_winkler_ref(r.a, r.b),
                                     abs=1e-12), r
        assert r.dl == osa_ref(r.a, r.b), r


def test_similarity_on_fixture_names(spark):
    from tests.conftest import SF_DIR
    part = spark.read.parquet(f"{SF_DIR}/part.parquet").limit(40)
    rows = part.select(
        "p_name",
        ch.jaroSimilarity(F.col("p_name"), F.lit("burnished seashell")).alias("j"),
        ch.jaroWinklerSimilarity(
            F.col("p_name"), F.lit("burnished seashell")).alias("jw"),
        ch.damerauLevenshteinDistance(
            F.col("p_name"), F.lit("burnished seashell")).alias("dl"),
    ).collect()
    for r in rows:
        assert r.j == pytest.approx(
            jaro_ref(r.p_name, "burnished seashell"), abs=1e-12), r.p_name
        assert r.jw == pytest.approx(
            jaro_winkler_ref(r.p_name, "burnished seashell"),
            abs=1e-12), r.p_name
        assert r.dl == osa_ref(r.p_name, "burnished seashell"), r.p_name


def test_multi_search_variants(spark):
    df = spark.createDataFrame(
        [("Hello World",), ("no match here",), ("WORLDWIDE web",)],
        "s string")
    rows = df.select(
        ch.multiSearchAnyCaseInsensitive(F.col("s"), ["world", "xyz"]).alias("any"),
        ch.multiSearchFirstPositionCaseInsensitive(F.col("s"), ["world", "web"]).alias("fp"),
        ch.multiSearchFirstIndexCaseInsensitive(F.col("s"), ["zzz", "world"]).alias("fi"),
        ch.multiSearchAllPositionsCaseInsensitive(F.col("s"), ["o", "w"]).alias("ap"),
        ch.countSubstringsCaseInsensitive(F.col("s"), "L").alias("cs"),
        ch.hasTokenCaseInsensitive(F.col("s"), "world").alias("tok"),
        ch.hasSubsequence(F.col("s"), "Hlo").alias("sub"),
        ch.hasSubsequenceCaseInsensitive(F.col("s"), "hLO").alias("subci"),
        ch.notILike(F.col("s"), "%world%").alias("nil"),
    ).collect()
    assert [r.any for r in rows] == [1, 0, 1]
    assert [r.fp for r in rows] == [7, 0, 1]
    assert [r.fi for r in rows] == [2, 0, 2]
    assert rows[0].ap == [5, 7]        # first 'o', first 'w' (ci)
    assert [r.cs for r in rows] == [3, 0, 1]
    assert [r.tok for r in rows] == [1, 0, 0]   # WORLDWIDE: not a token
    assert [r.sub for r in rows] == [1, 0, 0]
    assert [r.subci for r in rows] == [1, 0, 0]
    assert [r.nil for r in rows] == [0, 1, 0]


def test_multi_match_and_containment(spark):
    df = spark.createDataFrame([("abc123",), ("xyz",)], "s string")
    rows = df.select(
        ch.multiMatchAny(F.col("s"), [r"\d+", "^q"]).alias("any"),
        ch.multiMatchAnyIndex(F.col("s"), ["^q", r"\d+"]).alias("idx"),
        ch.multiMatchAllIndices(F.col("s"), ["^a", r"\d", "z$"]).alias("all"),
    ).collect()
    assert [r.any for r in rows] == [1, 0]
    assert [r.idx for r in rows] == [2, 0]
    assert rows[0].all == [1, 2] and rows[1].all == [3]

    arr = spark.createDataFrame(
        [([1, 2, 3, 4], [2, 3]), ([1, 2, 3], [3, 2]),
         ([], []), ([1], [])],
        "a array<int>, b array<int>")
    got = [r.h for r in arr.select(ch.hasSubstr(F.col("a"), F.col("b")).alias("h")).collect()]
    assert got == [1, 0, 1, 1]


def test_sql_frontend_forms(spark):
    from clickhouse_core_spark.plans.frontend import ch_sql
    from tests.conftest import SF_DIR
    spark.read.parquet(f"{SF_DIR}/part.parquet").createOrReplaceTempView(
        "part_sx")
    out = ch_sql(spark, """
        SELECT p_partkey,
               hasSubsequence(p_name, 'aoe') AS hs,
               notILike(p_name, '%red%') AS nl,
               multiMatchAnyIndex(p_name, ['^burnished', 'red']) AS mi,
               countSubstringsCaseInsensitive(p_name, 'RO') AS cs
        FROM part_sx ORDER BY p_partkey LIMIT 5
    """).collect()
    assert len(out) == 5
    for r in out:
        assert r.hs in (0, 1) and r.nl in (0, 1)
        assert r.mi >= 0 and r.cs >= 0
