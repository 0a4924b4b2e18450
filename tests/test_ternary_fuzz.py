"""Property fuzz for the ternary / ?? / hex-literal rewriters: random
nested conditional expressions must evaluate identically through the
CH-SQL frontend and Python reference evaluation.

Reference semantics: src/Parsers/ExpressionListParsers.cpp (ternary,
right-associative; ?? null-coalescing), src/Parsers/ParserLiteral
(0x/0b integer literals)."""

import pytest
from hypothesis import given, settings, strategies as st


def _expr(depth):
    if depth == 0:
        return st.sampled_from(["1", "2", "0", "7", "0x1F", "NULL"])
    sub = st.deferred(lambda: _expr(depth - 1))
    return st.one_of(
        st.sampled_from(["1", "2", "0", "7", "0x1F", "NULL"]),
        st.tuples(sub, sub, sub).map(
            lambda t: f"({t[0]} > 0 ? {t[1]} : {t[2]})"),
        st.tuples(sub, sub).map(lambda t: f"({t[0]} ?? {t[1]})"),
    )


def _pyeval(e):
    e = e.strip()
    if e.startswith("(") and e.endswith(")"):
        # strip only if the parens match each other
        depth = 0
        for i, c in enumerate(e):
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0 and i < len(e) - 1:
                    break
        else:
            return _pyeval(e[1:-1])
    # find top-level '?' (ternary) or '??' BEFORE literal checks
    depth = 0
    i = 0
    while i < len(e):
        c = e[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "?" and depth == 0:
            if i + 1 < len(e) and e[i + 1] == "?":
                return (_pyeval(e[:i])
                        if _pyeval(e[:i]) is not None
                        else _pyeval(e[i + 2:]))
            # ternary: left is "X > 0"
            cond = e[:i].strip()
            assert cond.endswith("> 0")
            cv = _pyeval(cond[:-3])
            # matching top-level ':'
            d2, nest, j = 0, 0, i + 1
            while j < len(e):
                cj = e[j]
                if cj == "(":
                    d2 += 1
                elif cj == ")":
                    d2 -= 1
                elif cj == "?" and d2 == 0:
                    nest += 1
                elif cj == ":" and d2 == 0:
                    if nest == 0:
                        break
                    nest -= 1
                j += 1
            # CH if(): NULL condition -> else branch
            return (_pyeval(e[i + 1:j]) if (cv is not None and cv > 0)
                    else _pyeval(e[j + 1:]))
        i += 1
    if e == "NULL":
        return None
    if e.startswith("0x"):
        return int(e, 16)
    if e.isdigit():
        return int(e)
    raise AssertionError(f"unparsed {e!r}")


@settings(max_examples=60, deadline=None)
@given(_expr(3))
def test_ternary_coalesce_fuzz(spark, e):
    from clickhouse_core_spark.plans.frontend import ch_sql
    got = ch_sql(spark, f"SELECT {e} AS v").collect()[0]["v"]
    assert got == _pyeval(e)


def test_ternary_with_cast_operator(spark):
    """`cond ? x::Int32 : y` is a legal combination of two supported
    forms; the colon scan must skip '::' (it used to split the ternary
    at the cast's first colon and emit unparseable SQL)."""
    from clickhouse_core_spark.plans.frontend import ch_sql
    got = ch_sql(spark, "SELECT 1 > 0 ? '7'::Int32 : 9 AS v").collect()
    assert got[0]["v"] == 7
    got = ch_sql(spark, "SELECT 0 > 0 ? '7'::Int32 : 9::Int64 AS v").collect()
    assert got[0]["v"] == 9
    # '??' inside the then-branch must not corrupt nesting either
    got = ch_sql(spark,
                 "SELECT 1 > 0 ? (NULL ?? 5) : 9 AS v").collect()
    assert got[0]["v"] == 5


def test_small_forms_inside_string_literals(spark):
    """LIMIT offset,count / COLLATE / 0x rewrites must not fire inside
    string literals."""
    from clickhouse_core_spark.plans.frontend import ch_sql
    got = ch_sql(spark, "SELECT 'LIMIT 1, 2' AS a, 'x COLLATE ''u''' "
                        "AS b, '0x1F' AS c").collect()[0]
    assert got["a"] == "LIMIT 1, 2"
    assert got["b"] == "x COLLATE 'u'"
    assert got["c"] == "0x1F"
    # ... while the real forms still rewrite outside strings
    rows = ch_sql(spark, "SELECT n FROM (SELECT 1 AS n UNION ALL "
                         "SELECT 2 UNION ALL SELECT 3 ORDER BY n) "
                         "ORDER BY n LIMIT 1, 2").collect()
    assert [r["n"] for r in rows] == [2, 3]
    assert ch_sql(spark, "SELECT 0x1F AS v").collect()[0]["v"] == 31
