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
