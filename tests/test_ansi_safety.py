"""Session-proofing: registry arithmetic must not throw when the host
session runs with spark.sql.ansi.enabled=true (the Spark 4 default, and
what the correctness driver uses).

The engine's own sessions set ansi=false (session.py), but oracle entries
are executed under the *driver's* session — so every expression the
entries touch must be ANSI-safe.  Reference semantics are permissive
(src/Functions/DivisionUtils.h returns exceptions only for intDiv;
modulo/divide family has OrZero/OrNull escapes), and our mapping uses
try_mod/try_divide which behave identically in both modes.
"""

import pytest
from pyspark.sql import functions as F

from clickhouse_core_spark.functions import ch


@pytest.fixture()
def ansi(spark):
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", old)


@pytest.fixture(scope="module")
def edge_df(spark):
    # (a, b) pairs including zero divisors, negatives, NULLs.
    return spark.createDataFrame(
        [(7, 2), (-7, 2), (7, -2), (0, 5), (7, 0), (0, 0), (None, 3), (3, None)],
        "a int, b int")


def _by_key(df, col):
    return {(r.a, r.b): r.x
            for r in df.select("a", "b", col.alias("x")).collect()}


class TestDivisionFamilyAnsi:
    def test_intdiv_truncates_and_nulls_on_zero(self, ansi, edge_df):
        out = _by_key(edge_df, ch.intDiv(F.col("a"), F.col("b")))
        assert out[(7, 2)] == 3
        assert out[(-7, 2)] == -3  # trunc toward zero, not floor
        assert out[(7, -2)] == -3
        assert out[(7, 0)] is None
        assert out[(None, 3)] is None

    def test_intdivorzero(self, ansi, edge_df):
        out = _by_key(edge_df, ch.intDivOrZero(F.col("a"), F.col("b")))
        assert out[(7, 0)] == 0
        assert out[(0, 0)] == 0
        assert out[(7, 2)] == 3

    def test_modulo_family(self, ansi, edge_df):
        mod = _by_key(edge_df, ch.modulo(F.col("a"), F.col("b")))
        assert mod[(7, 2)] == 1
        assert mod[(-7, 2)] == -1  # dividend sign (C++ %)
        assert mod[(7, 0)] is None
        moz = _by_key(edge_df, ch.moduloOrZero(F.col("a"), F.col("b")))
        assert moz[(7, 0)] == 0
        pmod = _by_key(edge_df, ch.positiveModulo(F.col("a"), F.col("b")))
        assert pmod[(-7, 2)] == 1
        assert pmod[(7, 0)] is None

    def test_divide(self, ansi, edge_df):
        import math
        out = _by_key(edge_df, ch.divide(F.col("a"), F.col("b")))
        assert out[(7, 2)] == 3.5
        # CH float division: /0 gives +-inf, 0/0 gives nan
        # (FunctionBinaryArithmetic.h DivideFloatingImpl)
        assert out[(7, 0)] == math.inf
        assert out[(-7, 0)] == -math.inf if (-7, 0) in out else True


class TestAnsiOffParity:
    """try_* must give byte-identical results with ANSI off (the engine's
    own session mode) — the swap is behavior-neutral."""

    def test_same_results_both_modes(self, spark, edge_df):
        exprs = [ch.intDiv(F.col("a"), F.col("b")),
                 ch.intDivOrZero(F.col("a"), F.col("b")),
                 ch.modulo(F.col("a"), F.col("b")),
                 ch.moduloOrZero(F.col("a"), F.col("b")),
                 ch.divide(F.col("a"), F.col("b"))]
        sel = [e.alias(f"c{i}") for i, e in enumerate(exprs)]
        old = spark.conf.get("spark.sql.ansi.enabled")
        try:
            spark.conf.set("spark.sql.ansi.enabled", "false")
            off = [tuple(r) for r in edge_df.select(*sel).collect()]
            spark.conf.set("spark.sql.ansi.enabled", "true")
            on = [tuple(r) for r in edge_df.select(*sel).collect()]
        finally:
            spark.conf.set("spark.sql.ansi.enabled", old)
        def norm(rows):
            return [tuple("nan" if isinstance(c, float) and c != c else c
                          for c in r) for r in rows]
        assert norm(off) == norm(on)


class TestFixtureEdgeAnsi:
    """The sf0.01 orders fixture contains o_orderkey=0 (the row that broke
    fn_ch_conditional_math in the r03 driver run) — replay the entry's
    expression set against the real fixture under ANSI."""

    def test_orderkey_zero_row_survives(self, ansi):
        import os
        path = "/root/testdata/sf0.01/orders.parquet"
        if not os.path.exists(path):
            pytest.skip("sf0.01 fixture not present")
        o = ansi.read.parquet(path)
        t, k = F.col("o_totalprice"), F.col("o_orderkey")
        rows = (o.filter(k < 300)
                .select(k.alias("k"),
                        ch.intDivOrZero(t, k).alias("idiv"),
                        ch.modulo(k, 7).alias("m7"))
                .collect())
        by_k = {r.k: r for r in rows}
        assert 0 in by_k
        assert by_k[0].idiv == 0
