"""WITH TOTALS having-modes (reference Settings.cpp:873 totals_mode,
default AFTER_HAVING_EXCLUSIVE) and the new OrDefault/OrNull IP +
decimal conversion forms."""

import pytest
from decimal import Decimal

from pyspark.sql import functions as F

from clickhouse_core_spark.functions import ch
from clickhouse_core_spark.operators.aggregates import with_totals


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 10.0), ("c", 100.0)],
        "g string, v double")


def _totals_row(rows):
    return next(r for r in rows if r["__totals"])


def test_totals_before_having(df):
    rows = with_totals(df, ["g"], [F.sum("v").alias("s")],
                       having=F.col("s") > 5,
                       totals_mode="before_having").collect()
    assert {r.g for r in rows if not r["__totals"]} == {"b", "c"}
    assert _totals_row(rows).s == pytest.approx(113.0)  # all rows


def test_totals_after_having_exclusive(df):
    rows = with_totals(df, ["g"], [F.sum("v").alias("s")],
                       having=F.col("s") > 5).collect()
    assert {r.g for r in rows if not r["__totals"]} == {"b", "c"}
    assert _totals_row(rows).s == pytest.approx(110.0)  # passing groups only


def test_totals_after_having_inclusive(df):
    rows = with_totals(df, ["g"], [F.sum("v").alias("s")],
                       having=F.col("s") > 5,
                       totals_mode="after_having_inclusive").collect()
    assert _totals_row(rows).s == pytest.approx(113.0)


def test_totals_no_having_unchanged(df):
    rows = with_totals(df, ["g"], [F.sum("v").alias("s")]).collect()
    assert len(rows) == 4 and _totals_row(rows).s == pytest.approx(113.0)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first().v


def test_ip_or_default(spark):
    assert _one(spark, ch.toIPv4OrDefault(F.lit("1.2.3.4"))) == "1.2.3.4"
    assert _one(spark, ch.toIPv4OrDefault(F.lit("999.2.3.4"))) == "0.0.0.0"
    assert _one(spark, ch.toIPv4OrNull(F.lit("nope"))) is None
    assert _one(spark, ch.toIPv6OrDefault(F.lit("::1"))) == "::1"
    assert _one(spark, ch.toIPv6OrDefault(F.lit("zz"))) == "::"
    assert _one(spark, ch.isIPv6String(
        F.lit("2001:db8::ff00:42:8329"))) == 1
    assert _one(spark, ch.isIPv6String(F.lit("1.2.3.4"))) == 0


def test_decimal_or_variants(spark):
    assert _one(spark, ch.toDecimal64OrZero(F.lit("12.345"), 2)) == \
        Decimal("12.35")
    assert _one(spark, ch.toDecimal64OrZero(F.lit("xx"), 2)) == Decimal("0")
    assert _one(spark, ch.toDecimal32OrNull(F.lit("bad"), 3)) is None
    assert _one(spark, ch.toDecimal128OrDefault(F.lit("bad"), 4, 9)) == \
        Decimal("9")


def test_totals_with_cube_rollup_modifier(spark):
    """WITH CUBE/ROLLUP WITH TOTALS combine (ParserSelectQuery
    group_by_with_cube + group_by_with_totals flags): the modifier's
    grouping sets survive and the TOTALS grand-total row is appended
    as an extra empty set."""
    import pandas as pd
    from clickhouse_core_spark.plans.frontend import ch_sql
    df = spark.createDataFrame(
        pd.DataFrame({"a": ["x", "x", "y"], "c": ["p", "q", "p"],
                      "b": [1, 2, 3]}))
    df.createOrReplaceTempView("totals_mod_t")
    rows = ch_sql(spark, """
        SELECT a, c, sum(b) AS s FROM totals_mod_t
        GROUP BY a, c WITH ROLLUP WITH TOTALS
        ORDER BY a NULLS FIRST, c NULLS FIRST, s""").collect()
    vals = [(r["a"], r["c"], r["s"]) for r in rows]
    assert vals.count((None, None, 6)) == 2      # rollup total + TOTALS
    assert (("x", None, 3) in vals) and (("y", None, 3) in vals)
    assert ("x", "q", 2) in vals
    cube = ch_sql(spark, """
        SELECT a, sum(b) AS s FROM totals_mod_t
        GROUP BY a WITH CUBE WITH TOTALS
        ORDER BY a NULLS FIRST, s""").collect()
    cvals = [(r["a"], r["s"]) for r in cube]
    assert cvals.count((None, 6)) == 2
