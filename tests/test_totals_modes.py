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
