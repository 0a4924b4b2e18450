"""Datetime long-tail (registry _DT3): Joda parse/format, year-zero
days, MJD OrNull, UTC conversions, YYYYMMDD decompositions."""

import datetime

from pyspark.sql import functions as F

from clickhouse_core_spark.functions.registry import ch
from clickhouse_core_spark.plans.frontend import translate_ch_sql


def test_datetime_ext_functions(spark):
    df = spark.range(1).select(
        F.lit("2024-03-05 10:30:45").cast("timestamp").alias("ts"),
        F.lit("05/03/2024 10:30").alias("s"))
    r = df.select(
        ch.timeDiff(F.lit("2024-03-05 10:00:00").cast("timestamp"),
                    F.col("ts")).alias("td"),
        ch.parseDateTimeInJodaSyntax(
            F.col("s"), "dd/MM/yyyy HH:mm").alias("pj"),
        ch.parseDateTimeInJodaSyntaxOrNull(
            F.lit("bogus"), "dd/MM/yyyy").alias("pn"),
        ch.parseDateTimeInJodaSyntaxOrZero(
            F.lit("bogus"), "dd/MM/yyyy").alias("pz"),
        ch.formatDateTimeInJodaSyntax(
            F.col("ts"), "yyyy-MM-dd'T'HH:mm").alias("fj"),
        ch.fromDaysSinceYearZero(F.lit(739315)).alias("fd"),
        ch.toModifiedJulianDayOrNull(F.lit("2024-03-05")).alias("mjd"),
        ch.toModifiedJulianDayOrNull(F.lit("oops")).alias("mjdn"),
        ch.toMillisecond(
            F.lit("2024-03-05 10:30:45.123").cast("timestamp")).alias("ms"),
        ch.YYYYMMDDhhmmssToDateTime(F.lit(20240305103045)).alias("ymdt"),
        ch.YYYYMMDDToDate(F.lit(20240305)).alias("ymdd"),
        ch.addDate(F.col("ts"), F.expr("INTERVAL 2 DAY")).alias("ad"),
        ch.subDate(F.col("ts"), F.expr("INTERVAL 1 HOUR")).alias("sd"),
        ch.makeDateTime64(F.lit(2024), F.lit(3), F.lit(5), F.lit(10),
                          F.lit(30), F.lit(45)).alias("mk"),
    ).collect()[0]
    assert r.td == 1845
    assert r.pj == datetime.datetime(2024, 3, 5, 10, 30)
    assert r.pn is None
    assert r.pz == datetime.datetime(1970, 1, 1, 0, 0)
    assert r.fj == "2024-03-05T10:30"
    assert r.fd == datetime.date(2024, 3, 5)
    assert r.mjd == 60374 and r.mjdn is None
    assert r.ms == 123
    assert r.ymdt == datetime.datetime(2024, 3, 5, 10, 30, 45)
    assert r.ymdd == datetime.date(2024, 3, 5)
    assert r.ad == datetime.datetime(2024, 3, 7, 10, 30, 45)
    assert r.sd == datetime.datetime(2024, 3, 5, 9, 30, 45)
    assert r.mk == datetime.datetime(2024, 3, 5, 10, 30, 45)


def test_days_since_year_zero_roundtrip(spark):
    df = spark.createDataFrame(
        [("1970-01-01",), ("2024-02-29",), ("1858-11-17",)], "d string")
    rows = df.select(
        "d",
        ch.fromDaysSinceYearZero(
            ch.toDaysSinceYearZero(F.col("d").cast("date"))).alias("rt"),
    ).collect()
    for r in rows:
        assert str(r.rt) == r.d


def test_utc_conversions(spark):
    r = spark.range(1).select(
        ch.toUTCTimestamp(F.lit("2024-03-05 10:00:00").cast("timestamp"),
                          F.lit("Asia/Shanghai")).alias("u"),
        ch.fromUTCTimestamp(F.lit("2024-03-05 02:00:00").cast("timestamp"),
                            F.lit("Asia/Shanghai")).alias("f"),
    ).collect()[0]
    assert r.u == datetime.datetime(2024, 3, 5, 2, 0)
    assert r.f == datetime.datetime(2024, 3, 5, 10, 0)


def test_sql_frontend_datetime_rules():
    out = translate_ch_sql(
        "SELECT timeDiff(a, b), fromDaysSinceYearZero(739315), "
        "parseDateTimeInJodaSyntaxOrZero(s, 'yyyy-MM-dd'), "
        "formatDateTimeInJodaSyntax(t, 'yyyy/MM'), "
        "YYYYMMDDToDate(n), toMillisecond(t), now64() FROM x")
    assert "unix_timestamp(b) - unix_timestamp(a)" in out
    assert "date_add(DATE'1970-01-01'" in out
    assert "try_to_timestamp(s, 'yyyy-MM-dd')" in out
    assert "date_format(t, 'yyyy/MM')" in out
    assert "yyyyMMdd" in out and "unix_micros" in out
    assert "current_timestamp()" in out
