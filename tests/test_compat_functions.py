"""Compat/alias surface added from the reference's registerAlias sweep
(width_bucket, extractKeyValuePairs/str_to_map, extractAllGroups*,
minSampleSize*, jsonMergePatch, byteSlice, MySQL aliases, *Stable
aggregate aliases)."""

import pytest
from pyspark.sql import functions as F

from clickhouse_core_spark.functions import ch
from clickhouse_core_spark.functions.registry import CH_FUNCTIONS
from clickhouse_core_spark.plans.frontend import ch_sql


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first().v


def test_width_bucket(spark):
    assert _one(spark, ch.widthBucket(F.lit(3.5), F.lit(0.0),
                                      F.lit(10.0), F.lit(5))) == 2
    assert _one(spark, ch.width_bucket(F.lit(11.0), F.lit(0.0),
                                       F.lit(10.0), F.lit(5))) == 6


def test_extract_key_value_pairs(spark):
    m = _one(spark, ch.extractKeyValuePairs(
        F.lit("name:neymar, age:31 team:psg")))
    assert m == {"name": "neymar", "age": "31", "team": "psg"}
    m2 = _one(spark, ch.str_to_map(F.lit("a:1, b:2")))
    assert m2 == {"a": "1", "b": "2"}


def test_extract_all_groups(spark):
    v = _one(spark, ch.extractAllGroupsVertical(
        F.lit("abc=111, def=222"), r"(\w+)=(\d+)"))
    assert v == [["abc", "111"], ["def", "222"]]
    h = _one(spark, ch.extractAllGroupsHorizontal(
        F.lit("abc=111, def=222"), r"(\w+)=(\d+)"))
    assert h == [["abc", "def"], ["111", "222"]]
    g = _one(spark, ch.extractGroups(F.lit("abc=111, def=222"),
                                     r"(\w+)=(\d+)"))
    assert g == ["abc", "111"]


def test_min_sample_size_continuous(spark):
    # reference formula: 2*sigma^2*(z_{1-a/2}+z_power)^2 / (baseline*mde)^2
    r = _one(spark, ch.minSampleSizeContinuous(
        F.lit(112.25), F.lit(21.1), 0.03, 0.8, 0.05))
    assert r.minimum_sample_size == pytest.approx(616.174, abs=0.5)
    assert r.detect_range_lower == pytest.approx(108.8825, abs=1e-6)
    assert r.detect_range_upper == pytest.approx(115.6175, abs=1e-6)
    # the reference's typo alias
    r2 = _one(spark, ch.minSampleSizeContinous(
        F.lit(112.25), F.lit(21.1), 0.03, 0.8, 0.05))
    assert r2.minimum_sample_size == r.minimum_sample_size


def test_min_sample_size_conversion(spark):
    r = _one(spark, ch.minSampleSizeConversion(
        F.lit(0.9), 0.01, 0.8, 0.05))
    assert r.minimum_sample_size == pytest.approx(13494.97, abs=0.1)


def test_json_merge_patch(spark):
    out = _one(spark, ch.jsonMergePatch(
        F.lit('{"a":1,"b":{"c":2,"d":3}}'),
        F.lit('{"b":{"c":null,"e":9},"f":[1]}')))
    import json
    assert json.loads(out) == {"a": 1, "b": {"d": 3, "e": 9}, "f": [1]}


def test_byte_slice_and_mismatches(spark):
    assert _one(spark, ch.byteSlice(F.lit("hello"), 2, 3)) == "ell"
    assert _one(spark, ch.mismatches(F.lit("karolin"), F.lit("kathrin"))) == 3


def test_mysql_aliases(spark):
    assert _one(spark, ch.ucase(F.lit("aBc"))) == "ABC"
    assert _one(spark, ch.lcase(F.lit("aBc"))) == "abc"
    assert _one(spark, ch.ceiling(F.lit(1.2))) == 2
    assert _one(spark, ch.INET_NTOA(F.lit(3232235521))) == "192.168.0.1"
    assert _one(spark, ch.pmod(F.lit(-7), F.lit(3))) == 2
    assert _one(spark, ch.TIMESTAMP_DIFF(
        "day", F.lit("2024-01-01").cast("date"),
        F.lit("2024-01-11").cast("date"))) == 10


def test_timezone_family(spark):
    assert _one(spark, ch.timeZone()) == "UTC"
    ts = F.lit("2024-06-01 00:00:00").cast("timestamp")
    assert _one(spark, ch.timeZoneOffset(ts)) == 0  # UTC session
    assert _one(spark, ch.toTimeZone(ts, "Asia/Tokyo")) is not None


def test_introspection_constants(spark):
    assert _one(spark, ch.connectionId()) == 0
    assert isinstance(_one(spark, ch.hostName()), str)
    assert isinstance(_one(spark, ch.currentUser()), str)


def test_stable_agg_aliases_sql(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (1, 4.0), (2, 6.0)], "k int, v double")
    df.createOrReplaceTempView("t_stable")
    out = ch_sql(spark, """
        SELECT k, varSampStable(v) AS vs, stddevPopStable(v) AS sp,
               sumWithOverflow(v) AS s
        FROM t_stable GROUP BY k ORDER BY k""").collect()
    assert out[0].vs == pytest.approx(2.0)
    assert out[0].s == pytest.approx(6.0)
    out2 = ch_sql(spark, """
        SELECT corrStable(v, v + 1) AS c FROM t_stable""").first()
    assert out2.c == pytest.approx(1.0)


def test_respect_nulls_agg_sql(spark):
    df = spark.createDataFrame([(1, "a"), (2, None)], "i int, s string")
    df.createOrReplaceTempView("t_rn")
    row = ch_sql(spark, """
        SELECT anyLast_respect_nulls(s) AS l
        FROM (SELECT * FROM t_rn ORDER BY i)""").first()
    assert row.l is None


def test_registry_size_monotonic():
    # the registry should keep covering the reference's alias surface
    assert len(CH_FUNCTIONS) >= 540


def test_format_readable_time_delta(spark):
    assert _one(spark, ch.formatReadableTimeDelta(F.lit(36806453))) == \
        "1 year, 2 months and 53 seconds"
    assert _one(spark, ch.formatReadableTimeDelta(F.lit(0))) == "0 seconds"
    assert _one(spark, ch.formatReadableTimeDelta(F.lit(-61))) == \
        "-1 minute and 1 second"
    assert _one(spark, ch.formatReadableTimeDelta(F.lit(3661))) == \
        "1 hour, 1 minute and 1 second"


def test_change_date_parts(spark):
    import datetime as dt
    assert _one(spark, ch.changeMonth(
        F.lit("2024-01-15 10:30:00"), 7)) == \
        dt.datetime(2024, 7, 15, 10, 30)
    # invalid result (Feb 29 in a non-leap year) -> NULL
    assert _one(spark, ch.changeYear(
        F.lit("2024-02-29 10:00:00"), 2023)) is None
    assert _one(spark, ch.changeSecond(
        F.lit("2024-01-15 10:30:11"), 59)) == \
        dt.datetime(2024, 1, 15, 10, 30, 59)


def test_to_interval_family(spark):
    import datetime as dt
    r = spark.range(1).select(
        (F.lit("2024-01-01").cast("timestamp")
         + ch.toIntervalDay(F.lit(10))).alias("d"),
        (F.lit("2024-01-31").cast("date")
         + ch.toIntervalMonth(F.lit(1))).alias("m"),
        (F.lit("2024-01-01").cast("timestamp")
         + ch.toIntervalHour(F.lit(25))).alias("h")).first()
    assert r.d == dt.datetime(2024, 1, 11)
    assert r.m == dt.date(2024, 2, 29)  # month-end clamp
    assert r.h == dt.datetime(2024, 1, 2, 1)


def test_divide_infinity_semantics(spark):
    import math
    row = ch_sql(spark, """
        SELECT divide(1.0, 0) AS pos, divide(-2.0, 0) AS neg,
               divide(0.0, 0) AS nan_v, divide(6, 3) AS ok,
               isInfinite(divide(1.0, 0)) AS isinf FROM system.one
    """).first()
    assert row.pos == math.inf and row.neg == -math.inf
    assert math.isnan(row.nan_v) and row.ok == 2.0 and row.isinf == 1
    assert _one(spark, ch.divide(F.lit(1.0), F.lit(0))) == math.inf
