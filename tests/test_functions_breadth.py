"""Round-2 scalar-function breadth: arrays(2), maps(2), datetime(2),
readable formatting, string search(2), bit ops(2), conversions, misc.

Reference families: src/Functions/array/*, map.cpp/mapPopulateSeries.cpp,
DateTimeTransforms.h, formatReadable.h, FunctionsStringSearch.h,
FunctionsConversion.h, bar.cpp, transform.cpp.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from clickhouse_core_spark.functions import CH_FUNCTIONS, ch


def one(spark, col, **extra):
    df = spark.createDataFrame([(1,)], "x int")
    row = df.select(col.alias("v"), *[c.alias(k) for k, c in extra.items()]) \
            .collect()[0]
    return row["v"] if not extra else row


def test_array_breadth(spark):
    arr = F.array(*[F.lit(v) for v in [3, 1, 2, 1, 3, 3]])
    f = CH_FUNCTIONS
    assert one(spark, f["arrayCount"](lambda x: x > 1, arr)) == 4
    assert one(spark, f["arrayFirst"](lambda x: x > 1, arr)) == 3
    assert one(spark, f["arrayLast"](lambda x: x < 3, arr)) == 1
    assert one(spark, f["arrayFirstIndex"](lambda x: x == 2, arr)) == 3
    assert one(spark, f["arrayLastIndex"](lambda x: x == 3, arr)) == 6
    assert one(spark, f["arrayFirstIndex"](lambda x: x == 9, arr)) == 0
    assert one(spark, f["arrayEnumerateUniq"](arr)) == [1, 1, 1, 2, 2, 3]
    assert one(spark, f["arrayEnumerateDense"](arr)) == [1, 2, 3, 2, 1, 1]
    assert one(spark, f["arrayProduct"](F.array(F.lit(2), F.lit(3), F.lit(4)))) == 24.0
    assert one(spark, f["arrayCumSumNonNegative"](
        F.array(*[F.lit(v) for v in [1, 1, -4, 1]]))) == [1.0, 2.0, 0.0, 1.0]
    assert one(spark, f["arrayResize"](arr, 3)) == [3, 1, 2]
    assert one(spark, f["arrayResize"](F.array(F.lit(1)), 3, 9)) == [1, 9, 9]
    assert one(spark, f["arrayWithConstant"](3, "ab")) == ["ab", "ab", "ab"]
    assert one(spark, f["arrayRotateLeft"](arr, 2)) == [2, 1, 3, 3, 3, 1]
    assert one(spark, f["arrayRotateRight"](arr, 2)) == [3, 3, 3, 1, 2, 1]
    assert one(spark, f["arrayShiftLeft"](arr, 2)) == [2, 1, 3, 3, 0, 0]
    assert one(spark, f["arrayShiftRight"](arr, 2, -1)) == [-1, -1, 3, 1, 2, 1]
    aj = one(spark, f["arrayJaccardIndex"](
        F.array(F.lit(1), F.lit(2)), F.array(F.lit(2), F.lit(3))))
    assert aj == pytest.approx(1 / 3)
    assert one(spark, f["arrayShingles"](
        F.array(F.lit(1), F.lit(2), F.lit(3)), 2)) == [[1, 2], [2, 3]]
    a = F.array(F.lit(1.0), F.lit(2.0))
    b = F.array(F.lit(4.0), F.lit(6.0))
    assert one(spark, f["L1Distance"](a, b)) == 7.0
    assert one(spark, f["L2Distance"](a, b)) == 5.0
    assert one(spark, f["LinfDistance"](a, b)) == 4.0
    assert one(spark, f["cosineDistance"](a, a)) == pytest.approx(0.0)


def test_map_breadth(spark):
    f = CH_FUNCTIONS
    m1 = F.map_from_arrays(F.array(F.lit(1), F.lit(2)),
                           F.array(F.lit(10), F.lit(20)))
    m2 = F.map_from_arrays(F.array(F.lit(2), F.lit(4)),
                           F.array(F.lit(200), F.lit(400)))
    assert one(spark, f["mapAdd"](m1, m2)) == {1: 10, 2: 220, 4: 400}
    assert one(spark, f["mapSubtract"](m1, m2)) == {1: 10, 2: -180, 4: -400}
    assert one(spark, f["mapUpdate"](m1, m2)) == {1: 10, 2: 200, 4: 400}
    assert one(spark, f["mapPopulateSeries"](m2)) == {2: 200, 3: 0, 4: 400}
    assert one(spark, f["mapPopulateSeries"](m1, 4)) == {1: 10, 2: 20, 3: 0, 4: 0}
    ms = F.map_from_arrays(F.array(F.lit("ab"), F.lit("xy")),
                           F.array(F.lit(1), F.lit(2)))
    assert one(spark, f["mapContainsKeyLike"](ms, "a%")) == 1
    assert one(spark, f["mapExtractKeyLike"](ms, "a%")) == {"ab": 1}
    assert one(spark, f["mapSort"](m2)) == {2: 200, 4: 400}


def test_datetime_breadth(spark):
    f = CH_FUNCTIONS
    d = F.lit("2024-01-01 10:20:30").cast("timestamp")
    # 2024-01-01 is a Monday in ISO week 1 of ISO year 2024
    assert one(spark, f["toISOWeek"](d)) == 1
    assert one(spark, f["toISOYear"](d)) == 2024
    # 2023-01-01 is a Sunday -> ISO week 52 of 2022
    d2 = F.lit("2023-01-01").cast("timestamp")
    assert one(spark, f["toISOYear"](d2)) == 2022
    assert one(spark, f["toYearWeek"](d2)) == 202252
    assert str(one(spark, f["toTime"](d))) == "1970-01-02 10:20:30"
    assert str(one(spark, f["toStartOfFiveMinutes"](d))) == "2024-01-01 10:20:00"
    assert str(one(spark, f["timeSlot"](d))) == "2024-01-01 10:00:00"
    assert one(spark, f["monthName"](d)) == "January"
    assert one(spark, f["toRelativeDayNum"](d)) == 19723
    assert one(spark, f["toRelativeMonthNum"](d)) == 2024 * 12 + 1
    assert str(one(spark, f["makeDate"](2024, 2, 29))) == "2024-02-29"
    assert str(one(spark, f["makeDateTime"](2024, 2, 29, 1, 2, 3))) == \
        "2024-02-29 01:02:03"
    assert str(one(spark, f["parseDateTimeBestEffort"]("31/12/2024"))) == \
        "2024-12-31 00:00:00"
    assert str(one(spark, f["parseDateTimeBestEffort"]("20241231102030"))) == \
        "2024-12-31 10:20:30"
    assert one(spark, f["parseDateTimeBestEffortOrNull"]("nope")) is None
    assert one(spark, f["toUnixTimestamp64Milli"](d)) == 1704104430000
    assert str(one(spark, f["fromUnixTimestamp64Milli"](1704104430000))) == \
        "2024-01-01 10:20:30"
    assert one(spark, f["toModifiedJulianDay"](F.lit("1858-11-18"))) == 1
    assert str(one(spark, f["fromModifiedJulianDay"](1))) == "1858-11-18"
    assert str(one(spark, f["dateAdd"]("quarter", 1, F.lit("2024-01-31").cast("date")))) == \
        "2024-04-30"
    assert str(one(spark, f["dateSub"]("week", 1, F.lit("2024-01-08").cast("date")))) == \
        "2024-01-01"
    assert one(spark, f["age"]("day", F.lit("2024-01-01").cast("date"),
                               F.lit("2024-03-01").cast("date"))) == 60


def test_readable_formatting(spark):
    f = CH_FUNCTIONS
    assert one(spark, f["formatReadableSize"](123)) == "123.00 B"
    assert one(spark, f["formatReadableSize"](1536)) == "1.50 KiB"
    assert one(spark, f["formatReadableSize"](1024 ** 3 * 3)) == "3.00 GiB"
    assert one(spark, f["formatReadableDecimalSize"](1500)) == "1.50 KB"
    assert one(spark, f["formatReadableQuantity"](1234567)) == "1.23 million"
    assert one(spark, f["formatReadableQuantity"](42)) == "42.00 "


def test_string_search_breadth(spark):
    f = CH_FUNCTIONS
    s = F.lit("hello brave new world")
    assert one(spark, f["substringIndex"](s, " ", 2)) == "hello brave"
    assert one(spark, f["translate"]("abca", "ab", "xy")) == "xycx"
    assert one(spark, f["countMatches"](F.lit("a1b22c333"), r"\d+")) == 3
    assert one(spark, f["ngrams"]("abcd", 2)) == ["ab", "bc", "cd"]
    assert one(spark, f["byteHammingDistance"]("karolin", "kathrin")) == 3
    assert one(spark, f["multiSearchAllPositions"](s, ["new", "zzz", "hello"])) \
        == [13, 0, 1]
    assert one(spark, f["multiSearchFirstPosition"](s, ["new", "brave"])) == 7
    assert one(spark, f["multiSearchFirstIndex"](s, ["new", "brave"])) == 2
    assert one(spark, f["multiSearchFirstIndex"](s, ["zzz", "qqq"])) == 0
    assert one(spark, f["hasToken"](s, "brave")) == 1
    assert one(spark, f["hasToken"](s, "brav")) == 0


def test_bit_conv_misc_breadth(spark):
    f = CH_FUNCTIONS
    assert one(spark, f["bitRotateLeft"](1, 63)) == -(2 ** 63)
    assert one(spark, f["bitRotateRight"](1, 1)) == -(2 ** 63)
    assert one(spark, f["bitTestAll"](0b101, 0, 2)) == 1
    assert one(spark, f["bitTestAll"](0b101, 0, 1)) == 0
    assert one(spark, f["bitTestAny"](0b101, 1, 2)) == 1
    assert one(spark, f["bitHammingDistance"](0b101, 0b110)) == 2
    assert one(spark, f["toInt32OrZero"]("42")) == 42
    assert one(spark, f["toInt32OrZero"]("x")) == 0
    assert one(spark, f["accurateCast"]("7", "Int64")) == 7
    assert one(spark, f["accurateCastOrNull"]("x", "Int64")) is None
    assert one(spark, f["equals"](1, 1)) == 1
    assert one(spark, f["xor"](1, 0)) == 1
    assert one(spark, f["and"](1, 1, 0)) == 0
    assert one(spark, f["or"](0, 0, 1)) == 1
    assert one(spark, f["bar"](5, 0, 10, 10)) == "█████"
    assert one(spark, f["transform"]("b", ["a", "b"], ["A", "B"], "?")) == "B"
    assert one(spark, f["transform"]("z", ["a", "b"], ["A", "B"], "?")) == "?"
    assert one(spark, f["isZeroOrNull"](0)) == 1
    assert one(spark, f["ifNotFinite"](float("inf"), -1.0)) == -1.0
    assert one(spark, f["nanToNull"](float("nan"))) is None
    assert one(spark, ch.arrayProduct(F.array(F.lit(2), F.lit(5)))) == 10.0


def test_vector_math_breadth(spark):
    f = CH_FUNCTIONS
    a = F.array(F.lit(3.0), F.lit(4.0))
    b = F.array(F.lit(1.0), F.lit(1.0))
    assert one(spark, f["dotProduct"](a, b)) == 7.0
    assert one(spark, f["L2SquaredDistance"](a, b)) == 13.0
    assert one(spark, f["L2Norm"](a)) == 5.0
    assert one(spark, f["L1Norm"](a)) == 7.0
    assert one(spark, f["LinfNorm"](a)) == 4.0
    assert one(spark, f["LpNorm"](a, 2.0)) == pytest.approx(5.0)
    assert one(spark, f["L2Normalize"](a)) == [0.6, 0.8]
    # reference docstring example: arrayROCAUC([0.1,0.4,0.35,0.8],[0,0,1,1]) = 0.75
    s = F.array(*[F.lit(x) for x in [0.1, 0.4, 0.35, 0.8]])
    lab = F.array(*[F.lit(x) for x in [0, 0, 1, 1]])
    assert one(spark, f["arrayROCAUC"](s, lab)) == pytest.approx(0.75)


def test_misc_longtail_breadth(spark):
    f = CH_FUNCTIONS
    assert one(spark, f["javaHash"]("abc")) == 96354         # Java "abc".hashCode()
    assert one(spark, f["javaHash"]("")) == 0
    assert one(spark, f["hiveHash"]("abc")) == 96354
    assert one(spark, f["ngramDistance"]("abcd", "abcd")) == 0.0
    assert one(spark, f["ngramDistance"]("abcdef", "uvwxyz")) == 1.0
    assert one(spark, f["alphaTokens"]("ab1cd--ef")) == ["ab", "cd", "ef"]
    assert one(spark, f["dateName"]("month", F.lit("2021-04-05").cast("date"))) == "April"
    assert one(spark, f["simpleJSONExtractInt"]('{"a": 7}', "a")) == 7
    assert one(spark, f["simpleJSONHas"]('{"a": 7}', "b")) == 0
    key = "0123456789abcdef0123456789abcdef"
    enc = f["encrypt"]("aes-256-ecb", F.lit("secret"), F.lit(key))
    assert one(spark, f["decrypt"]("aes-256-ecb", enc, F.lit(key)).cast("string")) == "secret"
    # deterministic draw: same input -> same sample
    arr = F.array(*[F.lit(i) for i in range(10)])
    assert one(spark, f["arrayRandomSample"](arr, 3)) == one(
        spark, f["arrayRandomSample"](arr, 3))
    assert one(spark, f["randExponential"](2.0)) >= 0.0
    slots = f["timeSlots"](F.lit("2021-01-01 10:05:00").cast("timestamp"), 3700)
    assert one(spark, F.size(slots)) == 3


def test_array_reduce_dispatch(spark):
    from clickhouse_core_spark.functions import CH_FUNCTIONS
    f = CH_FUNCTIONS["arrayReduce"]
    arr = F.array(F.lit(3.0), F.lit(1.0), F.lit(3.0), F.lit(2.0))
    row = spark.range(1).select(
        f("sum", arr).alias("s"), f("min", arr).alias("mn"),
        f("count", arr).alias("c"), f("avg", arr).alias("a"),
        f("uniqExact", arr).alias("u"), f("median", arr).alias("md"),
        f("product", arr).alias("p")).first()
    assert (row.s, row.mn, row.c, row.a, row.u, row.p) == \
        (9.0, 1.0, 4, 2.25, 3, 18.0)
    assert row.md == 2.0  # lower middle of [1,2,3,3]
    import pytest as _pt
    with _pt.raises(NotImplementedError, match="arrayReduce"):
        f("corr", arr)


def test_conversion_ordefault_matrix(spark):
    """to<T>OrDefault (FunctionsConversion.h OrDefault registrations):
    parse failure -> caller default (2-arg) or type zero (1-arg);
    unsigned forms range-check like readIntTextImpl."""
    f = CH_FUNCTIONS
    assert one(spark, f["toInt32OrDefault"]("42")) == 42
    assert one(spark, f["toInt32OrDefault"]("x")) == 0
    assert one(spark, f["toInt32OrDefault"]("x", F.lit(-1))) == -1
    assert one(spark, f["toUInt8OrDefault"]("300", F.lit(7))) == 7
    assert one(spark, f["toUInt8OrDefault"]("-1", F.lit(7))) == 7
    assert one(spark, f["toUInt64OrDefault"]("18446744073709551615")) \
        is not None
    assert one(spark, f["toFloat32OrDefault"]("bad", F.lit(1.5))) == 1.5
    assert one(spark, f["toDateOrDefault"]("bad")) == dt.date(1970, 1, 1)
    assert one(spark, f["toDateTime64OrDefault"]("bad")) == \
        dt.datetime(1970, 1, 1, 0, 0)


def test_frontend_conversion_and_in_family(spark, ch_sql_fn=None):
    """SQL-level matrix + in() functional forms (src/Functions/in.cpp):
    plain in/notIn coalesce NULL to false (CH contract), nullIn keeps
    ANSI NULL propagation; global*/IgnoreSet coincide on Spark."""
    from clickhouse_core_spark.plans.frontend import ch_sql
    import pandas as pd
    df = spark.createDataFrame(
        pd.DataFrame({"s": ["12", "x", "300", "-5", None]}))
    df.createOrReplaceTempView("conv_t")
    rows = {r["s"]: r for r in ch_sql(spark, """
        SELECT s,
               toUInt8OrZero(s) AS u8,
               toUInt16OrNull(s) AS u16,
               toInt64OrDefault(s, -7) AS i64,
               nullIn(s, ('12', '300')) AS ni,
               notIn(s, ('12', '300')) AS nn,
               globalIn(s, ('12', '99')) AS gi
        FROM conv_t""").collect()}
    assert rows["12"]["u8"] == 12 and rows["300"]["u8"] == 0
    assert rows["-5"]["u16"] is None and rows["300"]["u16"] == 300
    assert rows["x"]["i64"] == -7
    assert rows["12"]["ni"] is True and rows["x"]["ni"] is False
    assert rows[None]["ni"] is None          # nullIn propagates NULL
    assert rows[None]["nn"] is False         # notIn coalesces to false
    assert rows["12"]["gi"] is True and rows[None]["gi"] is False
    agg = ch_sql(spark, """
        SELECT medianGK(100)(CAST(s AS INT)) AS mg,
               STD(CAST(s AS INT)) AS sd
        FROM conv_t WHERE s IN ('12', '300')""").collect()[0]
    assert agg["mg"] in (12, 300)
    assert agg["sd"] == 144.0
