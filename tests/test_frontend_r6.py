"""Round-6 frontend closure: generic registry SQL-name bridge,
arrayJoin-in-expression hoisting, inline expression aliases, typed
JSONExtract family, nonzero-true conditions, system.numbers/one,
toStartOfInterval with interval arguments, variadic arrayIntersect.

Semantics references: src/Functions/arrayJoin.cpp, FunctionsJSON.cpp,
if.cpp (UInt8 conditions), toStartOfInterval.cpp, getSetting.cpp,
ParserExpressionElement (inline aliases),
StorageSystemNumbers/StorageSystemOne."""

from pyspark.sql import functions as F  # noqa: F401

from clickhouse_core_spark.plans.frontend import ch_sql


def _vals(spark, sql):
    return [tuple(r) for r in ch_sql(spark, sql).collect()]


def test_bridge_resolves_registry_names(spark):
    """Names with no SQL template inline through Expression.sql()."""
    assert _vals(spark, "SELECT IPv4NumToString(16909060) AS v") \
        == [("1.2.3.4",)]
    assert _vals(spark, "SELECT bitCount(255) AS v") == [(8,)]
    # literal-coercion retry (shift width must be a python int)
    assert _vals(spark, "SELECT bitShiftLeft(1, 3) AS v") == [(8,)]
    # raw JSON array extraction (dedicated rule; empty input -> NULL)
    assert ch_sql(spark, "SELECT JSONExtractArrayRaw('') AS v") \
        .first().v is None
    got = ch_sql(spark, "SELECT JSONExtractArrayRaw("
                        "'[\"h\", [1,2], 5]') AS v").first().v
    assert got == ['"h"', "[1,2]", "5"]


def test_arrayjoin_in_expression(spark):
    got = _vals(spark,
                "SELECT arrayJoin(['hello','world']) LIKE 'hello%' AS v")
    assert sorted(got) == [(False,), (True,)]
    assert sorted(_vals(spark, "SELECT arrayJoin([1,2,3]) + 10 AS v")) \
        == [(11,), (12,), (13,)]
    # distinct args multiply (cartesian), identical args share
    assert sorted(_vals(
        spark, "SELECT arrayJoin([1,2]) + arrayJoin([10,20]) AS v")) \
        == [(11,), (12,), (21,), (22,)]
    got = sorted(_vals(
        spark, "SELECT arrayJoin([1,2]) + arrayJoin([1,2]) AS v"))
    assert got == [(2,), (4,)]          # same text -> one expansion
    # top-level form keeps the plain explode path
    assert sorted(_vals(spark, "SELECT arrayJoin([1,2]) AS v")) \
        == [(1,), (2,)]


def test_inline_expression_aliases(spark):
    assert _vals(spark, "SELECT (0 as a) ? (2 as b) : (3 as c) as d, "
                        "a, b, c, d") == [(3, 0, 2, 3, 3)]
    assert _vals(spark, "SELECT (number * 2 AS t) + 1 AS v, t "
                        "FROM numbers(3) ORDER BY t") \
        == [(1, 0), (3, 2), (5, 4)]
    assert _vals(spark, "SELECT count(*) AS c FROM (SELECT 1) "
                        "WHERE (1 AS q) = 1") == [(1,)]
    # CAST and tuple literals are untouched
    assert _vals(spark, "SELECT CAST(5 AS Int32) AS v") == [(5,)]


def test_nonzero_true_conditions(spark):
    assert _vals(spark, "SELECT 1 ? 'y' : 'n' AS v") == [("y",)]
    assert _vals(spark, "SELECT if(0, 'y', 'n') AS v") == [("n",)]
    assert _vals(spark, "SELECT multiIf(0, 'a', 2, 'b', 'c') AS v") \
        == [("b",)]


def test_system_numbers_and_one(spark):
    assert _vals(spark, "SELECT number FROM system.numbers LIMIT 3") \
        == [(0,), (1,), (2,)]
    assert _vals(spark, "SELECT dummy FROM system.one") == [(0,)]


def test_typed_jsonextract(spark):
    j = '{"a": "hello", "b": [-100, 200.0, 300]}'
    r = ch_sql(spark, f"SELECT JSONExtract('{j}', "
                      f"'Tuple(String, Array(Float64))') AS v").first().v
    assert r.col1 == "hello" and r.col2 == [-100.0, 200.0, 300.0]
    r = ch_sql(spark, f"SELECT JSONExtract('{j}', "
                      f"'Tuple(a String, b Array(Float64))') AS v").first().v
    assert r.a == "hello" and r.b == [-100.0, 200.0, 300.0]
    assert ch_sql(spark, "SELECT JSONExtract('{\"x\": 5}', 'x', "
                         "'Int64') AS v").first().v == 5
    kv = ch_sql(spark, "SELECT JSONExtractKeysAndValues("
                       "'{\"a\": 1, \"b\": 2}', 'Int64') AS v").first().v
    assert [(e.col1, e.col2) for e in kv] == [("a", 1), ("b", 2)]
    raw = ch_sql(spark, f"SELECT JSONExtractKeysAndValuesRaw('{j}') "
                        f"AS v").first().v
    assert raw[0].col1 == "a" and raw[0].col2 == '"hello"'
    assert ch_sql(spark, "SELECT JSONKey('{\"a\":1,\"b\":2}', -1) AS v") \
        .first().v == "b"


def test_tostartofinterval_interval_args(spark):
    q = ("SELECT toStartOfInterval(toDateTime('2023-10-09 10:11:12'), "
         "{}) AS v")
    assert str(ch_sql(spark, q.format("INTERVAL 5 MINUTE")).first().v) \
        == "2023-10-09 10:10:00"
    assert str(ch_sql(spark, q.format("toIntervalMinute(5)")).first().v) \
        == "2023-10-09 10:10:00"
    # 2023-10-11 is a Wednesday -> Monday 2023-10-09 (CH week origin)
    assert str(ch_sql(
        spark, "SELECT toStartOfInterval(toDateTime("
               "'2023-10-11 10:11:12'), toIntervalWeek(1)) AS v")
        .first().v) == "2023-10-09 00:00:00"
    assert str(ch_sql(spark, q.format("toIntervalMonth(2)")).first().v) \
        == "2023-09-01 00:00:00"


def test_get_setting(spark):
    spark.conf.set("spark.clickhouse_core.setting.custom_t", "7")
    try:
        assert ch_sql(spark, "SELECT getSetting('custom_t') AS v") \
            .first().v == 7
        assert ch_sql(spark, "SELECT getSettingOrDefault('custom_nope',"
                             " 'dflt') AS v").first().v == "dflt"
    finally:
        spark.conf.unset("spark.clickhouse_core.setting.custom_t")


def test_higher_order_array_family(spark):
    """CH lambda-first higher-order forms (arrayAll/Count/First/
    FirstIndex/LastIndex/Sum/Min/Max — src/Functions/array/) with
    UInt8-returning lambdas coerced to BOOLEAN."""
    cases = {
        "SELECT arrayAll(x -> 0, emptyArrayUInt8()) AS v": 1,
        "SELECT arrayAll(x -> x > 1, [2, 3]) AS v": 1,
        "SELECT arrayCount(x -> x % 2, [1,2,3,4,5]) AS v": 3,
        "SELECT arrayFirst(x -> x > 2, [1,2,3,4]) AS v": 3,
        "SELECT arrayFirst(x -> 0, [1,2]) AS v": None,
        "SELECT arrayFirstIndex(x -> x > 2, [1,2,3,4]) AS v": 3,
        "SELECT arrayFirstIndex(x -> 0, [1,2]) AS v": 0,
        "SELECT arrayLastIndex(x -> x > 2, [1,2,3,4]) AS v": 4,
        "SELECT arraySum(x -> x * 2, [1,2,3]) AS v": 12.0,
        "SELECT arrayMin(x -> -x, [1,2,3]) AS v": -3,
        "SELECT arrayExists(x -> 1, [0]) AS v": True,
        "SELECT isDecimalOverflow(toDecimal32(1, 0), 9) AS v": 0,
    }
    for sql, want in cases.items():
        assert ch_sql(spark, sql).first().v == want, sql


def test_quantified_comparisons(spark):
    """expr <op> ANY|ALL (subquery) (ExpressionListParsers quantified
    comparison) — = ANY -> IN, != ALL -> NOT IN, general forms fold to
    a scalar flag (empty set: ANY false, ALL true)."""
    cases = {
        "select 1 == any (select number from numbers(10)) AS v": True,
        "select 1 != all (select 1 from numbers(10)) AS v": False,
        "select 1 < any (select number from numbers(10)) AS v": True,
        "select 11 > all (select number from numbers(10)) AS v": True,
        "select 1 >= all (select number from numbers(0)) AS v": True,
        "select 1 < any (select number from numbers(0)) AS v": False,
    }
    for sql, want in cases.items():
        assert ch_sql(spark, sql).first().v == want, sql


def test_complex_cast_types(spark):
    assert ch_sql(spark, "SELECT [1, 2, 3] :: Array(Int32) AS v") \
        .first().v == [1, 2, 3]
    assert ch_sql(spark, "SELECT CAST('7' AS Nullable(UInt64)) + 1 "
                         "AS v").first().v == 8
    assert ch_sql(spark, "SELECT 1.1::BFloat16 > 1 AS v").first().v
    # ::Dynamic drops (the any-type carrier)
    assert ch_sql(spark, "SELECT 43::Dynamic AS v").first().v == 43


def test_alias_visible_in_where(spark):
    """CH allows SELECT-list aliases in WHERE/GROUP BY (QueryNormalizer
    substitution) — implemented as an error-triggered retry."""
    got = [r.d for r in ch_sql(
        spark, "SELECT number * 2 AS d FROM numbers(5) WHERE d > 4 "
               "ORDER BY d").collect()]
    assert got == [6, 8]
    got = [r.a for r in ch_sql(
        spark, "select number as a from numbers(10) where "
               "a == any (select number from numbers(3, 3)) "
               "ORDER BY a").collect()]
    assert got == [3, 4, 5]


def test_makedate_default_on_invalid(spark):
    """makeDate/makeDate32 return the DEFAULT 1970-01-01 for any
    invalid or out-of-range input (02243_make_date32.reference);
    NULLs propagate."""
    cases = {
        "SELECT toString(makeDate32(1980, 10, 17)) AS v": "1980-10-17",
        "SELECT toString(makeDate32(-1980, 10, 17)) AS v": "1970-01-01",
        "SELECT toString(makeDate32(1984, 2, 30)) AS v": "1970-01-01",
        "SELECT toString(makeDate32(19800, 12, 3)) AS v": "1970-01-01",
        "SELECT toString(makeDate(1969, 8, 24)) AS v": "1970-01-01",
        "SELECT toString(makeDate32(1901, 8, 24)) AS v": "1901-08-24",
        "SELECT makeDate32(NULL, 1, 1) AS v": None,
    }
    for sql, want in cases.items():
        assert ch_sql(spark, sql).first().v == want, sql


def test_subscript_zero_and_moving_aggs(spark):
    assert ch_sql(spark, "SELECT [1,2,3][0] AS v").first().v is None
    assert ch_sql(spark, "SELECT [1,2,3][-1] AS v").first().v == 3
    got = ch_sql(spark, "SELECT groupArrayMovingSum(3)(number) AS v "
                        "FROM numbers(6)").first().v
    assert got == [0.0, 1.0, 3.0, 6.0, 9.0, 12.0]
    got = ch_sql(spark, "SELECT groupArrayMovingAvg(2)(number) AS v "
                        "FROM numbers(4)").first().v
    assert got == [0.0, 0.5, 1.5, 2.5]
    got = ch_sql(spark, "SELECT arrayFold( acc,x -> acc+x*2, "
                        "[1, 2, 3, 4], toInt64(3)) AS v").first().v
    assert got == 23


def test_groupby_item_aliases(spark):
    got = [tuple(r) for r in ch_sql(
        spark, "SELECT a, count(*) AS c FROM numbers(6) "
               "GROUP BY number % 2 AS a ORDER BY a").collect()]
    assert got == [(0, 3), (1, 3)]


def test_variadic_array_intersect(spark):
    assert _vals(spark, "SELECT arraySort(arrayIntersect([1,1,1], [3], "
                        "[2,2,2])) AS v") == [([],)]
    assert _vals(spark, "SELECT arraySort(arrayIntersect([1,2,3], "
                        "[2,3], [3])) AS v") == [([3],)]
