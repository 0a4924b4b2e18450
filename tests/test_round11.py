"""Round-11 regression tests: FINAL over expression ORDER-BY keys (the
02791_final_block_structure_mismatch_bug family — reference sort-key
expressions are first-class, src/Storages/MergeTree/MergeTreeData.h:151),
plus this round's wrong-value and frontend fixes."""

import pytest
from pyspark.sql import functions as F

from clickhouse_core_spark.plans.frontend import ch_sql


@pytest.fixture(scope="module")
def spark():
    from clickhouse_core_spark import get_spark
    s = get_spark("test_round11", master="local[4]",
                  extra_conf={"spark.sql.shuffle.partitions": "4"})
    s.sparkContext.setLogLevel("ERROR")
    return s


def _rows(spark, sql, tables):
    df = ch_sql(spark, sql, tables=tables)
    return [tuple(r) for r in df.collect()]


# --------------------------------------- FINAL over expression sort keys

def test_replacing_final_expr_key_02791(spark):
    tables: dict = {}
    ch_sql(spark, """CREATE TABLE tbm (a UInt32, b DateTime)
        ENGINE = ReplacingMergeTree PARTITION BY toYYYYMM(b)
        ORDER BY (toDate(b), a)""", tables=tables)
    ch_sql(spark, "INSERT INTO tbm VALUES "
                  "(1, toDateTime('2023-01-01 12:12:12'))", tables=tables)
    ch_sql(spark, "INSERT INTO tbm VALUES "
                  "(1, toDateTime('2023-01-01 12:12:12'))", tables=tables)
    assert _rows(spark, "SELECT count(*) AS c FROM tbm FINAL",
                 tables) == [(1,)]
    ch_sql(spark, "INSERT INTO tbm VALUES "
                  "(1, toDateTime('2023-02-02 12:12:12'))", tables=tables)
    assert _rows(spark, "SELECT count(*) AS c FROM tbm FINAL",
                 tables) == [(2,)]
    ch_sql(spark, "OPTIMIZE TABLE tbm FINAL", tables=tables)
    ch_sql(spark, "INSERT INTO tbm VALUES "
                  "(2, toDateTime('2023-01-01 12:12:12'))", tables=tables)
    assert _rows(spark, "SELECT count(*) AS c FROM tbm FINAL",
                 tables) == [(3,)]


def test_final_view_exists_before_first_insert(spark):
    # part-less table: SELECT ... FINAL must work right after CREATE
    tables: dict = {}
    ch_sql(spark, """CREATE TABLE tbm_empty (a UInt32, b DateTime)
        ENGINE = ReplacingMergeTree ORDER BY (toDate(b), a)""",
           tables=tables)
    assert _rows(spark, "SELECT count(*) AS c FROM tbm_empty FINAL",
                 tables) == [(0,)]


def test_summing_final_expr_key(spark):
    tables: dict = {}
    ch_sql(spark, """CREATE TABLE tsum (v UInt32, b DateTime)
        ENGINE = SummingMergeTree ORDER BY toDate(b)""", tables=tables)
    ch_sql(spark, "INSERT INTO tsum VALUES "
                  "(3, toDateTime('2023-01-01 01:00:00')), "
                  "(4, toDateTime('2023-01-01 23:00:00')), "
                  "(5, toDateTime('2023-01-02 01:00:00'))", tables=tables)
    rows = _rows(spark, "SELECT sum(v) AS s, count(*) AS c "
                        "FROM tsum FINAL", tables)
    assert rows == [(12, 2)]


def test_collapsing_final_expr_key(spark):
    tables: dict = {}
    ch_sql(spark, """CREATE TABLE tcol (sgn Int8, b DateTime)
        ENGINE = CollapsingMergeTree(sgn) ORDER BY toDate(b)""",
           tables=tables)
    ch_sql(spark, "INSERT INTO tcol VALUES "
                  "(1, toDateTime('2023-01-01 01:00:00')), "
                  "(-1, toDateTime('2023-01-01 23:00:00')), "
                  "(1, toDateTime('2023-01-02 01:00:00'))", tables=tables)
    rows = _rows(spark, "SELECT count(*) AS c FROM tcol FINAL", tables)
    assert rows == [(1,)]


# ------------------------------------------- r11 wrong-value classes

def test_tounixtimestamp64_tz_epochs_01277(spark):
    r = _rows(spark, """SELECT
        toUnixTimestamp64Second(toDateTime64(
            '2019-09-16 19:20:12.345678910', 3, 'Asia/Istanbul')) AS s,
        toUnixTimestamp64Milli(toDateTime64(
            '2019-09-16 19:20:12.345678910', 3, 'Asia/Istanbul')) AS ms,
        toString(toDateTime64('2019-09-16 19:20:12.345678910', 3,
                              'Asia/Istanbul')) AS wall""", {})
    assert r == [(1568650812, 1568650812345, "2019-09-16 19:20:12.345")]


def test_tounixtimestamp_two_arg_tz(spark):
    r = _rows(spark, "SELECT toUnixTimestamp('2019-09-16 19:20:12', "
                     "'Asia/Istanbul') AS s", {})
    assert r == [(1568650812,)]


def test_bitmap_null_state_is_empty_01552(spark):
    r = _rows(spark, """
        SELECT bitmapOrCardinality(CAST(NULL AS Array(UInt64)),
                                   bitmapBuild([1])) AS orc,
               bitmapCardinality(CAST(NULL AS Array(UInt64))) AS c
    """, {})
    assert r == [(1, 0)]


def test_datetime_saturating_clamp_01702(spark):
    r = _rows(spark, """SELECT
        toString(toDateTime('-922337203.6854775808', 1,
                            'Asia/Istanbul')) AS a,
        toString(toDateTime('9922337203.6854775808', 1,
                            'Asia/Istanbul')) AS b,
        toString(toDateTime64(CAST('10500000000.1' AS Decimal64(1)),
                              1, 'Asia/Istanbul')) AS c,
        toString(toDateTime64(CAST('-10500000000.1' AS Decimal64(1)),
                              1, 'Asia/Istanbul')) AS d""", {})
    assert r == [("1940-10-09 21:13:16.4", "2284-06-04 23:46:43.6",
                  "2299-12-31 23:40:00.1", "1900-01-01 00:00:00.9")]


def test_lowerutf8_preserves_invalid_bytes_02071(spark):
    r = _rows(spark, "SELECT lowerUTF8('\\xe2') == '\\xe2' AS eq, "
                     "hex(lowerUTF8('\\xe2')) AS h, "
                     "lowerUTF8('AbC') AS low", {})
    assert r == [(True, "E2", "abc")]


def test_tuple_string_compare_03371(spark):
    tables: dict = {}
    ch_sql(spark, "CREATE TABLE tsc (id UInt64, s1 Nullable(String), "
                  "s2 Nullable(String)) ENGINE = MergeTree ORDER BY id",
           tables=tables)
    ch_sql(spark, "INSERT INTO tsc VALUES (1, 'a', 'b'), (2, 'c', 'd'),"
                  " (3, 'e', null)", tables=tables)
    assert _rows(spark, "SELECT id FROM tsc WHERE (s1, s2) = "
                        "'(\\'a\\',\\'b\\')'", tables) == [(1,)]
    assert _rows(spark, "SELECT id FROM tsc WHERE (s1, s2) = "
                        "CAST((SELECT s1, s2 FROM tsc WHERE s1 = 'a') "
                        "AS text)", tables) == [(1,)]
    assert _rows(spark, "SELECT id FROM tsc WHERE (s1, null) = "
                        "('a', null)", tables) == []
    assert _rows(spark, "SELECT id FROM tsc WHERE (s1, null) = "
                        "'(\\'a\\',null)'", tables) == []
    assert _rows(spark, "SELECT tuple('a') = '(\\'a\\')' AS x",
                 tables) == [(True,)]


def test_distributed_alias_columns_03035(spark):
    tables: dict = {}
    ch_sql(spark, "CREATE TABLE ab (src String, theAlias String ALIAS "
                  "trimBoth(src)) ENGINE = MergeTree ORDER BY src",
           tables=tables)
    ch_sql(spark, "CREATE TABLE ab_dist AS ab ENGINE = Distributed("
                  "'test_shard_localhost', currentDatabase(), 'ab', "
                  "rand())", tables=tables)
    ch_sql(spark, "INSERT INTO ab VALUES ('  SOURCE1  ')",
           tables=tables)
    r = _rows(spark, "SELECT theAlias, CAST(NULL, 'Nullable(String)') "
                     "AS src FROM ab_dist LIMIT 1", tables)
    assert r == [("SOURCE1", None)]
    r2 = _rows(spark, "SELECT CAST(123, 'String') AS src, theAlias "
                      "FROM ab_dist LIMIT 1", tables)
    assert r2 == [("123", "SOURCE1")]


def test_expr_key_direct_operators():
    # direct operator-level coverage, no SQL frontend in the loop
    from clickhouse_core_spark import get_spark
    from clickhouse_core_spark.operators.final import (
        coalescing_final, replacing_final, summing_final)
    s = get_spark("test_round11", master="local[4]",
                  extra_conf={"spark.sql.shuffle.partitions": "4"})
    df = s.createDataFrame(
        [(1, "2023-01-01 01:00:00", 10),
         (2, "2023-01-01 09:00:00", 20),
         (3, "2023-01-02 01:00:00", 30)],
        "id long, ts string, v long").withColumn(
            "ts", F.col("ts").cast("timestamp"))
    r = replacing_final(df, ["to_date(ts)"], version="id")
    assert sorted(t[0] for t in r.select("id").collect()) == [2, 3]
    assert set(r.columns) == {"id", "ts", "v"}
    sm = summing_final(df.drop("ts"), ["pmod(id, 2)"])
    assert set(sm.columns) == {"id", "v"}
    co = coalescing_final(df, ["to_date(ts)"], order_col="id")
    assert co.count() == 2
