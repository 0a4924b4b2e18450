"""Round-10 regressions for the round-9 advisor findings:

1. toDate32(N) keeps negative day numbers (floor 1900-01-01) and uses
   the DATE_LUT_MAX_EXTEND_DAY_NUM (120529) days-vs-seconds cutoff
   (FunctionsConversion.h ToDate32Transform32Or64Signed).
2. reinterpretAsUInt64/Int64 over a Float32 argument yields the
   zero-extended 32-bit pattern (memcpy of min(sizeof) bytes);
   reinterpretAsInt64 of a negative double yields the signed bit
   pattern, not NULL (src/Functions/reinterpretAs.cpp).
3. INSERT ... FORMAT JSONEachRow keeps NULL for declared Nullable
   columns of view-backed Memory tables (input_format_null_as_default
   applies to non-Nullable targets only).
4. groupBitmapState over a SCALAR uint column analyzes (collect_set
   path); the flatten form stays for state-array inputs.
5. Table-qualified references to real columns named like CH types
   (t.Date) survive when session metadata identifies t as a table.
"""

import math
import os
import struct
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_core_spark.plans.frontend import ch_sql  # noqa: E402


@pytest.fixture()
def tables():
    return {}


# ---------------------------------------------------------- finding 1

def test_todate32_negative_days(spark, tables):
    r = ch_sql(spark, "SELECT toDate32(-10) AS d", tables=tables) \
        .collect()[0]
    assert str(r.d) == "1969-12-22"


def test_todate32_floor_at_1900(spark, tables):
    r = ch_sql(spark, "SELECT toDate32(-99999) AS d", tables=tables) \
        .collect()[0]
    assert str(r.d) == "1900-01-01"


def test_todate32_days_up_to_cutoff(spark, tables):
    # 100000 days after epoch (< 120529) is a DAY number, not seconds
    r = ch_sql(spark, "SELECT toDate32(100000) AS d", tables=tables) \
        .collect()[0]
    assert str(r.d) == "2243-10-17"


def test_todate32_seconds_above_cutoff(spark, tables):
    r = ch_sql(spark, "SELECT toDate32(1000000000) AS d",
               tables=tables).collect()[0]
    assert str(r.d) == "2001-09-09"


# ---------------------------------------------------------- finding 2

def test_reinterpret_uint64_of_float32(spark, tables):
    r = ch_sql(spark,
               "SELECT reinterpretAsUInt64(toFloat32(1)) AS b",
               tables=tables).collect()[0]
    assert int(r.b) == 1065353216      # float32 bits, zero-extended


def test_reinterpret_uint64_of_float64(spark, tables):
    r = ch_sql(spark,
               "SELECT reinterpretAsUInt64(toFloat64(1)) AS b",
               tables=tables).collect()[0]
    assert int(r.b) == 4607182418800017408


def test_reinterpret_int64_negative_double(spark, tables):
    want = struct.unpack("<q", struct.pack("<d", -2.5))[0]
    r = ch_sql(spark,
               "SELECT reinterpretAsInt64(toFloat64(-2.5)) AS b",
               tables=tables).collect()[0]
    assert r.b == want


def test_reinterpret_uint64_negative_double(spark, tables):
    want = struct.unpack("<Q", struct.pack("<d", -2.5))[0]
    r = ch_sql(spark,
               "SELECT reinterpretAsUInt64(toFloat64(-2.5)) AS b",
               tables=tables).collect()[0]
    assert int(r.b) == want


# ---------------------------------------------------------- finding 3

def test_insert_json_null_into_declared_nullable(spark, tables):
    ch_sql(spark,
           "CREATE TABLE adv9_null (x Nullable(Int64), y Int64) "
           "ENGINE = Memory", tables=tables)
    ch_sql(spark,
           'INSERT INTO adv9_null FORMAT JSONEachRow '
           '{"x": null, "y": null} {"x": 7, "y": 8}',
           tables=tables)
    rows = ch_sql(spark, "SELECT x, y FROM adv9_null ORDER BY y",
                  tables=tables).collect()
    # declared Nullable keeps NULL; non-Nullable fills type default 0
    assert [(r.x, r.y) for r in rows] == [(None, 0), (7, 8)]


# ---------------------------------------------------------- finding 4

def test_group_bitmap_state_scalar_input(spark, tables):
    r = ch_sql(spark, """
        SELECT bitmapCardinality(groupBitmapState(n % 3)) AS c
        FROM (SELECT number AS n FROM numbers(10))
    """, tables=tables).collect()[0]
    assert r.c == 3


def test_group_bitmap_merge_of_states(spark, tables):
    r = ch_sql(spark, """
        SELECT groupBitmapMerge(s) AS c FROM
          (SELECT n % 2 AS g, groupBitmapState(n % 4) AS s
           FROM (SELECT number AS n FROM numbers(12)) GROUP BY g)
    """, tables=tables).collect()[0]
    assert r.c == 4


# ---------------------------------------------------------- finding 5

def test_table_qualified_real_column_named_date(spark, tables):
    ch_sql(spark,
           "CREATE TABLE adv9_dates (`Date` Date, v Int64) "
           "ENGINE = Memory", tables=tables)
    ch_sql(spark,
           "INSERT INTO adv9_dates VALUES ('2024-01-02', 1)",
           tables=tables)
    r = ch_sql(spark,
               "SELECT t.Date AS d, t.v AS v FROM adv9_dates AS t",
               tables=tables).collect()[0]
    assert str(r.d) == "2024-01-02" and r.v == 1


def test_dynamic_subcolumn_still_rewrites_tracked(spark, tables):
    ch_sql(spark,
           "CREATE TABLE adv9_dyn (d Dynamic) ENGINE = Memory",
           tables=tables)
    ch_sql(spark, "INSERT INTO adv9_dyn VALUES (-42)", tables=tables)
    r = ch_sql(spark, "SELECT d.Int64 AS i FROM adv9_dyn",
               tables=tables).collect()[0]
    assert r.i == -42
