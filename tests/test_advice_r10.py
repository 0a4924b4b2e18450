"""Round-10 ADVICE regression tests: chained AND/OR retry edits,
numbers() offset clamp, _fold_const_int hardening, ATTACH PARTITION
partition filtering, array-literal comparison string-awareness and the
mirrored LHS form."""

import pytest

from clickhouse_core_spark.plans.frontend import (
    _fold_const_int, ch_sql)


@pytest.fixture(scope="module")
def spark():
    from clickhouse_core_spark import get_spark
    s = get_spark("test_advice_r10", master="local[4]",
                  extra_conf={"spark.sql.shuffle.partitions": "4"})
    s.sparkContext.setLogLevel("ERROR")
    return s


def _rows(spark, sql, tables=None):
    return [tuple(r) for r in
            ch_sql(spark, sql, tables=tables or {}).collect()]


def test_chained_and_retry(spark):
    r = _rows(spark, "SELECT number FROM numbers(5) "
                     "WHERE number + 1 AND number + 2 AND number + 3")
    assert [x[0] for x in r] == [0, 1, 2, 3, 4]


def test_numbers_offset_not_clamped(spark):
    r = _rows(spark, "SELECT * FROM numbers(4000000000, 3)")
    assert [x[0] for x in r] == [4000000000, 4000000001, 4000000002]


def test_fold_const_int_hardened():
    assert _fold_const_int("9**9**9") is None
    assert _fold_const_int("-9/2") == -4          # C trunc, not floor
    assert _fold_const_int("-9%2") == -1
    assert _fold_const_int("(2+3)*4") == 20
    assert _fold_const_int("1/0") is None


def test_attach_partition_expr_key_filters(spark):
    tables: dict = {}
    ch_sql(spark, "CREATE TABLE tap (a UInt32, b DateTime) "
                  "ENGINE = MergeTree PARTITION BY toYYYYMM(b) "
                  "ORDER BY a", tables=tables)
    ch_sql(spark, "INSERT INTO tap VALUES "
                  "(1, toDateTime('2023-01-15 00:00:00')), "
                  "(2, toDateTime('2023-02-15 00:00:00'))",
           tables=tables)
    ch_sql(spark, "ALTER TABLE tap DETACH PARTITION 202301",
           tables=tables)
    ch_sql(spark, "ALTER TABLE tap DETACH PARTITION 202302",
           tables=tables)
    assert _rows(spark, "SELECT count() AS c FROM tap",
                 tables) == [(0,)]
    # attaching one partition must NOT resurrect the other
    ch_sql(spark, "ALTER TABLE tap ATTACH PARTITION 202301",
           tables=tables)
    assert _rows(spark, "SELECT a FROM tap", tables) == [(1,)]
    ch_sql(spark, "ALTER TABLE tap ATTACH PARTITION 202302",
           tables=tables)
    assert sorted(x[0] for x in
                  _rows(spark, "SELECT a FROM tap", tables)) == [1, 2]


def test_array_literal_compare_lhs_and_strings(spark):
    r = _rows(spark, "SELECT [1] < arr AS c, arr > [12.2] AS d, "
                     "' > array(' AS s "
                     "FROM (SELECT [12.3] AS arr)")
    assert r == [(True, True, " > array(")]
