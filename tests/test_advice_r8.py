"""Round-9 regressions for the round-8 advisor findings:

1. countMerge sums partial counts; avgMerge is the weighted merge of
   (sum, count) states (AggregateFunctionState.h / ...Merge.h — the
   reference's countMerge sums, avgMerge re-divides total/total).
2. Integer arithmetic on Date-RETURNING functions (today, yesterday,
   toStartOfMonth family, toMonday) adds DAYS, not seconds
   (FunctionDateOrDateTimeAddInterval.h plus/minus overloads).
3. The materialized-view cascade depth guard actually binds: a cyclic
   MV TO chain raises instead of recursing; MV push failures surface.
4. -OrDefault empty-set defaults are return-type-shaped ('' for
   String, epoch for Date), not a hardcoded 0
   (AggregateFunctionOrFill.h).
5. TabSeparated escaping covers \\b, \\f and NUL
   (writeAnyEscapedString's escape set).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_core_spark.plans.frontend import ch_sql  # noqa: E402
from clickhouse_core_spark.sources.tsvrender import (  # noqa: E402
    _escape_top, _escape_quoted)


@pytest.fixture()
def tables():
    return {}


# ---------------------------------------------------------- finding 1

def test_count_merge_sums_partial_counts(spark, tables):
    # 3 groups with 2/2/1 rows -> countMerge must return 5, not 3
    r = ch_sql(spark, """
        SELECT countMerge(s) AS c FROM
          (SELECT k % 3 AS g, countState(n) AS s
           FROM (SELECT number AS n, number AS k FROM numbers(5))
           GROUP BY g)
    """, tables=tables).collect()[0]
    assert r.c == 5


def test_avg_merge_is_weighted(spark, tables):
    # group sizes 4 and 1: values 0,2,4,6 (avg 3) and 8 (avg 8);
    # unweighted avg-of-avgs = 5.5, the true merged avg = 4.0
    r = ch_sql(spark, """
        SELECT avgMerge(s) AS a FROM
          (SELECT IF(n < 8, 0, 1) AS g, avgState(n) AS s
           FROM (SELECT number * 2 AS n FROM numbers(5))
           GROUP BY g)
    """, tables=tables).collect()[0]
    assert abs(r.a - 4.0) < 1e-9


def test_finalize_aggregation_of_avg_state(spark, tables):
    r = ch_sql(spark,
               "SELECT finalizeAggregation(initializeAggregation("
               "'avgState', 6)) AS v", tables=tables).collect()[0]
    assert r.v == 6.0
    r2 = ch_sql(spark,
                "SELECT finalizeAggregation(initializeAggregation("
                "'sumState', 7)) AS v", tables=tables).collect()[0]
    assert r2.v == 7


def test_sum_min_max_merge_unchanged(spark, tables):
    r = ch_sql(spark, """
        SELECT sumMerge(ss) AS s, minMerge(mn) AS lo, maxMerge(mx) AS hi
        FROM (SELECT number % 2 AS g, sumState(number) AS ss,
                     minState(number) AS mn, maxState(number) AS mx
              FROM numbers(10) GROUP BY g)
    """, tables=tables).collect()[0]
    assert (r.s, r.lo, r.hi) == (45, 0, 9)


# ---------------------------------------------------------- finding 2

def test_date_returning_plus_int_adds_days(spark, tables):
    r = ch_sql(spark, """
        SELECT toStartOfMonth(toDate('2024-05-17')) + 1 AS m,
               toMonday(toDate('2024-05-17')) + 7 AS w,
               toStartOfYear(toDate('2024-05-17')) - 1 AS y,
               today() + 1 - today() AS delta
    """, tables=tables).collect()[0]
    assert str(r.m) == "2024-05-02"
    assert str(r.w) == "2024-05-20"
    assert str(r.y) == "2023-12-31"
    assert r.delta in (1, "1") or str(r.delta).startswith("1")


def test_datetime_returning_plus_int_still_seconds(spark, tables):
    r = ch_sql(spark, """
        SELECT toDateTime('2024-05-17 00:00:00') + 90 AS t,
               toStartOfHour(toDateTime('2024-05-17 10:30:00')) + 60 AS h
    """, tables=tables).collect()[0]
    assert str(r.t).startswith("2024-05-17 00:01:30")
    assert str(r.h).startswith("2024-05-17 10:01:00")


# ---------------------------------------------------------- finding 3

def test_cyclic_mv_chain_raises(spark, tables):
    ch_sql(spark, "CREATE TABLE cyc_a (n Int64) ENGINE Memory",
           tables=tables)
    ch_sql(spark, "CREATE TABLE cyc_b (n Int64) ENGINE Memory",
           tables=tables)
    ch_sql(spark, "CREATE MATERIALIZED VIEW cyc_ab TO cyc_b AS "
                  "SELECT n + 1 AS n FROM cyc_a", tables=tables)
    ch_sql(spark, "CREATE MATERIALIZED VIEW cyc_ba TO cyc_a AS "
                  "SELECT n + 1 AS n FROM cyc_b", tables=tables)
    with pytest.raises(Exception, match="(?i)depth|cascade|recursi"):
        ch_sql(spark, "INSERT INTO cyc_a VALUES (1)", tables=tables)
    for t in ("cyc_ab", "cyc_ba", "cyc_a", "cyc_b"):
        try:
            ch_sql(spark, f"DROP TABLE {t}", tables=tables)
        except Exception:
            pass


def test_mv_push_failure_surfaces(spark, tables):
    ch_sql(spark, "CREATE TABLE mvsrc (n Int64) ENGINE Memory",
           tables=tables)
    ch_sql(spark, "CREATE TABLE mvdst (n Int64) ENGINE Memory",
           tables=tables)
    # strict mode (default): a bad select is rejected at CREATE
    # (reference THERE_IS_NO_COLUMN)
    with pytest.raises(Exception):
        ch_sql(spark, "CREATE MATERIALIZED VIEW mvbad TO mvdst AS "
                      "SELECT missing_col AS n FROM mvsrc",
               tables=tables)
    # lax mode: CREATE passes, the INSERT-time push failure surfaces
    ch_sql(spark, "SET allow_materialized_view_with_bad_select = 1",
           tables=tables, settings={})
    ch_sql(spark, "CREATE MATERIALIZED VIEW mvbad TO mvdst AS "
                  "SELECT missing_col AS n FROM mvsrc", tables=tables)
    with pytest.raises(Exception):
        ch_sql(spark, "INSERT INTO mvsrc VALUES (1)", tables=tables)
    ch_sql(spark, "SET allow_materialized_view_with_bad_select = 0",
           tables=tables, settings={})
    for t in ("mvbad", "mvsrc", "mvdst"):
        try:
            ch_sql(spark, f"DROP TABLE {t}", tables=tables)
        except Exception:
            pass


def test_mv_to_nonexistent_target_rejected(spark, tables):
    ch_sql(spark, "CREATE TABLE mvsrc2 (x Int64) ENGINE Memory",
           tables=tables)
    with pytest.raises(Exception, match="(?i)unknown_table|does not"):
        ch_sql(spark, "CREATE MATERIALIZED VIEW mvx TO no_such_tbl "
                      "AS SELECT x FROM mvsrc2", tables=tables)
    ch_sql(spark, "DROP TABLE mvsrc2", tables=tables)


def test_mv_cascade_still_works_two_levels(spark, tables):
    ch_sql(spark, "CREATE TABLE lvl0 (n Int64) ENGINE Memory",
           tables=tables)
    ch_sql(spark, "CREATE TABLE lvl1 (n Int64) ENGINE Memory",
           tables=tables)
    ch_sql(spark, "CREATE TABLE lvl2 (n Int64) ENGINE Memory",
           tables=tables)
    ch_sql(spark, "CREATE MATERIALIZED VIEW mv01 TO lvl1 AS "
                  "SELECT n * 10 AS n FROM lvl0", tables=tables)
    ch_sql(spark, "CREATE MATERIALIZED VIEW mv12 TO lvl2 AS "
                  "SELECT n + 1 AS n FROM lvl1", tables=tables)
    ch_sql(spark, "INSERT INTO lvl0 VALUES (4)", tables=tables)
    assert ch_sql(spark, "SELECT n FROM lvl2",
                  tables=tables).collect()[0].n == 41
    for t in ("mv01", "mv12", "lvl0", "lvl1", "lvl2"):
        try:
            ch_sql(spark, f"DROP TABLE {t}", tables=tables)
        except Exception:
            pass


# ---------------------------------------------------------- finding 4

def test_ordefault_string_default_is_empty_string(spark, tables):
    r = ch_sql(spark,
               "SELECT minOrDefaultIf(toString(number), number > 99) "
               "AS v FROM numbers(5)", tables=tables).collect()[0]
    assert r.v == ""


def test_ordefault_numeric_default_still_zero(spark, tables):
    r = ch_sql(spark,
               "SELECT maxOrDefaultIf(number, number > 99) AS v "
               "FROM numbers(5)", tables=tables).collect()[0]
    assert r.v == 0


def test_array_reduce_ordefault_string(spark, tables):
    r = ch_sql(spark,
               "SELECT arrayReduce('minOrDefault', array('b', 'a')) "
               "AS got, arrayReduce('maxOrDefault', "
               "array_remove(array('x'), 'x')) AS empty",
               tables=tables).collect()[0]
    assert r.got == "a"
    assert r.empty == ""


# ---------------------------------------------------------- finding 5

def test_tsv_escape_set_matches_write_any_escaped_string():
    assert _escape_top("a\bb\fc\0d") == "a\\bb\\fc\\0d"
    assert _escape_quoted("a\bb") == "'a\\bb'"
    assert _escape_quoted("\f\0") == "'\\f\\0'"
    # the original set is untouched
    assert _escape_top("a\tb\nc\\d'e") == "a\\tb\\nc\\\\d\\'e"
