"""Round-12 regressions: stale-view mutations, AggregateFunction
state columns, USING-qualified references (golden 01504_rocksdb
family) and the round's verdict/advice items."""

import pytest

from clickhouse_core_spark.plans import ch_sql


def test_truncate_then_select(spark):
    """TRUNCATE drops every part; the registered view must re-point
    instead of dying FAILED_READ_FILE on the dropped listing
    (reference InterpreterDropQuery.cpp truncate keeps the table
    readable as empty — golden 01504_rocksdb)."""
    t = {}
    ch_sql(spark, "CREATE TABLE r12t_a (k UInt32, v String) "
                  "ENGINE MergeTree ORDER BY k", tables=t)
    ch_sql(spark, "INSERT INTO r12t_a SELECT number, toString(number) "
                  "FROM numbers(50)", tables=t)
    ch_sql(spark, "TRUNCATE TABLE r12t_a", tables=t)
    assert ch_sql(spark, "SELECT count() AS c FROM r12t_a",
                  tables=t).first()["c"] == 0
    # and the table stays insertable/readable afterwards
    ch_sql(spark, "INSERT INTO r12t_a SELECT number, toString(number) "
                  "FROM numbers(3)", tables=t)
    assert ch_sql(spark, "SELECT count() AS c FROM r12t_a",
                  tables=t).first()["c"] == 3


def test_aggfunction_groupbitmap_column(spark):
    """AggregateFunction(groupBitmap, T) DDL maps to the ARRAY state
    carrier so inserted bitmapBuild states survive the insert cast and
    groupBitmapMerge folds them (AggregateFunctionGroupBitmap.cpp)."""
    t = {}
    ch_sql(spark, "CREATE TABLE r12t_bm (k UInt32, "
                  "bm AggregateFunction(groupBitmap, UInt64)) "
                  "ENGINE MergeTree ORDER BY k", tables=t)
    ch_sql(spark, "INSERT INTO r12t_bm SELECT number % 5 AS k, "
                  "bitmapBuild(groupArray(number)) FROM numbers(64) "
                  "GROUP BY k", tables=t)
    assert ch_sql(spark, "SELECT groupBitmapMerge(bm) AS c "
                         "FROM r12t_bm", tables=t).first()["c"] == 64


def test_simple_aggfunction_ddl_nested_type(spark):
    """SimpleAggregateFunction(f, T) stores the nested type itself
    (DataTypeCustomSimpleAggregateFunction.cpp)."""
    t = {}
    ch_sql(spark, "CREATE TABLE r12t_sa (k UInt32, "
                  "s SimpleAggregateFunction(sum, Int64)) "
                  "ENGINE MergeTree ORDER BY k", tables=t)
    ch_sql(spark, "INSERT INTO r12t_sa VALUES (1, 10), (1, 20)",
           tables=t)
    assert ch_sql(spark, "SELECT sum(s) AS s FROM r12t_sa",
                  tables=t).first()["s"] == 30


def test_clear_column_refills_default(spark):
    """CLEAR COLUMN keeps the column, refilling the partition with the
    type default (MutationsInterpreter.h:44; golden 01114)."""
    t = {}
    ch_sql(spark, "CREATE TABLE r12t_cc (x UInt32, y UInt32) "
                  "ENGINE MergeTree ORDER BY x PARTITION BY x",
           tables=t)
    ch_sql(spark, "INSERT INTO r12t_cc VALUES (1, 1), (2, 3)",
           tables=t)
    ch_sql(spark, "ALTER TABLE r12t_cc CLEAR COLUMN y IN PARTITION 1",
           tables=t)
    rows = [tuple(r) for r in
            ch_sql(spark, "SELECT * FROM r12t_cc ORDER BY x",
                   tables=t).collect()]
    assert rows == [(1, 0), (2, 3)]
    # clearing the other partition zeroes the rest
    ch_sql(spark, "ALTER TABLE r12t_cc CLEAR COLUMN y IN PARTITION 2",
           tables=t)
    rows = [tuple(r) for r in
            ch_sql(spark, "SELECT * FROM r12t_cc ORDER BY x",
                   tables=t).collect()]
    assert rows == [(1, 0), (2, 0)]


def test_replicated_pair_shares_storage(spark):
    """Two Replicated tables on the same zookeeper path are one
    storage under two names (golden 00446): ALTERs and INSERTs through
    one replica are visible through the other."""
    t = {}
    ch_sql(spark, "CREATE TABLE r12t_r1 (d Date, i Int64) ENGINE = "
                  "ReplicatedMergeTree('/ch/r12t/rep', '1') ORDER BY d "
                  "PARTITION BY toYYYYMM(d)", tables=t)
    ch_sql(spark, "CREATE TABLE r12t_r2 (d Date, i Int64) ENGINE = "
                  "ReplicatedMergeTree('/ch/r12t/rep', '2') ORDER BY d "
                  "PARTITION BY toYYYYMM(d)", tables=t)
    ch_sql(spark, "INSERT INTO r12t_r1 (d) VALUES ('2000-01-01'), "
                  "('2000-02-01')", tables=t)
    ch_sql(spark, "ALTER TABLE r12t_r1 ADD COLUMN s String", tables=t)
    ch_sql(spark, "INSERT INTO r12t_r1 VALUES ('2000-01-01', 1, 'a')",
           tables=t)
    rows = ch_sql(spark, "SELECT d, i, s FROM r12t_r2 ORDER BY d, i, s",
                  tables=t).collect()
    assert len(rows) == 3
    assert {r["s"] for r in rows} == {"", "a"}


def test_tounixtimestamp_tz_datetime_arg(spark):
    """toUnixTimestamp(DateTime, tz): the tz applies to STRING parsing
    only — DateTime epochs are tz-independent (FunctionsConversion.cpp;
    r11 ADVICE)."""
    r = ch_sql(spark, "SELECT toUnixTimestamp(toDateTime(1568650812), "
                      "'Asia/Istanbul') AS a", tables={}).first()
    assert r["a"] == 1568650812


def test_random_fixed_string_byte_length(spark):
    """octet_length(randomFixedString(n)) = n — single-byte code
    points (r11 ADVICE; golden 03457 byte-length contract)."""
    r = ch_sql(spark, "SELECT length(randomFixedString(64)) AS n",
               tables={}).first()
    assert r["n"] == 64


def test_dt64_scale_hints_scoped_per_statement(spark):
    """A DateTime64(1) literal in one statement must not change how a
    LATER statement renders the same wall+microsecond value (r11
    ADVICE: the hint registry leaked across queries)."""
    from clickhouse_core_spark.sources.tsvrender import DT64_SCALE_HINTS
    ch_sql(spark, "SELECT toDateTime64('2020-01-01 00:00:00.5', 1) "
                  "AS x", tables={}).collect()
    ch_sql(spark, "SELECT 1", tables={}).collect()
    assert not DT64_SCALE_HINTS


def test_order_by_nulls_direction(spark):
    """CH sorts NULLs LAST on ASC and FIRST on DESC (SortDescription
    default nulls_direction); Spark defaults are the opposite."""
    rows = ch_sql(spark, """
        SELECT x FROM (SELECT if(number = 1, NULL, number) AS x
                       FROM numbers(3)) ORDER BY x""",
                  tables={}).collect()
    assert [r["x"] for r in rows] == [0, 2, None]
    rows = ch_sql(spark, """
        SELECT x FROM (SELECT if(number = 1, NULL, number) AS x
                       FROM numbers(3)) ORDER BY x DESC""",
                  tables={}).collect()
    assert [r["x"] for r in rows] == [None, 2, 0]


def test_iceberg_truncate_decimal_and_string(spark):
    """Iceberg truncate on decimals keeps the value's scale
    (spec: d − (d mod scaled_W); golden 03376) and strings truncate at
    codepoints."""
    r = ch_sql(spark, "SELECT icebergTruncate(10, "
                      "toDecimal64('12.34', 2)) AS d, "
                      "icebergTruncate(5, 'abcdefg') AS s",
               tables={}).first()
    assert str(r["d"]) == "12.30" and r["s"] == "abcde"


def test_collapsing_unbalanced_run_keeps_state(spark):
    """CollapsingMergeTree merge of an equal-count run whose last row
    is +1 keeps BOTH the first -1 and the last +1
    (CollapsingSortedTransform.h; golden 01764)."""
    t = {}
    ch_sql(spark, "CREATE TABLE r12t_coll (key UInt64, v UInt64, "
                  "Sign Int8) ENGINE = CollapsingMergeTree(Sign) "
                  "ORDER BY key", tables=t)
    ch_sql(spark, "INSERT INTO r12t_coll SELECT "
                  "if(number == 128, 127, number), 1, "
                  "if(number == 128, 1, -1) FROM numbers(129)",
           tables=t)
    ch_sql(spark, "OPTIMIZE TABLE r12t_coll FINAL", tables=t)
    r = ch_sql(spark, "SELECT sum(Sign) AS s, count() AS c "
                      "FROM r12t_coll", tables=t).first()
    assert (r["s"], r["c"]) == (-127, 129)


def test_mv_keeps_own_columns_after_target_alter(spark):
    """The MV view keeps the SELECT's column list even after the TO
    target gains columns (StorageMaterializedView header; golden
    01069)."""
    t = {}
    ch_sql(spark, "CREATE TABLE r12t_mvs (a UInt64) ENGINE = "
                  "MergeTree ORDER BY tuple()", tables=t)
    ch_sql(spark, "CREATE TABLE r12t_mvt (a UInt64) ENGINE = "
                  "MergeTree ORDER BY tuple()", tables=t)
    ch_sql(spark, "CREATE MATERIALIZED VIEW r12t_mv TO r12t_mvt AS "
                  "SELECT * FROM r12t_mvs", tables=t)
    ch_sql(spark, "INSERT INTO r12t_mvs VALUES (1)", tables=t)
    ch_sql(spark, "ALTER TABLE r12t_mvt ADD COLUMN b UInt8", tables=t)
    ch_sql(spark, "INSERT INTO r12t_mvs VALUES (2)", tables=t)
    mv = ch_sql(spark, "SELECT * FROM r12t_mv ORDER BY a", tables=t)
    assert mv.columns == ["a"]
    tgt = ch_sql(spark, "SELECT * FROM r12t_mvt ORDER BY a", tables=t)
    assert tgt.columns == ["a", "b"]
    assert [tuple(r) for r in tgt.collect()] == [(1, 0), (2, 0)]


def test_drop_column_referenced_by_mv_rejected(spark):
    """DROP COLUMN on a column an MV reads raises
    (ALTER_OF_COLUMN_IS_FORBIDDEN; golden 01851)."""
    t = {}
    ch_sql(spark, "CREATE TABLE r12t_mvp (n1 Int8, n2 Int8, n3 Int8) "
                  "ENGINE = MergeTree ORDER BY n1", tables=t)
    ch_sql(spark, "CREATE MATERIALIZED VIEW r12t_mvpv ENGINE = Memory "
                  "AS SELECT n2 FROM r12t_mvp", tables=t)
    with pytest.raises(Exception):
        ch_sql(spark, "ALTER TABLE r12t_mvp DROP COLUMN n2", tables=t)
    ch_sql(spark, "ALTER TABLE r12t_mvp DROP COLUMN n3", tables=t)


def test_dt64_column_scale_truncation(spark):
    """DateTime64(p) columns truncate inserted values to their scale
    and render exactly p digits (golden 02997)."""
    from clickhouse_core_spark.sources.tsvrender import render_rows
    t = {}
    ch_sql(spark, "CREATE TABLE r12t_dt0 (a DateTime64(0)) "
                  "ENGINE = MergeTree ORDER BY a", tables=t)
    ch_sql(spark, "INSERT INTO r12t_dt0 VALUES "
                  "(toDateTime64('2023-01-01 01:01:01.123456789', 1))",
           tables=t)
    df = ch_sql(spark, "SELECT * FROM r12t_dt0", tables=t)
    assert render_rows(df.collect(),
                       schema=df.schema) == "2023-01-01 01:01:01"


def test_lpnorm_constant_function_p(spark):
    """LpNorm with p = pi(): constant-function p folds to a literal
    (vectorFunctions.cpp const-p requirement)."""
    r = ch_sql(spark, "SELECT round(LpNorm((1.5, 2.5, 4), pi()), 4) "
                      "AS a", tables={}).first()
    assert abs(r["a"] - 4.3209) < 1e-3


def test_using_qualified_key_refs(spark):
    """``A.a = B.a ... USING a``: qualified references to USING keys
    resolve (QueryAnalyzer keeps per-side key columns visible; Spark
    hides the right key — error-triggered rewrite to the coalesced
    bare key, golden 01504_rocksdb)."""
    t = {}
    row = ch_sql(spark, """
        SELECT A.a = B.a AS ea, A.b = B.b AS eb FROM
          (SELECT 0 AS a, sum(number) AS b FROM numbers(10)) A
          ANY LEFT JOIN
          (SELECT 0 AS a, sum(number) AS b FROM numbers(10)) B
        USING a ORDER BY a""", tables=t).first()
    assert row["ea"] is True and row["eb"] is True
