"""Round-13 regressions: the round-12 ADVICE findings (collapsing
insert-order rank vs Spark's size-ordered file packing, USING-retry
scope, tsv map-carrier sniffing, inline aliases inside lambdas, SET
size-suffix gating) plus the round's verdict items."""

import shutil

import pytest

from pyspark.sql import functions as F

from clickhouse_core_spark.plans import ch_sql
from clickhouse_core_spark.sources import MergeTreeTable


@pytest.fixture()
def tmp_table_path(tmp_path):
    p = str(tmp_path / "tbl")
    yield p
    shutil.rmtree(p, ignore_errors=True)


def test_collapsing_insert_order_across_unequal_parts(spark, tmp_table_path):
    """ADVICE r12: monotonically_increasing_id alone ranks by Spark's
    size-descending file packing, not part chronology.  A BIG old part
    holding the stale +1 state and a SMALL new part holding the cancel
    + the fresh state must still surface the fresh state
    (CollapsingSortedTransform merges in stored part order)."""
    t = MergeTreeTable(spark, tmp_table_path, order_by=["k"],
                       engine="collapsing", sign_col="sign")
    # old part: large (padding rows force it to sort FIRST by size,
    # i.e. AFTER the new part under the buggy id-only rank)
    old = spark.createDataFrame(
        [(1, 1, "stale")] + [(k, 1, "pad") for k in range(100, 2100)],
        "k int, sign int, v string")
    t.insert(old.coalesce(1))
    # new part: tiny — cancels the stale state and writes the fresh one
    new = spark.createDataFrame(
        [(1, -1, "stale"), (1, 1, "fresh")], "k int, sign int, v string")
    t.insert(new.coalesce(1))
    rows = {r["k"]: r["v"] for r in
            t.read(final=True).filter(F.col("k") == 1).collect()}
    assert rows == {1: "fresh"}


def test_set_string_setting_keeps_size_lookalike_text(spark):
    """ADVICE r12: size suffixes ('10M') expand only for numeric
    settings; a string-valued setting whose text looks like a size
    must survive verbatim through system.settings."""
    t = {}
    ch_sql(spark, "SET additional_result_filter = '10M'", tables=t)
    r = ch_sql(spark, "SELECT value FROM system.settings WHERE "
                      "name = 'additional_result_filter'",
               tables=t).collect()
    assert [x["value"] for x in r] == ["10M"]


def test_set_numeric_setting_expands_suffix(spark):
    t = {}
    ch_sql(spark, "SET max_memory_usage = '10M'", tables=t)
    r = ch_sql(spark, "SELECT value FROM system.settings WHERE "
                      "name = 'max_memory_usage'", tables=t).collect()
    assert [x["value"] for x in r] == ["10000000"]


def test_inline_alias_inside_lambda_not_hoisted(spark):
    """ADVICE r12: (expr AS name) inside a lambda body references the
    lambda parameter and must NOT be hoisted into the wrapping
    subquery."""
    r = ch_sql(spark, "SELECT arrayMap(x -> (x * 2 AS y), [1, 2, 3]) "
                      "AS a", tables={}).first()
    assert list(r["a"]) == [2, 4, 6]


def test_array_of_key_value_structs_renders_as_tuples():
    """ADVICE r12: a genuine Array(Tuple(key, value)) is NOT the
    ordered-map carrier and renders as a tuple list, not {k:v}."""
    from pyspark.sql import Row
    from clickhouse_core_spark.sources.tsvrender import render_value
    v = [Row(key="a", value=1), Row(key="b", value=2)]
    out = render_value(v)
    assert out.startswith("["), out
    assert "('a',1)" in out.replace(" ", "")


def test_sibling_select_alias_inside_aggregate(spark):
    """A SELECT item's alias referenced inside a sibling aggregate
    (CH aliases are query-global — golden 01521_max_length_alias):
    Spark's lateral-column-alias refusal is retried by substituting
    the defining expression."""
    r = ch_sql(spark, "SELECT number % 2 AS dcount, "
                      "min(dcount) AS mindc FROM numbers(10) "
                      "GROUP BY dcount ORDER BY dcount",
               tables={}).collect()
    assert [(x["dcount"], x["mindc"]) for x in r] == [(0, 0), (1, 1)]


def test_sibling_select_alias_inside_window(spark):
    r = ch_sql(spark, "SELECT number AS n, max(n) OVER () AS mx "
                      "FROM numbers(3) ORDER BY n",
               tables={}).collect()
    assert [(x["n"], x["mx"]) for x in r] == [(0, 2), (1, 2), (2, 2)]


def test_retry_using_qualified_is_narrow_and_literal_safe():
    """ADVICE r12: the USING-qualified retry rewrites ONLY the
    alias.key the resolver reported, and never inside string
    literals."""
    from clickhouse_core_spark.plans.frontend import \
        _retry_using_qualified
    err = Exception(
        "[UNRESOLVED_COLUMN.WITH_SUGGESTION] `t1`.`x` cannot be "
        "resolved")
    sql = ("SELECT t1.x, 't1.x literal', t2.y "
           "FROM a AS t1 JOIN b AS t2 USING (x)")
    out = _retry_using_qualified(sql, err)
    assert out == ("SELECT `x`, 't1.x literal', t2.y "
                   "FROM a AS t1 JOIN b AS t2 USING (x)")
    # unrelated alias: no rewrite at all
    err2 = Exception("[UNRESOLVED_COLUMN] `zz`.`x` cannot be resolved")
    assert _retry_using_qualified(sql, err2) is None


def test_decimal256_clamp_keeps_integer_digits(spark):
    """Decimal(76, 45) carries at DECIMAL(38, 7) — integer digits
    survive the precision clamp (golden 02875: whole values must not
    overflow to NULL)."""
    t = {}
    ch_sql(spark, "CREATE TABLE r13d (b Nullable(Decimal(76, 45))) "
                  "ENGINE MergeTree ORDER BY tuple()", tables=t)
    ch_sql(spark, "INSERT INTO r13d VALUES (7367)", tables=t)
    r = ch_sql(spark, "SELECT b FROM r13d", tables=t).collect()
    assert r[0]["b"] is not None and int(r[0]["b"]) == 7367


def test_transform_null_in(spark):
    """transform_null_in=1: NULL is a comparable IN value (golden
    01507)."""
    t = {}
    ch_sql(spark, "SET transform_null_in = 1", tables=t)
    try:
        rows = []
        for q in ["SELECT NULL IN NULL AS r",
                  "SELECT 1 IN NULL AS r",
                  "SELECT 1 IN (1, NULL) AS r",
                  "SELECT (1, 2) IN (1, NULL) AS r",
                  "SELECT (1, NULL) IN (1, NULL) AS r"]:
            rows.append(ch_sql(spark, q, tables=t).first()["r"])
        assert [bool(x) for x in rows] == [True, False, True, False,
                                           True]
    finally:
        ch_sql(spark, "SET transform_null_in = 0", tables=t)


def test_bitmask_to_list_native_width(spark):
    """bitmaskToList over a negative literal uses the literal's CH
    type width: Int8 -1 → 1,2,4,8,16,32,64,-128 (golden 00839)."""
    r = ch_sql(spark, "SELECT bitmaskToList(-1) AS a, "
                      "bitmaskToList(-128) AS b", tables={}).first()
    assert r["a"] == "1,2,4,8,16,32,64,-128"
    assert r["b"] == "-128"


def test_json_subcolumn_tuple_compare(spark):
    """obj.k1 = ('foo', 'baz') over an Object('json') string carrier
    compares the subobject's values in sorted-key order (golden
    02887)."""
    t = {}
    ch_sql(spark, "CREATE TABLE r13o (a UInt64, obj "
                  "Object(Nullable('json'))) ENGINE MergeTree "
                  "ORDER BY a", tables=t)
    ch_sql(spark, 'INSERT INTO r13o VALUES '
                  '(1, \'{"k1": {"k2": "foo"}, "k3": 5}\'), '
                  '(3, \'{"k1": {"k2": "foo", "k4": "baz"}}\')',
           tables=t)
    ch_sql(spark, "ALTER TABLE r13o DELETE WHERE "
                  "obj.k1 = ('foo', 'baz')", tables=t)
    r = ch_sql(spark, "SELECT toInt64(a) AS a FROM r13o", tables=t) \
        .collect()
    assert [x["a"] for x in r] == [1]


def test_tuple_to_name_value_pairs_json_carrier(spark):
    """tupleToNameValuePairs over an Object('json') column expands the
    sorted union of top-level paths (golden 02887 second table)."""
    t = {}
    ch_sql(spark, "CREATE TABLE r13n (a UInt64, obj "
                  "Object(Nullable('json'))) ENGINE MergeTree "
                  "ORDER BY a", tables=t)
    ch_sql(spark, 'INSERT INTO r13n VALUES (1, \'{"k1": 1}\'), '
                  '(3, \'{"k3": 1}\')', tables=t)
    r = ch_sql(spark, "SELECT toInt64(a) AS a, arrayFilter(x -> "
                      "not isNull(x.2), tupleToNameValuePairs(obj)) "
                      "AS p FROM r13n ORDER BY a", tables=t).collect()
    assert [(x["a"], [(e[0], e[1]) for e in x["p"]]) for x in r] == \
        [(1, [("k1", 1)]), (3, [("k3", 1)])]


def test_jsonallpathswithtypes_renders_sorted_map(spark):
    """The ordered-map carrier (sentinel __ch_k/__ch_v fields) still
    renders CH Map text form end-to-end (golden 03270)."""
    from clickhouse_core_spark.sources.tsvrender import format_tsv
    df = ch_sql(spark, "SELECT JSONAllPathsWithTypes("
                       "'{\"b\": 1, \"a\": \"x\"}'::JSON) AS m",
                tables={})
    out = format_tsv(df)
    assert out.strip().startswith("{"), out
    assert out.index("'a'") < out.index("'b'")


def test_array_join_select_alias(spark):
    """ARRAY JOIN over a SELECT alias of a column: the element takes
    the alias name and the projection shows the element (golden
    02374)."""
    t = {}
    ch_sql(spark, "CREATE TABLE r13aj (id UInt64, v String, arr "
                  "Array(UInt64)) ENGINE MergeTree ORDER BY tuple()",
           tables=t)
    ch_sql(spark, "INSERT INTO r13aj VALUES (0, 'V', [1, 2, 3])",
           tables=t)
    r = ch_sql(spark, "SELECT toInt64(id) AS id, v, arr AS al "
                      "FROM r13aj ARRAY JOIN al ORDER BY al",
               tables=t).collect()
    assert [(x["id"], x["v"], x["al"]) for x in r] == \
        [(0, "V", 1), (0, "V", 2), (0, "V", 3)]
    # `ARRAY JOIN sel_alias AS elem`: the alias keeps naming the ARRAY
    r2 = ch_sql(spark, "SELECT v, arr AS al, el FROM r13aj "
                       "ARRAY JOIN al AS el ORDER BY el",
                tables=t).collect()
    assert [list(x["al"]) for x in r2] == [[1, 2, 3]] * 3
    assert [x["el"] for x in r2] == [1, 2, 3]


def test_array_join_qualified_element(spark):
    """A table-qualified reference to an implicitly ARRAY-JOINed
    column resolves to the ELEMENT (golden 02374
    test_table.value_array → 1..3)."""
    t = {}
    ch_sql(spark, "CREATE TABLE r13aq (id UInt64, arr Array(UInt64)) "
                  "ENGINE MergeTree ORDER BY tuple()", tables=t)
    ch_sql(spark, "INSERT INTO r13aq VALUES (0, [1, 2, 3])", tables=t)
    r = ch_sql(spark, "SELECT r13aq.arr AS e FROM r13aq "
                      "ARRAY JOIN arr ORDER BY e", tables=t).collect()
    assert [x["e"] for x in r] == [1, 2, 3]


def test_array_join_after_join(spark):
    """ARRAY JOIN over a joined subquery's column (golden 03044)."""
    r = ch_sql(spark, "select 1 AS one from (select 1 x) l join "
                      "(select 1 y, [1] a) r on l.x = r.y "
                      "array join r.a", tables={}).collect()
    assert [x["one"] for x in r] == [1]


def test_any_left_join_on_form(spark):
    """ANY LEFT JOIN ... ON dedupes the right side per join key
    (golden 02302)."""
    r = ch_sql(spark, """
        SELECT count() AS c FROM (SELECT number AS l FROM numbers(3))
        ANY LEFT JOIN (SELECT number % 2 AS r FROM numbers(4)) AS s2
        ON l = r""", tables={}).first()
    assert r["c"] == 3


def test_with_fill_expression_key(spark):
    """WITH FILL over an expression sort key (-x) fills the matching
    OUTPUT column, originals interleave in generation order (golden
    02019)."""
    rows = ch_sql(spark, """
        SELECT x, -x, y FROM (SELECT 5 AS x, 'Hello' AS y)
        ORDER BY x ASC WITH FILL FROM 4 TO 6,
                 y ASC, -x ASC WITH FILL FROM -7 TO -4
    """, tables={}).collect()
    flat = [tuple(r) for r in rows]
    assert (5, -5, "Hello") in flat
    # the x=5 group starts its inner fill at FROM (-7)
    g5 = [t for t in flat if t[0] == 5]
    assert g5[0][1] == -7
    # the real row sits in generation order, not displaced to the end
    assert g5[-1][1] == -5 or g5[-1][1] > -5


def test_generate_random_decimal_short(spark):
    from clickhouse_core_spark.sources.formats import generate_random
    df = generate_random(spark, "a DECIMAL(10,2), b SMALLINT", 5)
    rows = df.collect()
    assert len(rows) == 5
    assert all(r["a"] is not None and r["b"] is not None
               for r in rows)


def test_versioned_collapsing_unmatched_rows_survive(spark):
    """VersionedCollapsing FINAL keeps |pos-neg| copies per
    (key, version) — unmatched same-sign rows all survive (golden
    00564: two unmatched -1 rows both emit)."""
    from clickhouse_core_spark.operators import (
        versioned_collapsing_final)
    df = spark.createDataFrame(
        [(1, 0, -1, "a"), (1, 0, -1, "a"), (2, 0, 1, "b"),
         (2, 0, 1, "b"), (3, 0, 1, "c"), (3, 0, -1, "c")],
        "k int, ver int, sign int, v string")
    out = versioned_collapsing_final(df, ["k"], sign="sign",
                                     version="ver").collect()
    rows = sorted((r.k, r.sign) for r in out)
    assert rows == [(1, -1), (1, -1), (2, 1), (2, 1)]


def test_old_style_merge_tree_engine_args(spark):
    """Deprecated engine syntax (date, (pk), granularity, ...) parses:
    the pk tuple becomes the sort key and the tail maps to the
    engine-specific args (golden 00564)."""
    t = {}
    ch_sql(spark, "create table r13old (date Date, value String, "
                  "version UInt64, sign Int8) engine = "
                  "VersionedCollapsingMergeTree(date, (date, value), "
                  "8192, sign, version)", tables=t)
    ch_sql(spark, "insert into r13old values ('2018-01-31', 'a', 0, 1)"
                  ", ('2018-01-31', 'a', 0, -1), "
                  "('2018-01-31', 'b', 0, 1)", tables=t)
    r = ch_sql(spark, "select value from r13old final", tables=t) \
        .collect()
    assert [x["value"] for x in r] == ["b"]


def test_insert_after_lightweight_delete(spark):
    """INSERT after DELETE FROM must keep the table readable — the
    delete-mask anti-join resolves _metadata per part, before the
    multi-part union (golden 02864_statistics_bug_69589)."""
    t = {}
    ch_sql(spark, "CREATE TABLE r13lw (c Nullable(Int)) "
                  "ENGINE = MergeTree() ORDER BY tuple()", tables=t)
    ch_sql(spark, "INSERT INTO r13lw (c) VALUES (1)", tables=t)
    ch_sql(spark, "DELETE FROM r13lw WHERE TRUE", tables=t)
    ch_sql(spark, "INSERT INTO r13lw (c) VALUES (2)", tables=t)
    r = ch_sql(spark, "SELECT c FROM r13lw", tables=t).collect()
    assert [x["c"] for x in r] == [2]


def test_statistics_ddl_and_show_create(spark):
    """Column STATISTICS declarations validate, ALTER mutates them,
    SHOW CREATE renders canonical kind order + db-qualified name
    (golden 02864)."""
    from clickhouse_core_spark.plans.frontend import SESSION_SETTINGS
    SESSION_SETTINGS["allow_experimental_statistics"] = "1"
    try:
        t = {}
        ch_sql(spark, "CREATE TABLE r13st (a Int64 "
                      "STATISTICS(uniq, tdigest), s String) "
                      "Engine = MergeTree() ORDER BY tuple()",
               tables=t)
        ch_sql(spark, "ALTER TABLE r13st ADD STATISTICS a "
                      "TYPE countmin", tables=t)
        out = ch_sql(spark, "SHOW CREATE TABLE r13st",
                     tables=t).first()[0]
        assert "default.r13st" in out
        assert "STATISTICS(tdigest, uniq, countmin)" in out
        assert "SETTINGS index_granularity = 8192" in out
        ch_sql(spark, "ALTER TABLE r13st DROP STATISTICS a", tables=t)
        out2 = ch_sql(spark, "SHOW CREATE TABLE r13st",
                      tables=t).first()[0]
        assert "STATISTICS" not in out2
        # illegal: tdigest on String
        with pytest.raises(Exception):
            ch_sql(spark, "ALTER TABLE r13st ADD STATISTICS s "
                          "TYPE tdigest", tables=t)
    finally:
        SESSION_SETTINGS.pop("allow_experimental_statistics", None)


def test_prometheus_output_format():
    """FORMAT Prometheus text rendering (golden 02267): HELP/TYPE
    headers, histogram bucket sort + _bucket/_sum/_count suffixes,
    +Inf mirror, sorted quoted labels."""
    from clickhouse_core_spark.sources.tsvrender import (
        format_prometheus)
    cols = ["name", "type", "help", "labels", "value", "timestamp"]
    rows = [
        ("h", "histogram", "lat", {"le": "0.5"}, 10, 0.0),
        ("h", "histogram", "", {"le": "+Inf"}, 12, 0.0),
        ("h", "histogram", "", {"sum": ""}, 5.5, 0.0),
        ("m", "counter", "hits", {"a": "x", "b": "y"}, 3,
         1395066363000.0),
    ]
    out = format_prometheus(rows, cols)
    lines = out.split("\n")
    assert "# HELP h lat" in lines
    assert "# TYPE h histogram" in lines
    assert 'h_bucket{le="0.5"} 10' in lines
    assert 'h_bucket{le="+Inf"} 12' in lines
    assert "h_sum 5.5" in lines
    assert "h_count 12" in lines
    assert 'm{a="x",b="y"} 3 1395066363000' in lines


def test_timestamp_number_compare_retry(spark):
    """DateTime compared with a number coerces through the epoch
    (golden 02864_statistics_predicates `WHERE dt = 7`)."""
    t = {}
    ch_sql(spark, "CREATE TABLE r13ts (dt DateTime) "
                  "ENGINE MergeTree ORDER BY tuple()", tables=t)
    ch_sql(spark, "INSERT INTO r13ts VALUES (7)", tables=t)
    r = ch_sql(spark, "SELECT count(*) AS c FROM r13ts WHERE dt = 7",
               tables=t).first()
    assert r["c"] == 1
