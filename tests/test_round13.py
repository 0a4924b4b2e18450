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
