"""Display renderers for golden-output verification: FORMAT CSV /
CSVWithNames / Values / JSONEachRow / TSVWithNames text serializations
(reference src/Processors/Formats/Impl/CSVRowOutputFormat.cpp,
ValuesRowOutputFormat.cpp, JSONEachRowRowOutputFormat.cpp and the
per-type serializeTextCSV/serializeTextJSON rules), plus the WITH
TOTALS separate-block rendering (TotalsHavingTransform emits the
grand total as its own blank-line-delimited block)."""

import datetime
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_core_spark.sources.tsvrender import (  # noqa: E402
    _csv_field, format_csv_rows, format_values_rows,
    format_json_each_row, ch_default_value, _json_value)
from clickhouse_core_spark.plans.frontend import (  # noqa: E402
    ch_sql, RENDER_TOTALS_MARKER)


def test_csv_field_rules():
    assert _csv_field(None) == "\\N"
    assert _csv_field(123) == "123"
    assert _csv_field('Hello, "World"') == '"Hello, ""World"""'
    assert _csv_field("Newline\nhere") == '"Newline\nhere"'
    assert _csv_field([1, 2, 3]) == '"[1,2,3]"'
    assert _csv_field(["abc", "def"]) == '"[\'abc\',\'def\']"'
    assert _csv_field(datetime.date(2000, 1, 1)) == '"2000-01-01"'
    assert (_csv_field(datetime.datetime(2000, 1, 1))
            == '"2000-01-01 00:00:00"')


def test_csv_with_names_header_quoted():
    out = format_csv_rows([(1, "a")], with_names=True,
                          columns=["x", "y"])
    assert out == '"x","y"\n1,"a"\n'


def test_values_rows():
    assert format_values_rows([(0, 1), (1, 1)]) == "(0,1),(1,1)\n"
    assert format_values_rows([("a'b", None)]) == "('a\\'b',NULL)\n"


def test_json_each_row_escapes_and_quoting():
    out = format_json_each_row([("a b", 7)], columns=["x", "y"])
    assert out == '{"x":"a\\u2028b","y":7}\n'
    # only the EXACT 64-bit carriers quote (bigint doubles as the
    # UInt32 carrier — golden 01825_type_json_14 renders it bare)
    import decimal
    assert _json_value(decimal.Decimal(7), "decimal(20,0)") == '"7"'
    assert _json_value(7, "bigint") == "7"
    assert _json_value(7, "int") == "7"
    assert _json_value(float("nan")) == "null"


def test_ch_default_values():
    assert ch_default_value("bigint") == 0
    assert ch_default_value("string") == ""
    assert ch_default_value("date") == datetime.date(1970, 1, 1)
    assert ch_default_value("array<int>") == []


def test_totals_marker_mode(spark):
    RENDER_TOTALS_MARKER[0] = True
    try:
        df = ch_sql(spark,
                    "SELECT number % 2 AS g, count() AS c "
                    "FROM numbers(10) GROUP BY g WITH TOTALS",
                    tables={})
        assert "__ch_totals__" in df.columns
        rows = df.collect()
        tot = [r for r in rows if r["__ch_totals__"]]
        assert len(tot) == 1 and tot[0]["c"] == 10 \
            and tot[0]["g"] is None
        assert sorted(r["c"] for r in rows
                      if not r["__ch_totals__"]) == [5, 5]
    finally:
        RENDER_TOTALS_MARKER[0] = False
    # marker OFF: schema unchanged (the oracle path contract)
    df2 = ch_sql(spark,
                 "SELECT number % 2 AS g, count() AS c "
                 "FROM numbers(10) GROUP BY g WITH TOTALS", tables={})
    assert df2.columns == ["g", "c"]
