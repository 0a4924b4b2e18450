"""Gate against driver-fixture type divergence.

Round-2 lesson: pytest fixtures that build in-session DataFrames get
TIMESTAMP (LTZ) columns, while the driver's parquet fixtures carry
timestamp[us]-no-tz → TIMESTAMP_NTZ.  Five entries crashed only under
the driver.  This module analyzes EVERY registered entry against the
real /root/testdata parquet so a type mismatch fails locally:

- building the DataFrame forces Catalyst analysis (AnalysisException on
  e.g. unix_micros(TIMESTAMP_NTZ)) without running a job;
- any oracle-graded entry whose output schema contains array/map
  columns is flagged — the driver's pandas-factorize hash comparator
  cannot hash numpy arrays (round-2 agg_sum_map / agg_topk_array).
"""

import os
import sys

import pytest
from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Entries that eagerly run driver-side iteration / persist on build;
# analysis still covers them via the cheap first iteration at sf0.001.
_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


def test_entry_names_are_unique():
    """A reused @q name silently shadows the earlier entry (dict
    overwrite) — two r3 entries were lost this way before this gate."""
    import re
    text = open(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__spark_entry__.py")).read()
    names = re.findall(r'@q\("([a-z0-9_]+)"', text)
    dups = sorted({n for n in names if names.count(n) > 1})
    assert not dups, f"duplicate entry names shadow earlier entries: {dups}"


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_entry_analyzes_on_driver_parquet(spark, name):
    df = _QUERIES[name](spark, SF_DIR)
    schema = df.schema  # forces analysis
    if name in _ORACLES:
        bad = [f.name for f in schema.fields
               if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))]
        assert not bad, (
            f"{name} emits non-scalar columns {bad}; the driver's hash "
            f"comparator cannot grade arrays/maps — explode to scalar rows")
        # r3 lesson (fn_decimal_arithmetic): the driver's hasher is
        # sensitive to decimal scale RENDERING, so exact-equal decimals
        # can hash-mismatch across engines.  Entries must carry results
        # as DOUBLE/STRING (decimal math inside the query stays exact).
        dec = [f.name for f in schema.fields
               if isinstance(f.dataType, T.DecimalType)]
        assert not dec, (
            f"{name} emits DECIMAL columns {dec}; cast to DOUBLE or "
            f"STRING on both sides — the driver hasher is representation-"
            f"sensitive (see fn_decimal_arithmetic, r3)")


# r4 lesson (fn_math / kql_filter_summarize): a DOUBLE output column fed
# by a transcendental is representation-fragile — two correct libm/round
# implementations can emit doubles 1 ULP apart, and the driver's hasher
# compares exact values.  Entries must carry such columns as fixed-format
# strings (format_string('%.8f', …) / printf('%.8f', …)) on both sides.
_TRANSCENDENTAL = (
    "ln", "log", "log10", "log2", "log1p", "exp", "expm1", "sqrt", "cbrt",
    "pow", "power", "sin", "cos", "tan", "asin", "acos", "atan", "atan2",
    "sinh", "cosh", "tanh", "asinh", "acosh", "atanh", "radians", "degrees",
    "corr", "stddev", "stddev_samp", "stddev_pop", "skewness", "kurtosis",
)
_TRANS_RE = __import__("re").compile(
    r"(?i)\b(" + "|".join(_TRANSCENDENTAL) + r")\s*\(")


def _split_select_items(sql):
    """Top-level SELECT-list items of the FIRST select in an oracle SQL
    string (paren-aware comma split, stops at the first top-level FROM;
    good enough for the hand-written single-statement oracles)."""
    import re
    m = re.search(r"(?is)\bselect\b(?:\s+distinct\b)?", sql)
    if not m:
        return []
    body = sql[m.end():]
    depth = 0
    items, start = [], 0
    i, n = 0, len(body)
    while i < n:
        ch = body[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            if ch == ",":
                items.append(body[start:i])
                start = i + 1
            elif (body[i:i + 4].lower() == "from"
                  and (i == 0 or not body[i - 1].isalnum()
                       and body[i - 1] != "_")
                  and (i + 4 >= n or not body[i + 4].isalnum()
                       and body[i + 4] != "_")):
                items.append(body[start:i])
                return [s.strip() for s in items if s.strip()]
        i += 1
    items.append(body[start:])
    return [s.strip() for s in items if s.strip()]


def _alias_of(item):
    import re
    m = re.search(r"(?is)\bas\s+([A-Za-z_][A-Za-z0-9_]*)\s*$", item)
    if m:
        return m.group(1).lower()
    m = re.search(r"([A-Za-z_][A-Za-z0-9_]*)\s*$", item)
    return m.group(1).lower() if m else None


@pytest.mark.parametrize("name", sorted(n for n in _QUERIES if n in _ORACLES))
def test_no_raw_transcendental_double_carriers(spark, name):
    """Fail any oracle-graded entry whose output schema has a raw DOUBLE
    (or FLOAT) column whose oracle expression contains a transcendental —
    the latent class behind every r3/r4 hash-red row.  Fix: format_string
    carrier in Spark + printf in the oracle, same precision."""
    sql = _ORACLES[name]
    hits = {}
    for item in _split_select_items(sql):
        if _TRANS_RE.search(item):
            a = _alias_of(item)
            if a:
                hits[a] = item
    if not hits:
        return
    schema = _QUERIES[name](spark, SF_DIR).schema
    bad = [f.name for f in schema.fields
           if f.name.lower() in hits
           and isinstance(f.dataType, (T.DoubleType, T.FloatType))]
    assert not bad, (
        f"{name}: DOUBLE columns {bad} are fed by transcendental "
        f"expressions ({[hits[b.lower()][:60] for b in bad]}); carry them "
        f"as fixed-format strings (format_string/printf '%.8f') on both "
        f"sides — raw transcendental doubles are ULP-fragile under the "
        f"driver's exact hasher (fn_math, r4)")


SF_DIR_MED = os.environ.get("SPARK_GRAFT_TEST_SF_DIR_MED",
                            "/root/testdata/sf0.01")

_FN_ENTRIES = sorted(n for n in _QUERIES if n.startswith("fn_"))


@pytest.mark.parametrize("name", _FN_ENTRIES)
def test_fn_entry_executes_on_fixture_edges_under_ansi(spark, name):
    """r3 lesson generalized (fn_ch_conditional_math REMAINDER_BY_ZERO):
    the sf0.01 fixture carries edge rows — o_orderkey=0, empty strings,
    NULLs — and the driver's session runs with ANSI enabled.  Execute
    every fn_* entry's full expression set against the real fixture
    under ANSI so a session-sensitive expression fails here, not in the
    driver."""
    if not os.path.isdir(SF_DIR_MED):
        pytest.skip("sf0.01 fixture not present")
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        rows = _QUERIES[name](spark, SF_DIR_MED).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)
    assert rows  # fixture-backed entries always produce rows


def test_no_hugeint_oracle_output_columns():
    """r6 lesson (ch_sql_agg_aliases): DuckDB types integer sum() as
    HUGEINT (int128); the driver's pandas conversion renders HUGEINT
    differently from Spark's BIGINT (object/float64 carrier), so an
    uncast integer aggregate in an oracle is a latent hash-red even
    when the values are identical.  Plan every oracle with DuckDB and
    fail on any HUGEINT/UHUGEINT output column — fix is
    CAST(... AS BIGINT) on the oracle side."""
    import duckdb
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    bad = {}
    for name, sql in _ORACLES.items():
        try:
            rel = con.sql(sql)
        except Exception:
            continue  # oracle validity is the correctness gate's job
        hits = [c for c, ty in zip(rel.columns, map(str, rel.types))
                if ty in ("HUGEINT", "UHUGEINT")]
        if hits:
            bad[name] = hits
    assert not bad, (
        f"oracle output columns typed HUGEINT (cast to BIGINT): {bad}")
