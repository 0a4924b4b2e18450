"""Scan EVERY queries() entry's physical plan for the
window-then-global-sort shape (VERDICT r13 item 6): a Window node whose
output feeds an Exchange rangepartitioning — the range sampling pass
re-executes the window stage.  Prints entries ranked by Exchange count
with shape flags, so the range-first conversion targets the worst
offenders instead of sweeping blind.

Usage: python scripts/scan_plans.py [name_filter]
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from clickhouse_core_spark import get_spark  # noqa: E402


def main() -> None:
    name_filter = sys.argv[1] if len(sys.argv) > 1 else ""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("scan_plans", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    rows = []
    for name, fn in sorted(queries.items()):
        if name_filter and not re.search(name_filter, name):
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:
            rows.append((name, -1, f"ERROR {type(e).__name__}: {e}"[:100]))
            continue
        tree = plan.split("\n\n")[0]
        n_ex = len(re.findall(r"\bExchange\b", tree))
        n_range = len(re.findall(r"rangepartitioning", plan))
        n_win = len(re.findall(r"\bWindow\b|\bWindowGroupLimit\b", tree))
        n_sort = len(re.findall(r"\bSort\b", tree))
        n_py = len(re.findall(r"EvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas", tree))
        n_scan = len(re.findall(r"Scan parquet", tree))
        flags = []
        # window (or group-limit) feeding a later range exchange
        if n_win and n_range:
            flags.append("WIN+RANGE")
        if n_py:
            flags.append(f"PY×{n_py}")
        rows.append((name, n_ex,
                     f"ex={n_ex} range={n_range} win={n_win} sort={n_sort} "
                     f"scan={n_scan} {' '.join(flags)}"))
    rows.sort(key=lambda r: -r[1])
    for name, n, desc in rows:
        print(f"{name:45s} {desc}")


if __name__ == "__main__":
    main()
