"""Capture .explain("formatted") for every bench headline query into
plans/<tag>/<query>_<suffix>.txt (judge evidence for plan claims).

Usage: python scripts/capture_plans.py <suffix> [name_filter]
e.g.   python scripts/capture_plans.py before
Env: SPARK_GRAFT_PLANS_TAG (default r14) selects plans/<tag>/;
     SPARK_GRAFT_ENTRY_DIR points at a directory holding an alternate
     __spark_entry__.py (e.g. a git-show snapshot) for BEFORE captures.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.environ.get("SPARK_GRAFT_ENTRY_DIR"):
    sys.path.insert(0, os.environ["SPARK_GRAFT_ENTRY_DIR"])

import __spark_entry__ as entry_mod  # noqa: E402
import bench  # noqa: E402
from clickhouse_core_spark import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans",
        os.environ.get("SPARK_GRAFT_PLANS_TAG", "r14"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plans", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    for name in bench.HEADLINE:
        if name_filter and not re.search(name_filter, name):
            continue
        fn = queries.get(name)
        if fn is None:
            continue
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt "
              f"({plan.count('Exchange')} Exchange)")


if __name__ == "__main__":
    main()
