"""Local mirror of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet dir,
compare row counts + column names + (roughly) values.

Usage: python scripts/check_correctness.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from clickhouse_core_spark import get_spark  # noqa: E402


# STRICT=1: compare floats EXACTLY (the driver's hasher does) instead of
# rounding to 6dp — catches last-ULP libm divergences and decimal-scale
# rendering differences before the driver's 50-entry rotation does.
STRICT = os.environ.get("STRICT", "") == "1"


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # STRICT mode mimics the driver's hasher, which hashes value
        # REPRESENTATIONS: 900 (BIGINT) and 900.0 (DOUBLE) are equal as
        # Python numbers but hash differently there.  Tag the kind so an
        # int-vs-float carrier divergence fails locally too.
        return ("f", v) if STRICT else round(v, 6)
    if STRICT and isinstance(v, int) and not isinstance(v, bool):
        return ("i", v)
    if STRICT and type(v).__name__ == "Decimal":
        return str(v)
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted((tuple(norm_cell(r[i]) for i in idx) for r in rows), key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""
    extra = {"spark.sql.shuffle.partitions": "8"}
    # ANSI=1 mirrors the driver's session (Spark 4 defaults ANSI on); every
    # entry must be session-proof, so run the gate both ways.
    if os.environ.get("ANSI", "") == "1":
        extra["spark.sql.ansi.enabled"] = "true"
    spark = get_spark("correctness", master="local[8]", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"create view {t} as select * from read_parquet('{p}')")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in queries.items():
        import re as _re
        if name_filter and not _re.search(name_filter, name):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows ({time.time()-t0:.1f}s) [no oracle]")
            n_rows_only += 1
            continue
        try:
            res = con.sql(oracles[name])
            dcols = [c.lower() for c in res.columns]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: DUCKDB ERROR {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if not problems:
            ns, nd = norm_rows(scols, srows), norm_rows(dcols, drows)
            if ns != nd:
                diff = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(p[:400] for p in problems)}")
            n_fail += 1
        else:
            print(f"PASS  {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
