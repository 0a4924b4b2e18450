"""Round 3 of the shape A/B (see ab_shapes.py): join_any_left's right
side deduplicated by a min_by aggregate (map-side partial collapse, no
sort) instead of a row_number window (full shuffle + per-partition
sort).

Usage: python3 scripts/ab_shapes3.py [rounds]
"""
from __future__ import annotations

import hashlib
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from clickhouse_core_spark import get_spark  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

_cat = entry_mod._cat


def cand_join_any_minby(spark, sf_dir):
    c = _cat(spark, sf_dir)
    first_order = c.orders.select(F.col("o_custkey").alias("c_custkey"),
                                  "o_orderkey", "o_orderdate")
    deduped = (first_order.groupBy("c_custkey")
               .agg(F.min_by(F.struct("o_orderkey", "o_orderdate"),
                             F.struct("o_orderdate", "o_orderkey"))
                    .alias("__r"))
               .select("c_custkey", "__r.*"))
    return (c.customer.join(deduped, on=["c_custkey"], how="left")
            .select("c_custkey", "o_orderkey")
            .orderBy("c_custkey"))


AB = {"join_any_left": {"minby": cand_join_any_minby}}


def row_fingerprint(rows):
    h = hashlib.sha256()
    for r in rows:
        h.update(repr(tuple(r)).encode())
    return h.hexdigest()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = get_spark("ab_shapes3", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    queries["q6_forecast_revenue"](spark, sf_dir).collect()  # warm-up

    results = {n: {"cur": [], **{v: [] for v in AB[n]}} for n in AB}
    fprints = {n: {} for n in AB}
    for r in range(rounds):
        for n in AB:
            variants = {"cur": queries[n], **AB[n]}
            for vname, fn in variants.items():
                spark.sparkContext.setJobDescription(f"ab3:{n}:{vname}:r{r}")
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                rows = df.collect()
                results[n][vname].append(time.perf_counter() - t0)
                if r == 0:
                    fprints[n][vname] = row_fingerprint(rows)
        print(f"round {r} done", file=sys.stderr)

    report = {}
    for n in AB:
        report[n] = {
            "rows_identical": len(set(fprints[n].values())) == 1,
            "medians": {v: round(statistics.median(ts), 3)
                        for v, ts in results[n].items()},
            "raw": {v: [round(t, 3) for t in ts]
                    for v, ts in results[n].items()},
        }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
