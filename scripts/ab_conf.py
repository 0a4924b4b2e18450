"""Interleaved A/B(/C) of runtime-settable SQL confs under the driver
protocol (cold build + collect per run, warm session), per VERDICT r13
item 2.  Confs alternate per round so host drift hits every variant
equally; report is per-query median per variant.

Usage: python3 scripts/ab_conf.py [rounds]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
import bench  # noqa: E402
from clickhouse_core_spark import get_spark  # noqa: E402

VARIANTS = {
    # r13 setting (current default)
    "bytes256m": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256m",
    },
    # Spark defaults
    "sparkdflt": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    },
    # byte-sized but fine-grained: small shuffles still fan out locally
    "bytes8m": {
        "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
    },
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab_conf", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    queries["q6_forecast_revenue"](spark, sf_dir).collect()  # warm-up

    results: dict[str, dict[str, list[float]]] = {
        v: {q: [] for q in bench.HEADLINE} for v in VARIANTS
    }
    for r in range(rounds):
        for vname, conf in VARIANTS.items():
            for k, v in conf.items():
                spark.conf.set(k, v)
            for name in bench.HEADLINE:
                fn = queries.get(name)
                if fn is None:
                    continue
                spark.sparkContext.setJobDescription(f"ab:{vname}:{name}:r{r}")
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                n = (df.count() if name.startswith(("dedup", "text"))
                     else len(df.collect()))
                results[vname][name].append(time.perf_counter() - t0)
                assert n >= 0
        print(f"round {r} done", file=sys.stderr)

    report = {}
    for vname in VARIANTS:
        per_q = {q: round(statistics.median(ts), 3)
                 for q, ts in results[vname].items() if ts}
        report[vname] = {"total": round(sum(per_q.values()), 3),
                         "per_query": per_q}
    print(json.dumps(report, indent=1))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "AB_CONF_RAW.json"), "w") as fh:
        json.dump({v: results[v] for v in VARIANTS}, fh, indent=1)


if __name__ == "__main__":
    main()
