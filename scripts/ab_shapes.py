"""Interleaved A/B of query SHAPES under the driver protocol (cold
DataFrame build + collect per run, warm session), per VERDICT r14 items
1/3/4/5.  For each query, variant builders alternate per round so host
drift hits both equally.  Row-identical output across variants is
asserted on the first round (count + sorted sample hash) before any
timing is trusted.

Usage: python3 scripts/ab_shapes.py [rounds] [query ...]
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
from clickhouse_core_spark.operators.final import replacing_final  # noqa: E402
from clickhouse_core_spark.operators.aggregates import limit_by  # noqa: E402
from clickhouse_core_spark.operators.sequence import window_funnel  # noqa: E402

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

_cat = entry_mod._cat


# ---------------------------------------------------------------- old (r12)
# shapes of the range-first family, verbatim from git c3c3b51.

def old_win_rank_family(spark, sf_dir):
    o = _cat(spark, sf_dir).orders
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (o.select("o_custkey", "o_orderkey",
                     F.rank().over(w).cast("long").alias("rnk"),
                     F.dense_rank().over(w).cast("long").alias("drnk"),
                     F.row_number().over(w).cast("long").alias("rn"))
            .orderBy("o_custkey", "rn"))


def old_win_frames_rows(spark, sf_dir):
    ev = _cat(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (ev.select("user_id", "event_id",
                      F.round(F.sum("value").over(w.rowsBetween(-2, 0)), 4)
                      .alias("moving_sum"),
                      F.round(F.sum("value").over(
                          w.rowsBetween(Window.unboundedPreceding, 0)), 4)
                      .alias("running_sum"))
            .orderBy("user_id", "event_id"))


def old_limit_by_group(spark, sf_dir):
    ev = _cat(spark, sf_dir).events
    return (limit_by(ev, ["user_id"], 2,
                     order=[F.col("ts").desc(), F.col("event_id").desc()])
            .select("user_id", "event_id", "ts")
            .orderBy("user_id", "event_id"))


def old_final_replacing(spark, sf_dir):
    ev = _cat(spark, sf_dir).events.select("user_id", "event_id", "ts", "value")
    out = replacing_final(
        ev.withColumn("__v", F.struct("ts", "event_id")), ["user_id"], version="__v")
    return out.drop("__v").orderBy("user_id")


def old_funnel_window(spark, sf_dir):
    ev = _cat(spark, sf_dir).events
    return (window_funnel(ev, ["user_id"], "ts",
                          [F.col("event_type") == "view",
                           F.col("event_type") == "click",
                           F.col("event_type") == "purchase"],
                          window="1 day")
            .orderBy("user_id"))


def old_cb_json_props_histogram(spark, sf_dir):
    ev = _cat(spark, sf_dir).events
    kb = (F.get_json_object("props", "$.k").cast("int") % 10).cast("int")
    return (ev.groupBy(kb.alias("kb"))
            .agg(F.count("*").alias("n"),
                 F.count(F.when(F.col("event_type") == "click", 1))
                 .alias("clicks"),
                 F.format_string("%.4f", F.avg("value")).alias("avg_v"))
            .orderBy("kb"))


# ---------------------------------------------------------------- candidate
# r14 rewrites.

def cand_q21_one_exchange(spark, sf_dir):
    """q21 with ONE hash exchange: repartition("l_orderkey") before the
    pair aggregate — HashPartitioning(ok) satisfies the clustering of
    both groupBy(ok, sk) and groupBy(ok), so neither adds an Exchange."""
    c = _cat(spark, sf_dir)
    f_orders = (c.orders.filter(F.col("o_orderstatus") == "F")
                .select("o_orderkey", "o_orderdate"))
    rows = (c.lineitem
            .select("l_orderkey", "l_suppkey", "l_shipdate")
            .join(f_orders, F.col("o_orderkey") == F.col("l_orderkey"))
            .select("l_orderkey", "l_suppkey",
                    (F.col("l_shipdate")
                     > F.col("o_orderdate") + F.expr("interval 60 days"))
                    .cast("int").alias("__late")))
    per_pair = (rows.repartition("l_orderkey")
                .groupBy("l_orderkey", "l_suppkey")
                .agg(F.sum("__late").alias("__late_rows")))
    per_order = (per_pair.groupBy("l_orderkey")
                 .agg(F.count("*").alias("__n_supp"),
                      F.count(F.when(F.col("__late_rows") > 0, 1))
                      .alias("__n_late"),
                      F.max(F.when(F.col("__late_rows") > 0,
                                   F.col("l_suppkey"))).alias("__sk"),
                      F.max(F.when(F.col("__late_rows") > 0,
                                   F.col("__late_rows"))).alias("__lr")))
    qualifying = (per_order
                  .filter((F.col("__n_supp") > 1) & (F.col("__n_late") == 1))
                  .select(F.col("__sk").alias("l_suppkey"),
                          F.col("__lr").alias("__late_rows")))
    return (qualifying
            .join(c.supplier, F.col("s_suppkey") == F.col("l_suppkey"))
            .groupBy("s_name").agg(F.sum("__late_rows").cast("long").alias("numwait"))
            .orderBy(F.col("numwait").desc(), "s_name").limit(20))


def cand_asof_persist(spark, sf_dir):
    """join_asof_backward with the window output persisted before the
    final orderBy, so the range partitioner's sampling pass reads the
    cache instead of re-running the union+window subtree."""
    from clickhouse_core_spark.operators.joins import asof_join
    ev = _cat(spark, sf_dir).events
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select(F.col("event_id").alias("purchase_id"), "user_id", "ts"))
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("user_id", F.col("ts").alias("click_ts"),
                      F.col("event_id").alias("click_id")))
    body = (asof_join(purchases, clicks, on=["user_id"],
                      left_ts="ts", right_ts="click_ts", inequality=">=",
                      right_values=["click_id", "click_ts"], how="inner")
            .select("purchase_id", "user_id", "ts", "click_id", "click_ts")
            .persist())
    return body.orderBy("purchase_id")


AB = {
    # query name -> {variant label: builder};  "cur" = registered entry
    "win_rank_family": {"old": old_win_rank_family},
    "win_frames_rows": {"old": old_win_frames_rows},
    "limit_by_group": {"old": old_limit_by_group},
    "final_replacing": {"old": old_final_replacing},
    "funnel_window": {"old": old_funnel_window},
    "cb_json_props_histogram": {"old": old_cb_json_props_histogram},
    "q21_waiting_supplier": {"oneex": cand_q21_one_exchange},
    "join_asof_backward": {"persist": cand_asof_persist},
}


def row_fingerprint(rows):
    h = hashlib.sha256()
    for r in rows:
        h.update(repr(tuple(r)).encode())
    return h.hexdigest()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    only = set(sys.argv[2:])
    spark = get_spark("ab_shapes", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    queries["q6_forecast_revenue"](spark, sf_dir).collect()  # warm-up

    names = [n for n in AB if not only or n in only]
    results = {n: {"cur": []} for n in names}
    fprints: dict[str, dict[str, str]] = {n: {} for n in names}
    for n in names:
        for v in AB[n]:
            results[n][v] = []

    for r in range(rounds):
        for n in names:
            variants = {"cur": queries[n], **AB[n]}
            for vname, fn in variants.items():
                spark.sparkContext.setJobDescription(f"abshape:{n}:{vname}:r{r}")
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                rows = df.collect()
                results[n][vname].append(time.perf_counter() - t0)
                if r == 0:
                    fprints[n][vname] = row_fingerprint(rows)
                # unpersist any cache the variant created so later runs
                # stay cold (driver protocol)
                spark.catalog.clearCache()
        print(f"round {r} done", file=sys.stderr)

    report = {}
    for n in names:
        fps = set(fprints[n].values())
        report[n] = {
            "rows_identical": len(fps) == 1,
            "medians": {v: round(statistics.median(ts), 3)
                        for v, ts in results[n].items()},
            "raw": {v: [round(t, 3) for t in ts]
                    for v, ts in results[n].items()},
        }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
