"""Round 2 of the shape A/B (see ab_shapes.py): dedup_minhash_lsh
neighbor-expansion via explode (no union-duplicated subtree),
cb_session_gaps range-first re-test (VERDICT r13 item 7), and a
single-scan asof union for join_asof_backward.

Usage: python3 scripts/ab_shapes2.py [rounds]
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
from clickhouse_core_spark.pipeline.dedup import (  # noqa: E402
    _shingle_hash_table, _signature_expr)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

_cat = entry_mod._cat


def cand_minhash_explode(spark, sf_dir):
    """minhash_lsh_dedup with the neighbor expansion done by explode
    (narrow) instead of a union of two projections of `similar`, which
    plans the whole band-join + verify subtree twice."""
    df = _cat(spark, sf_dir).documents
    text_col, id_col = "text", "doc_id"
    num_hashes, bands, shingle_k, jaccard_threshold, seed = 32, 8, 3, 0.7, 42
    rows_per_band = num_hashes // bands
    sh = _shingle_hash_table(df, text_col, id_col, shingle_k)
    with_sig = sh.withColumn("minhash", _signature_expr("__shingles", num_hashes, seed))
    with_sig = with_sig.persist()
    band_keys = F.array(*[
        F.xxhash64(F.lit(bi), F.concat_ws(",", F.transform(
            F.slice("minhash", bi * rows_per_band + 1, rows_per_band),
            lambda c: c.cast("string"))))
        for bi in range(bands)])
    banded = with_sig.select("__id", F.explode(band_keys).alias("__band"))
    pairs = (banded.alias("l").join(banded.alias("r"), on="__band")
             .select(F.col("l.__id").alias("id_a"),
                     F.col("r.__id").alias("id_b"))
             .filter(F.col("id_a") < F.col("id_b"))
             .dropDuplicates(["id_a", "id_b"]))
    sh_only = with_sig.select("__id", "__shingles")
    pairs = (pairs
             .join(sh_only.select(F.col("__id").alias("id_a"),
                                  F.col("__shingles").alias("sh_a")), "id_a")
             .join(sh_only.select(F.col("__id").alias("id_b"),
                                  F.col("__shingles").alias("sh_b")), "id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    similar = (pairs
               .withColumn("__j", F.when(union > 0, inter / union).otherwise(F.lit(1.0)))
               .filter(F.col("__j") >= jaccard_threshold)
               .select("id_a", "id_b"))
    # CHANGED: explode both directions in one pass (narrow) instead of
    # union(select, select) which duplicates the whole pair subtree.
    neigh = similar.select(F.explode(F.array(
        F.struct(F.col("id_b").alias("__id"), F.col("id_a").alias("__n")),
        F.struct(F.col("id_a").alias("__id"), F.col("id_b").alias("__n"))
    )).alias("__e")).select("__e.__id", "__e.__n")
    rep = neigh.groupBy("__id").agg(F.min("__n").alias("__rep"))
    out = (df.join(rep, on=df[id_col] == rep["__id"], how="left")
           .withColumn("__keep", F.col("__rep").isNull() |
                       (F.col("__rep") >= F.col(id_col)))
           .filter(F.col("__keep"))
           .select(*df.columns))
    return out.select("doc_id").orderBy("doc_id")


def cand_cb_session_gaps_rangefirst(spark, sf_dir):
    ev = _cat(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    brk = F.when(F.lag("ts").over(w).isNull() | (gap > 300), 1).otherwise(0)
    shaped = (ev.repartitionByRange("user_id")
              .sortWithinPartitions("user_id", "ts", "event_id"))
    return (shaped.select("user_id", brk.alias("brk"))
            .groupBy("user_id")
            .agg(F.sum("brk").cast("long").alias("sessions"),
                 F.count("*").alias("n"))
            .sortWithinPartitions("user_id"))


def cand_asof_single_scan(spark, sf_dir):
    """join_asof_backward built from ONE events scan: filter to both
    event types, tag sides conditionally — the same union-shaped frame
    asof_join builds from two scans."""
    ev = _cat(spark, sf_dir).events
    both = ev.filter(F.col("event_type").isin("purchase", "click"))
    is_p = F.col("event_type") == "purchase"
    unioned = both.select(
        "user_id",
        F.col("ts").alias("__asof_ts"),
        # right rows sort BEFORE left rows at equal ts (inclusive >=)
        F.when(is_p, F.lit(1)).otherwise(F.lit(0)).alias("__side"),
        F.when(is_p, F.col("event_id")).alias("purchase_id"),
        F.when(is_p, F.col("ts")).alias("ts"),
        F.when(~is_p, F.col("event_id")).alias("__r_click_id"),
        F.when(~is_p, F.col("ts")).alias("__r_click_ts"))
    w = (Window.partitionBy("user_id")
         .orderBy(F.col("__asof_ts"), F.col("__side"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (unioned
               .withColumn("click_id",
                           F.last("__r_click_id", ignorenulls=True).over(w))
               .withColumn("click_ts",
                           F.last("__r_click_ts", ignorenulls=True).over(w)))
    return (matched.filter(F.col("__side") == 1)
            .filter(F.col("click_id").isNotNull() |
                    F.col("click_ts").isNotNull())
            .select("purchase_id", "user_id", "ts", "click_id", "click_ts")
            .orderBy("purchase_id"))


AB = {
    "dedup_minhash_lsh": {"explode": cand_minhash_explode},
    "cb_session_gaps": {"rangefirst": cand_cb_session_gaps_rangefirst},
    "join_asof_backward": {"onescan": cand_asof_single_scan},
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
    spark = get_spark("ab_shapes2", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    queries["q6_forecast_revenue"](spark, sf_dir).collect()  # warm-up

    results = {n: {"cur": [], **{v: [] for v in AB[n]}} for n in AB}
    fprints = {n: {} for n in AB}
    for r in range(rounds):
        for n in AB:
            variants = {"cur": queries[n], **AB[n]}
            for vname, fn in variants.items():
                spark.sparkContext.setJobDescription(f"ab2:{n}:{vname}:r{r}")
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                rows = df.collect()
                results[n][vname].append(time.perf_counter() - t0)
                if r == 0:
                    fprints[n][vname] = row_fingerprint(rows)
                spark.catalog.clearCache()
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
