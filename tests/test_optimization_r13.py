"""Round-13 optimization guards.

The r13 rewrites replace global ``orderBy`` tails with
range-partition-first shapes whose OUTPUT ROW ORDER must still equal
the declared ORDER BY (the oracle gate sorts rows canonically, so it
cannot catch an ordering regression — these tests can), and make
``Catalog.register_all`` idempotent.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from clickhouse_core_spark import Catalog

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SF_DIR), reason="driver fixture not present")


def _collected(spark, name):
    return entry_mod.queries()[name](spark, SF_DIR).collect()


# (query, ORDER BY key extractor, descending flags) — every r13 rewrite
# that dropped an explicit final orderBy in favor of range-partitioned
# per-partition sorts or coalesce(1) sorts.
_ORDER_CONTRACTS = {
    "win_rank_family": lambda r: (r["o_custkey"], r["rn"]),
    "win_frames_rows": lambda r: (r["user_id"], r["event_id"]),
    "limit_by_group": lambda r: (r["user_id"], r["event_id"]),
    "final_replacing": lambda r: (r["user_id"],),
    "funnel_window": lambda r: (r["user_id"],),
    "multimodal_decode": lambda r: (r["doc_id"],),
    "multimodal_features": lambda r: (r["doc_id"], r["i"]),
    "multimodal_frame_sample": lambda r: (r["doc_id"],),
    "cb_json_props_histogram": lambda r: (
        (r["kb"] is not None, r["kb"]),),  # NULLS FIRST (Spark default)
    "cb_session_gaps": lambda r: (r["user_id"],),  # r14 range-first
    # r14 sweep: the non-headline O(N)-output window entries converted
    # to the same range-first shape
    "win_lag_lead": lambda r: (r["user_id"], r["event_id"]),
    "win_first_last_nth": lambda r: (r["user_id"], r["event_id"]),
    "win_nonneg_derivative": lambda r: (r["user_id"], r["event_id"]),
    "win_running_neighbor": lambda r: (r["user_id"], r["event_id"]),
    "sessionize_gap": lambda r: (r["user_id"], r["event_id"]),
    "win_groups_frame": lambda r: (r["user_id"], r["event_id"]),
    "delta_sum_positive": lambda r: (r["user_id"],),
}


@pytest.mark.parametrize("name", sorted(_ORDER_CONTRACTS))
def test_rewritten_query_output_is_globally_ordered(spark, name):
    rows = _collected(spark, name)
    key = _ORDER_CONTRACTS[name]
    assert rows, name
    keys = [key(r) for r in rows]
    assert keys == sorted(keys), (
        f"{name}: rows are not in declared ORDER BY order")


# The sf0.001 run above often coalesces the range shuffle to a single
# partition (AQE advisory 256m ≫ fixture bytes), which barely exercises
# the cross-partition invariant the rewrites rely on (r13 advice).  Run
# the range-first entries at the LARGEST fixture present with a tiny
# advisory partition size pinned, and require a genuinely multi-partition
# plan before checking global order.
# r14 kept range-first only where the operator does not shrink its
# input (the removed exchange carries O(N) rows); limit_by_group,
# final_replacing and funnel_window were reverted to the orderBy shape
# after the interleaved driver-protocol A/B (see OPTIMIZATION_r14.md).
_RANGE_FIRST = ("win_rank_family", "win_frames_rows", "cb_session_gaps",
                "win_lag_lead", "win_first_last_nth",
                "win_nonneg_derivative", "sessionize_gap",
                "win_groups_frame", "delta_sum_positive")
_SF_BIG = next((d for d in ("/root/testdata/sf0.01", SF_DIR)
                if os.path.exists(d)), SF_DIR)


@pytest.mark.parametrize("name", _RANGE_FIRST)
def test_range_first_order_holds_across_many_partitions(spark, name):
    old = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    old_min = spark.conf.get(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize")
    # build FIRST: _cat() -> Catalog.__init__ -> apply_runtime_conf would
    # overwrite the pinned advisory; AQE reads the conf at execution time.
    # minPartitionSize (default 1m) floors coalescing and would still
    # collapse the fixture-sized shuffle to one partition.
    df = entry_mod.queries()[name](spark, _SF_BIG)
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.minPartitionSize", "1k")
    try:
        rdd = df.rdd  # materializes under AQE with the tiny advisory
        assert rdd.getNumPartitions() > 1, (
            f"{name}: want >1 post-shuffle partitions to exercise the "
            "cross-partition ordering contract")
        rows = df.collect()
        key = _ORDER_CONTRACTS[name]
        keys = [key(r) for r in rows]
        assert keys == sorted(keys), (
            f"{name}: rows are not in declared ORDER BY order at {_SF_BIG}")
    finally:
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", old)
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize", old_min)


def test_win_rank_family_order_matches_window_order(spark):
    """(o_custkey, rn) must equal (o_custkey, o_totalprice DESC,
    o_orderkey) — the invariant the range-first rewrite relies on."""
    df = entry_mod.queries()["win_rank_family"](spark, SF_DIR)
    rows = df.collect()
    rn = {}
    for r in rows:
        rn.setdefault(r["o_custkey"], []).append(r["rn"])
    for v in rn.values():
        assert v == sorted(v) and v[0] == 1 and v[-1] == len(v)


def test_register_all_is_idempotent_and_forceable(spark):
    cat = Catalog(spark, SF_DIR)
    cat.register_all()
    first = set(cat._registered)
    assert "lineitem" in first
    # second call is a no-op (no re-registration of the same names)
    cat.register_all()
    assert cat._registered == first
    # an externally replaced view survives until force=True
    spark.range(3).toDF("x").createOrReplaceTempView("lineitem")
    cat.register_all()
    assert spark.table("lineitem").columns == ["x"]
    cat.register_all(force=True)
    assert "l_orderkey" in spark.table("lineitem").columns


def test_q21_primitive_maxes_keep_hash_aggregation(spark):
    """The struct-max SortAggregate fallback must not come back."""
    df = entry_mod.queries()["q21_waiting_supplier"](spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "SortAggregate" not in plan
    assert "HashAggregate" in plan


def test_fact_side_streams_in_q5_q10(spark):
    """The per-dimension join chains must not broadcast lineitem.

    q3 got the same chain rewrite (its point is precisely not
    broadcasting the fact side), so it is asserted too (r13 advice)."""
    for name in ("q5_local_supplier_volume", "q10_returned_items",
                 "q3_shipping_priority"):
        df = entry_mod.queries()[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        tree = plan.split("\n\n")[0]
        # every scan under a BroadcastExchange must not be lineitem:
        # find the detail section of each broadcast subtree's scans
        import re
        scan_tables = dict(re.findall(
            r"\((\d+)\) Scan parquet.*?/(\w+)\.parquet", plan, re.DOTALL))
        lines = tree.splitlines()
        for i, ln in enumerate(lines):
            if "BroadcastExchange" not in ln:
                continue
            # subtree boundary = the operator's column offset (r13 advice:
            # the old trailing-whitespace term was always 0)
            indent = ln.index("BroadcastExchange")
            for ln2 in lines[i + 1:]:
                stripped = ln2.lstrip(" :+-")
                ind2 = len(ln2) - len(stripped)
                if ind2 <= indent and stripped:
                    break
                m = re.search(r"Scan parquet\s+\((\d+)\)", ln2)
                if m:
                    assert scan_tables.get(m.group(1)) != "lineitem", (
                        f"{name}: lineitem is broadcast")
