"""Physical-plan quality gates: the optimizations we rely on for the
100 TB case must actually appear in the executed plans (SURVEY.md §4 —
pushdown/pruning/broadcast are Catalyst built-ins, but only if our
queries stay declarative enough for them to fire)."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_parquet(catalog):
    li = catalog.lineitem
    df = li.filter(F.col("l_quantity") < 10).select("l_orderkey", "l_quantity")
    plan = _plan(df)
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split("PushedFilters")[1][:200]


def test_column_pruning_in_scan(catalog):
    li = catalog.lineitem
    df = li.select("l_orderkey", "l_quantity")
    plan = _plan(df)
    # ReadSchema must not include unused heavy columns
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in rs and "l_quantity" in rs
    assert "l_extendedprice" not in rs


def test_small_dims_broadcast_in_q5(spark):
    q = entry.queries()["q5_local_supplier_volume"]
    plan = _plan(q(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_semi_anti_join_strategies(spark):
    qs = entry.queries()
    semi_plan = _plan(qs["join_semi"](spark, SF_DIR))
    anti_plan = _plan(qs["join_anti"](spark, SF_DIR))
    assert "LeftSemi" in semi_plan
    assert "LeftAnti" in anti_plan


def test_partial_aggregation_two_phase(spark):
    q = entry.queries()["q1_pricing_summary"]
    plan = _plan(q(spark, SF_DIR))
    # HashAggregate appears twice: partial (map-side) + final
    assert plan.count("HashAggregate") >= 2


def test_topk_uses_take_ordered(spark):
    q = entry.queries()["sort_topk"]
    plan = _plan(q(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_whole_stage_codegen_in_hot_path(spark):
    q = entry.queries()["q6_forecast_revenue"]
    df = q(spark, SF_DIR)
    df.collect()  # AQE finalizes the plan (and codegen markers) on execution
    # codegen stages print as "*(n) Operator" in the final plan tree
    plan = _plan(df)
    assert "*(1)" in plan and "HashAggregate" in plan


def test_sample_by_hash_pushes_past_projection(catalog):
    from clickhouse_core_spark.operators import sample_by_hash
    li = catalog.lineitem
    df = sample_by_hash(li, 0.1, ["l_orderkey"]).select("l_orderkey")
    # the filter is a plain deterministic expression: it must sit in the
    # scan stage (no Exchange between scan and filter)
    plan = _plan(df)
    assert plan.index("Filter") > plan.index("Scan parquet") or "Exchange" not in plan


def test_paste_join_no_global_data_window(spark):
    # scale gate: paste_join's row numbering must never sort the DATA in
    # one partition — every row_number window is partitioned by __pid;
    # the only global window runs over the per-partition count table
    from clickhouse_core_spark.operators import paste_join
    left = spark.range(1000).withColumnRenamed("id", "a")
    right = spark.range(1000).withColumnRenamed("id", "b")
    plan = _plan(paste_join(left, right, ["a"], ["b"]))
    for line in plan.splitlines():
        if "row_number()" in line:
            assert "__pid" in line, f"global-window row_number: {line}"


def test_simhash_fingerprint_is_jvm_only(spark):
    # scale gate: no Python evaluation (BatchEvalPython / ArrowEvalPython
    # / FlatMapsInPandas) anywhere in the simhash dedup plan
    from clickhouse_core_spark.pipeline import simhash_dedup
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma delta")],
        "doc_id long, text string")
    plan = _plan(simhash_dedup(df))
    assert "Python" not in plan and "Pandas" not in plan


def test_timeseries_grid_no_range_join(spark):
    # samples explode onto grid cells and equi-join: the plan must not
    # contain a nested-loop/cartesian strategy for the grid attachment
    from clickhouse_core_spark.operators.timeseries import time_series_to_grid
    df = spark.createDataFrame([("a", 10.0, 1.0), ("a", 20.0, 2.0)],
                               "s string, ts double, v double")
    out = time_series_to_grid(df, ["s"], "ts", "v", 10.0, 100.0, 10.0, 30.0,
                              "rate")
    plan = _plan(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_exact_dedup_partial_aggregates(spark):
    # min_by must partial-aggregate map-side (duplicates collapse
    # before the exchange)
    from clickhouse_core_spark.pipeline import exact_dedup
    df = spark.createDataFrame([(1, "a"), (2, "a")], "doc_id long, text string")
    plan = _plan(exact_dedup(df))
    assert "partial_min_by" in plan or "partial_minby" in plan.lower()


def test_minhash_band_join_carries_no_arrays(spark):
    # the band self-join's shuffle must move only (id, band) — shingle
    # arrays join back AFTER candidate dedup
    from clickhouse_core_spark.pipeline.dedup import minhash_lsh_dedup
    df = spark.createDataFrame([(i, "w%d x y z" % (i % 3)) for i in range(10)],
                               "doc_id long, text string")
    plan = _plan(minhash_lsh_dedup(df))
    # the SMJ/shuffled-hash join on __band must not list __shingles in
    # its output columns: find the join line(s) keyed on __band
    band_join_lines = [ln for ln in plan.splitlines()
                       if "__band" in ln and "Join" in ln]
    assert band_join_lines, "no band join found in plan"
    assert all("__shingles" not in ln for ln in band_join_lines)


def test_tskv_jsoncompact_decode_is_jvm_only(spark, tmp_path):
    # scale gate: the text row formats decode with Catalyst expressions
    # only — no Python evaluation nodes in the plan
    import os
    from clickhouse_core_spark.sources import (
        read_format, write_tskv, write_json_compact_each_row)
    df = spark.createDataFrame([(1, "a", 1.5), (2, "b", 2.5)],
                               "id bigint, s string, v double")
    p1, p2 = str(tmp_path / "tskv"), str(tmp_path / "jc")
    write_tskv(df, p1)
    write_json_compact_each_row(df, p2)
    for path, fmt in ((p1, "TSKV"), (p2, "JSONCompactEachRow")):
        plan = _plan(read_format(spark, path, fmt,
                                 schema="id bigint, s string, v double"))
        assert "Python" not in plan and "Pandas" not in plan, fmt


def test_connected_components_round_is_two_shuffles(spark):
    # scale gate: one large-star + small-star alternation = bounded
    # exchange count (groupBy-min twice + dedup), never a cross join
    from clickhouse_core_spark.pipeline.graphs import _star_round
    edges = spark.createDataFrame(
        [(2, 1), (3, 2), (9, 3)], "u bigint, v bigint")
    plan = _plan(_star_round(edges))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def _broadcast_subtrees(plan: str) -> list:
    """Lines belonging to each BroadcastExchange subtree (children are
    printed with deeper indentation)."""
    lines = plan.splitlines()
    out = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line:
            continue
        indent = len(line) - len(line.lstrip(" :+-"))
        sub = []
        for nxt in lines[i + 1:]:
            nindent = len(nxt) - len(nxt.lstrip(" :+-"))
            if nxt.strip() and nindent <= indent:
                break
            sub.append(nxt)
        out.append("\n".join(sub))
    return out


def test_fact_table_never_broadcasts(spark):
    # scale gate for the TPC-H join shapes rewritten in round 4: where
    # the plan is pinned (q3's explicit dim broadcast, q18's pre-join
    # aggregation) the lineitem FACT scan must stream, never sit under
    # a BroadcastExchange.  q5/q10 are left to Catalyst's cost model —
    # below the 64m threshold broadcasting the filtered fact is the
    # cost-optimal LOCAL choice, and the same threshold forbids it at
    # real scale (AQE re-plans from runtime sizes), so no gate there.
    for name in ("q3_shipping_priority", "q18_large_orders"):
        df = entry.queries()[name](spark, SF_DIR)
        for sub in _broadcast_subtrees(_plan(df)):
            assert "lineitem" not in sub, f"{name} broadcasts lineitem"


def test_q18_aggregates_before_join(spark):
    # the HAVING sum_qty filter must run on lineitem BEFORE the orders
    # join (partial agg replaces a fact-fact join)
    plan = _optimized(entry.queries()["q18_large_orders"](spark, SF_DIR))
    join_pos = plan.find("Join")
    agg_pos = plan.rfind("Aggregate")
    assert join_pos != -1 and agg_pos > join_pos, \
        "lineitem aggregation is not below the join"


def test_chunk_documents_no_shuffle(spark):
    # context-window chunking must stay map-side: split -> Generate,
    # zero Exchange in the physical plan (SCALE.md round-4 contract)
    from clickhouse_core_spark.pipeline import chunk_documents
    df = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    plan = _plan(chunk_documents(df.select("doc_id", "text"),
                                 max_tokens=32, overlap=8))
    assert "Exchange" not in plan, "chunking introduced a shuffle"
    assert "Generate" in plan


def test_semantic_dedup_blocks_on_centroid(spark):
    # the SemDeDup pair join must be an equi-join keyed by the centroid
    # id — never a cartesian/broadcast-nested-loop over the corpus
    from clickhouse_core_spark.pipeline import semantic_dedup
    df = (spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
          .select("vec_id", F.transform(
              "embedding", lambda x: x.cast("double")).alias("embedding")))
    plan = _optimized(semantic_dedup(df, threshold=0.95, n_centroids=4,
                                     iterations=1))
    assert "__centroid" in plan
    assert "CartesianProduct" not in _plan(
        semantic_dedup(df, threshold=0.95, n_centroids=4, iterations=1))
