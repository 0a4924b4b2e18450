"""Structured Streaming: tumbling/hopping windows + watermark late-data
semantics (SURVEY §2.9), exercised with a file-backed stream."""

import datetime as dt
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from clickhouse_core_spark.streaming import windowed_aggregate


@pytest.fixture
def stream_dir(spark):
    d = tempfile.mkdtemp(prefix="ccs_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, "ts timestamp, k string, v double")
    df.coalesce(1).write.mode("append").parquet(path)


def _t(minute, sec=0):
    return dt.datetime(2024, 1, 1, 0, minute, sec)


def test_streaming_tumble_matches_batch(spark, stream_dir):
    rows = [(_t(0, 10), "a", 1.0), (_t(0, 50), "a", 2.0),
            (_t(1, 10), "b", 3.0), (_t(2, 5), "a", 4.0)]
    _write_batch(spark, stream_dir, rows)

    schema = "ts timestamp, k string, v double"
    stream = spark.readStream.schema(schema).parquet(stream_dir)
    agg = windowed_aggregate(stream, "ts", "1 minute",
                             [F.count("*").alias("cnt"), F.sum("v").alias("s")],
                             keys=["k"], watermark="5 minutes")
    q = (agg.writeStream.format("memory").queryName("tumble_test")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
        got = {(r.wstart, r.k): (r.cnt, r.s)
               for r in spark.sql("select * from tumble_test").collect()}
    finally:
        q.stop()

    batch = windowed_aggregate(
        spark.read.schema(schema).parquet(stream_dir), "ts", "1 minute",
        [F.count("*").alias("cnt"), F.sum("v").alias("s")], keys=["k"])
    want = {(r.wstart, r.k): (r.cnt, r.s) for r in batch.collect()}
    assert got == want


def test_streaming_watermark_drops_late_rows(spark, stream_dir):
    # first batch advances the watermark far ahead; the late row in the
    # second batch is older than watermark -> dropped in append mode
    _write_batch(spark, stream_dir, [(_t(0, 30), "a", 1.0), (_t(30), "a", 9.0)])

    schema = "ts timestamp, k string, v double"
    stream = spark.readStream.schema(schema).parquet(stream_dir)
    agg = windowed_aggregate(stream, "ts", "1 minute",
                             [F.sum("v").alias("s")], keys=["k"],
                             watermark="10 minutes")
    q = (agg.writeStream.format("memory").queryName("wm_test")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        _write_batch(spark, stream_dir, [(_t(0, 45), "a", 100.0)])  # late
        q.processAllAvailable()
        rows = {(r.wstart): r.s for r in spark.sql("select * from wm_test").collect()}
    finally:
        q.stop()
    # the 00:00 window was finalized by the watermark advance from the
    # 00:30 event; the late 100.0 contribution must not appear
    assert rows.get(_t(0)) == 1.0


def test_stateful_sessionize_applyinpandaswithstate(spark, stream_dir):
    from clickhouse_core_spark.streaming import stateful_sessionize
    # user a: events at 0:10, 0:50 (same session), 10:00 (gap>5min closes
    # first session, stays open); user b: one open session only
    rows = [(_t(0, 10), "a", 1.0), (_t(0, 50), "a", 2.0),
            (_t(10), "a", 4.0), (_t(0), "b", 7.0)]
    _write_batch(spark, stream_dir, rows)

    schema = "ts timestamp, k string, v double"
    stream = spark.readStream.schema(schema).parquet(stream_dir)
    sessions = stateful_sessionize(stream, "k", "ts", "v", gap_seconds=300)
    q = (sessions.writeStream.format("memory").queryName("sess_test")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = [(r.k, r.session_start, r.session_end, r.n_events, r.v_sum)
               for r in spark.sql("select * from sess_test").collect()]
    finally:
        q.stop()

    t0 = int(_t(0, 10).replace(tzinfo=dt.timezone.utc).timestamp())
    t1 = int(_t(0, 50).replace(tzinfo=dt.timezone.utc).timestamp())
    # only user a's FIRST session is closed (by the 10:00 event)
    assert got == [("a", t0, t1, 2, 3.0)]


def test_live_view_version_bumps_only_on_change(spark, tmp_path):
    from clickhouse_core_spark.streaming import LiveView
    src = {"rows": [(1, "a"), (2, "b")]}

    def q():
        return spark.createDataFrame(src["rows"], "k int, v string")

    lv = LiveView(spark, str(tmp_path / "lv"), q)
    assert lv.refresh() is True and lv.version == 1
    got = lv.read()
    assert got.count() == 2 and got.columns == ["k", "v", "_version"]
    assert got.first()._version == 1
    # same result -> no version bump (the reference's hash gate)
    assert lv.refresh() is False and lv.version == 1
    # changed result -> bump
    src["rows"] = [(1, "a"), (2, "b"), (3, "c")]
    assert lv.refresh() is True and lv.version == 2
    assert lv.read().count() == 3
    # metadata survives a reopen
    lv2 = LiveView(spark, str(tmp_path / "lv"), q)
    assert lv2.version == 2 and lv2.read().count() == 3


def test_refreshable_mv_schedule_kinds(spark, tmp_path):
    from clickhouse_core_spark.streaming import RefreshableMaterializedView

    def q():
        return spark.createDataFrame([(1,)], "x int")

    ev = RefreshableMaterializedView(
        spark, str(tmp_path / "ev"), q, interval_s=60, kind="every")
    assert ev.refresh_if_due(now=30.0) is True        # first tick runs
    assert ev.refresh_if_due(now=59.0) is False       # same period
    assert ev.refresh_if_due(now=61.0) is True        # boundary crossed
    af = RefreshableMaterializedView(
        spark, str(tmp_path / "af"), q, interval_s=60, kind="after")
    assert af.refresh_if_due(now=100.0) is True
    assert af.refresh_if_due(now=140.0) is False      # < last + 60
    assert af.refresh_if_due(now=161.0) is True       # relative elapsed
