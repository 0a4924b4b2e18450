"""Materialized-view cascade (foreachBatch push model) and ingest dedup
(dropDuplicatesWithinWatermark) — reference StorageMaterializedView /
DeduplicationTokenTransforms analogs."""

import datetime as dt
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from clickhouse_core_spark.streaming import (
    MaterializedViewCascade, dedup_within_watermark,
)


@pytest.fixture
def workdir():
    d = tempfile.mkdtemp(prefix="ccs_mv_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _t(minute, sec=0):
    return dt.datetime(2024, 1, 1, 0, minute, sec)


SCHEMA = "ts timestamp, k string, v double"


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(path)


def test_mv_cascade_pushes_each_batch(spark, workdir):
    src = os.path.join(workdir, "src")
    agg_t = os.path.join(workdir, "mv_agg")
    filt_t = os.path.join(workdir, "mv_filter")
    _write(spark, src, [(_t(0), "a", 1.0), (_t(1), "b", 5.0)])

    cascade = (MaterializedViewCascade()
               .add_view("per_key",
                         lambda b: b.groupBy("k").agg(F.sum("v").alias("s")),
                         agg_t)
               .add_view("big_only", lambda b: b.filter(F.col("v") > 2), filt_t))

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = cascade.attach(stream, os.path.join(workdir, "ckpt"))
    try:
        q.processAllAvailable()
        _write(spark, src, [(_t(2), "a", 10.0)])
        q.processAllAvailable()
    finally:
        q.stop()

    # per-batch push: batch1 -> (a,1),(b,5); batch2 -> (a,10)
    agg = sorted(tuple(r) for r in spark.read.parquet(agg_t).collect())
    assert agg == [("a", 1.0), ("a", 10.0), ("b", 5.0)]
    filt = sorted(r.v for r in spark.read.parquet(filt_t).collect())
    assert filt == [5.0, 10.0]


def test_dedup_within_watermark(spark, workdir):
    src = os.path.join(workdir, "src")
    _write(spark, src, [(_t(0), "id1", 1.0), (_t(0), "id1", 1.0),  # dup in-batch
                        (_t(1), "id2", 2.0)])
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    deduped = dedup_within_watermark(stream, ["k"], "ts", "10 minutes")
    q = (deduped.writeStream.format("memory").queryName("dedup_test")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        # redelivery of id1 in a later batch, still inside the watermark
        _write(spark, src, [(_t(2), "id1", 1.0)])
        q.processAllAvailable()
        rows = spark.sql("select k from dedup_test").collect()
    finally:
        q.stop()
    assert sorted(r.k for r in rows) == ["id1", "id2"]
