"""Materialized-view cascade + streaming ingest dedup.

Reference semantics:
- materialized views fire per insert block and push transformed rows
  into dependent tables (reference src/Storages/StorageMaterializedView.h:14,
  insert->views chain src/Interpreters/InsertDependenciesBuilder.h:30);
- ingest dedup drops re-delivered blocks by token (reference
  src/Processors/Transforms/DeduplicationTokenTransforms.h).

Spark mapping:
- MV cascade = ``foreachBatch`` applying each view's transform to the
  micro-batch and appending to its target — exactly the insert-trigger
  push model (views see only new rows, never a rescan);
- ingest dedup = ``dropDuplicatesWithinWatermark`` on the id column
  (state bounded by the watermark horizon, the same contract as the
  reference's sliding dedup window).
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


class MaterializedViewCascade:
    """A set of named view transforms applied to every micro-batch of a
    source stream, each appending to its own Parquet target."""

    def __init__(self):
        self.views: list[tuple[str, Callable[[DataFrame], DataFrame], str]] = []

    def add_view(self, name: str,
                 transform: Callable[[DataFrame], DataFrame],
                 target_path: str) -> "MaterializedViewCascade":
        self.views.append((name, transform, target_path))
        return self

    def attach(self, stream: DataFrame, checkpoint_dir: str) -> StreamingQuery:
        """Start the cascade: one streaming query whose foreachBatch
        fans the micro-batch out to every view (the reference pushes one
        insert block through all dependent views the same way)."""

        def process(batch: DataFrame, batch_id: int) -> None:
            if batch.isEmpty():
                return
            # persist: each view re-reads the same micro-batch
            batch.persist()
            try:
                for _name, transform, target in self.views:
                    transform(batch).write.mode("append").parquet(target)
            finally:
                batch.unpersist()

        return (stream.writeStream
                .option("checkpointLocation", checkpoint_dir)
                .foreachBatch(process)
                .start())


def dedup_within_watermark(stream: DataFrame, id_cols: Sequence[str],
                           ts_col: str, delay: str) -> DataFrame:
    """Exactly-once-per-id ingest within the watermark horizon:
    re-delivered rows with the same id are dropped while their window is
    still within ``delay`` of the max observed event time."""
    return (stream.withWatermark(ts_col, delay)
            .dropDuplicatesWithinWatermark(list(id_cols)))


class LiveView:
    """StorageLiveView analog (reference
    src/Storages/LiveView/StorageLiveView.cpp: a stored result
    snapshot plus a monotonically increasing ``_version`` ephemeral
    column — StorageLiveView.cpp:237; watchers receive a new
    (result, _version) pair only when an insert CHANGES the result).

    Spark mapping: ``refresh()`` re-runs the defining query and
    atomically writes a new parquet snapshot directory; the version
    bumps ONLY when the order-independent content hash of the result
    changes, mirroring the reference's hash-gated version bump.
    Readers (``read()``) always see a complete snapshot + _version —
    snapshot isolation for free from immutable directories."""

    def __init__(self, spark, path: str, query_fn: Callable[[], DataFrame],
                 keep_versions: int = 2):
        import os
        self.spark = spark
        self.path = path
        self.query_fn = query_fn
        self.keep_versions = max(1, keep_versions)
        os.makedirs(path, exist_ok=True)
        self._meta_path = os.path.join(path, "_live_view.json")
        self._load_meta()

    def _load_meta(self) -> None:
        import json
        import os
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as fh:
                m = json.load(fh)
            self.version, self._hash = m["version"], m["hash"]
        else:
            self.version, self._hash = 0, None

    def _save_meta(self) -> None:
        import json
        with open(self._meta_path, "w") as fh:
            json.dump({"version": self.version, "hash": self._hash}, fh)

    @staticmethod
    def _content_hash(df: DataFrame):
        from pyspark.sql import functions as F
        row = df.select(F.xxhash64(*df.columns).alias("__h")) \
                .agg(F.expr("bit_xor(__h)").alias("x"),
                     F.count("*").alias("n")).first()
        return f"{row['x']}:{row['n']}"

    def refresh(self) -> bool:
        """Re-evaluate; returns True when the result changed (version
        bumped, new snapshot written)."""
        import os
        import shutil
        df = self.query_fn()
        h = self._content_hash(df)
        if h == self._hash:
            return False
        new_version = self.version + 1
        snap = os.path.join(self.path, f"v{new_version:08d}")
        df.write.mode("overwrite").parquet(snap)
        self.version, self._hash = new_version, h
        self._save_meta()
        versions = sorted(d for d in os.listdir(self.path)
                          if d.startswith("v"))
        for old in versions[:-self.keep_versions]:
            shutil.rmtree(os.path.join(self.path, old),
                          ignore_errors=True)
        return True

    def read(self) -> DataFrame:
        """Latest snapshot with the ``_version`` ephemeral column."""
        import os
        from pyspark.sql import functions as F
        if self.version == 0:
            raise ValueError("LiveView has no snapshot yet — refresh()")
        snap = os.path.join(self.path, f"v{self.version:08d}")
        return (self.spark.read.parquet(snap)
                .withColumn("_version",
                            F.lit(self.version).cast("long")))


class RefreshableMaterializedView(LiveView):
    """REFRESH EVERY / AFTER materialized view (reference
    src/Storages/MaterializedView/RefreshSchedule.h: kind EVERY aligns
    refreshes to period boundaries since epoch, kind AFTER schedules
    relative to the previous refresh).  Time is an explicit argument —
    the scheduler tick is the caller's concern (cron/driver loop), so
    tests and replays stay deterministic."""

    def __init__(self, spark, path: str, query_fn, interval_s: float,
                 kind: str = "every", keep_versions: int = 2):
        if kind not in ("every", "after"):
            raise ValueError("kind must be 'every' or 'after'")
        super().__init__(spark, path, query_fn, keep_versions)
        self.interval_s = float(interval_s)
        self.kind = kind
        self._last_refresh: float | None = None

    def due(self, now: float) -> bool:
        if self._last_refresh is None:
            return True
        if self.kind == "after":
            return now >= self._last_refresh + self.interval_s
        # EVERY: aligned period boundaries since epoch
        return (now // self.interval_s) > (self._last_refresh
                                           // self.interval_s)

    def refresh_if_due(self, now: float) -> bool:
        """Refresh when the schedule says so; returns True when a
        refresh ran (even if the content was unchanged — the schedule
        advanced either way)."""
        if not self.due(now):
            return False
        self.refresh()
        self._last_refresh = now
        return True
