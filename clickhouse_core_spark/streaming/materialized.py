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
