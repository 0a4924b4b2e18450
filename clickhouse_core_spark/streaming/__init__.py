from clickhouse_core_spark.streaming.windows import (
    tumble,
    hop,
    with_watermark,
    windowed_aggregate,
    stateful_sessionize,
)
from clickhouse_core_spark.streaming.materialized import (
    MaterializedViewCascade,
    dedup_within_watermark,
)

__all__ = ["tumble", "hop", "with_watermark", "windowed_aggregate",
           "stateful_sessionize",
           "MaterializedViewCascade", "dedup_within_watermark"]
