from clickhouse_core_spark.streaming.windows import (
    tumble,
    hop,
    with_watermark,
    windowed_aggregate,
    stateful_sessionize,
)
from clickhouse_core_spark.streaming.materialized import (
    MaterializedViewCascade,
    LiveView,
    RefreshableMaterializedView,
    dedup_within_watermark,
)
from clickhouse_core_spark.streaming.sources import (
    kafka_options,
    kafka_source,
    parse_value_stream,
    file_queue_source,
)

__all__ = ["tumble", "hop", "with_watermark", "windowed_aggregate",
           "stateful_sessionize",
           "MaterializedViewCascade", "LiveView",
           "RefreshableMaterializedView", "dedup_within_watermark",
           "kafka_options", "kafka_source", "parse_value_stream",
           "file_queue_source"]
