from clickhouse_core_spark.streaming.windows import (
    tumble,
    hop,
    with_watermark,
    windowed_aggregate,
)
from clickhouse_core_spark.streaming.materialized import (
    MaterializedViewCascade,
    dedup_within_watermark,
)

__all__ = ["tumble", "hop", "with_watermark", "windowed_aggregate",
           "MaterializedViewCascade", "dedup_within_watermark"]
