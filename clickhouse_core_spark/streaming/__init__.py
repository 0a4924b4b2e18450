from clickhouse_core_spark.streaming.windows import (
    tumble,
    hop,
    with_watermark,
    windowed_aggregate,
)

__all__ = ["tumble", "hop", "with_watermark", "windowed_aggregate"]
