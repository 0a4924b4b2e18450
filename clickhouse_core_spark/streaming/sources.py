"""Streaming sources: Kafka / file-queue analogs.

Reference: StorageKafka consumes topics and parses messages with the
table's declared format (src/Storages/Kafka/StorageKafka.h:37,
settings kafka_broker_list / kafka_topic_list / kafka_group_name /
kafka_format); S3Queue / FileLog tail object-store prefixes or
directories the same way.

Spark mapping: ``readStream.format("kafka")`` with the settings
translated 1:1, then a FORMAT-driven value parser — the parser is the
shared, engine-independent piece, so it is factored out and tested on
a file stream (Kafka's broker contract just supplies the ``value``
binary column).  S3Queue/FileLog map to ``readStream`` over a path with
the same FORMAT_MAP options the batch reader uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_core_spark.sources.formats import FORMAT_MAP


def kafka_options(broker_list: str, topic_list: str,
                  group_name: str | None = None,
                  starting_offsets: str = "earliest",
                  **extra) -> dict:
    """CH Kafka engine settings -> Spark Kafka source options
    (kafka_broker_list -> kafka.bootstrap.servers, kafka_topic_list ->
    subscribe, kafka_group_name -> kafka.group.id)."""
    opts = {
        "kafka.bootstrap.servers": broker_list,
        "subscribe": topic_list,
        "startingOffsets": starting_offsets,
    }
    if group_name is not None:
        opts["kafka.group.id"] = group_name
    opts.update({k: str(v) for k, v in extra.items()})
    return opts


def parse_value_stream(df: DataFrame, ch_format: str,
                       schema=None, **fmt_kwargs) -> DataFrame:
    """Parse the ``value`` column of a message stream according to a CH
    format name — the StorageKafka message-parsing stage
    (StorageKafka.h kafka_format setting).  Works on any DataFrame with
    a ``value`` column (binary or string), batch or streaming."""
    v = F.col("value").cast("string")
    if ch_format in ("JSONEachRow", "NDJSON", "JSONLines"):
        if schema is None:
            raise ValueError("JSONEachRow parsing needs an explicit schema")
        return df.select(F.from_json(v, schema).alias("__r")).select("__r.*")
    if ch_format in ("CSV", "TSV", "TabSeparated"):
        if schema is None:
            raise ValueError("CSV parsing needs an explicit schema")
        sep = "," if ch_format == "CSV" else "\t"
        return (df.select(F.from_csv(v, schema.simpleString(),
                                     {"sep": sep}).alias("__r"))
                .select("__r.*"))
    if ch_format in ("Protobuf", "ProtobufSingle"):
        # one message per Kafka value (reference kafka_format=Protobuf,
        # src/Formats/registerFormats.cpp:57-60); JVM from_protobuf when
        # the connector jar + a descriptor are supplied, wire-format
        # fallback otherwise
        from clickhouse_core_spark.sources.protobuf import from_protobuf_column
        return from_protobuf_column(df, "value",
                                    fmt_kwargs.pop("message_name", "Message"),
                                    schema=schema, **fmt_kwargs)
    if ch_format in ("LineAsString", "Raw"):
        return df.select(v.alias("line"))
    raise NotImplementedError(
        f"kafka format {ch_format!r} not mapped (JSONEachRow/CSV/TSV/"
        "Protobuf/LineAsString supported)")


def kafka_source(spark: SparkSession, broker_list: str, topic_list: str,
                 *, group_name: str | None = None,
                 ch_format: str = "JSONEachRow", schema=None,
                 starting_offsets: str = "earliest", **extra) -> DataFrame:
    """StorageKafka analog: subscribe + parse.  Requires the
    spark-sql-kafka connector jar at deploy time (the reference's
    USE_RDKAFKA equivalent); the option mapping and the parse stage are
    the code under test here and are exercised via file streams."""
    raw = (spark.readStream.format("kafka")
           .options(**kafka_options(broker_list, topic_list, group_name,
                                    starting_offsets, **extra))
           .load())
    return parse_value_stream(raw, ch_format, schema)


def file_queue_source(spark: SparkSession, path: str, ch_format: str,
                      schema, **extra) -> DataFrame:
    """S3Queue / FileLog analog: stream new files under a path, parsed
    with the declared format (reference src/Storages/ObjectStorageQueue/,
    src/Storages/FileLog/).  Structured Streaming's file source already
    does exactly-once new-file tracking — the reference's committed-
    offset bookkeeping for free."""
    if ch_format not in FORMAT_MAP:
        raise NotImplementedError(f"format {ch_format!r} not mapped")
    fmt, opts = FORMAT_MAP[ch_format]
    return (spark.readStream.format(fmt).schema(schema)
            .options(**{**opts, **extra}).load(path))
