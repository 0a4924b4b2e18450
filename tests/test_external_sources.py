"""External-DB / lakehouse / Kafka source mappings (reference
src/Storages/registerStorages.cpp:38-105, src/Storages/Kafka/StorageKafka.h:37).

The driver jars (mysql-connector, delta-spark, spark-sql-kafka) are
deploy-time artifacts not present in this container, so these tests pin
the option translation and the shared parse path — the engine-side code
that would run against a real broker/database."""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickhouse_core_spark.sources import jdbc_options, lakehouse_table
from clickhouse_core_spark.streaming import (
    kafka_options, parse_value_stream, file_queue_source)


def test_jdbc_option_translation():
    o = jdbc_options("MySQL", host="db1", database="shop", table="orders",
                     user="u", password="p")
    assert o["url"] == "jdbc:mysql://db1:3306/shop"
    assert o["dbtable"] == "orders" and o["user"] == "u"
    o = jdbc_options("PostgreSQL", host="pg", port=5433, database="d",
                     table="t")
    assert o["url"] == "jdbc:postgresql://pg:5433/d"
    o = jdbc_options("SQLite", database="/tmp/x.db", table="t")
    assert o["url"] == "jdbc:sqlite:/tmp/x.db"
    # ranged parallel read knobs (the at-scale path)
    o = jdbc_options("MySQL", host="h", database="d", table="t",
                     partition_column="id", num_partitions=16,
                     lower_bound=0, upper_bound=1_000_000)
    assert o["partitionColumn"] == "id" and o["numPartitions"] == "16"
    with pytest.raises(ValueError, match="unknown external engine"):
        jdbc_options("Cassandra", table="t")
    with pytest.raises(ValueError, match="explicit JDBC url"):
        jdbc_options("JDBC", table="t")


def test_lakehouse_kind_mapping(spark):
    with pytest.raises(ValueError, match="unknown lakehouse kind"):
        lakehouse_table(spark, "Paimon", "/tmp/x")
    # delta/iceberg formats resolve only with their connector jars; the
    # mapping must at least reach Spark's source lookup (not our code)
    try:
        lakehouse_table(spark, "DeltaLake", "/tmp/nonexistent")
        raise AssertionError("expected failure without delta jar")
    except Exception as e:
        assert "delta" in str(e).lower()


def test_kafka_option_translation():
    o = kafka_options("b1:9092,b2:9092", "events", group_name="g1")
    assert o["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert o["subscribe"] == "events"
    assert o["kafka.group.id"] == "g1"
    assert o["startingOffsets"] == "earliest"


def test_parse_value_stream_batch_semantics(spark):
    # the parse stage works identically on batch frames (same exprs)
    schema = T.StructType([T.StructField("k", T.LongType()),
                           T.StructField("v", T.StringType())])
    df = spark.createDataFrame(
        [(json.dumps({"k": 1, "v": "a"}),), (json.dumps({"k": 2, "v": "b"}),)],
        "value string")
    rows = sorted(tuple(r) for r in parse_value_stream(df, "JSONEachRow", schema).collect())
    assert rows == [(1, "a"), (2, "b")]
    csv = spark.createDataFrame([("3,c",), ("4,d",)], "value string")
    rows = sorted(tuple(r) for r in parse_value_stream(csv, "CSV", schema).collect())
    assert rows == [(3, "c"), (4, "d")]
    raw = parse_value_stream(csv, "LineAsString").collect()
    assert {r["line"] for r in raw} == {"3,c", "4,d"}
    with pytest.raises(NotImplementedError):
        parse_value_stream(df, "CapnProto")


def test_kafka_parse_path_on_file_stream(spark, tmp_path):
    # drive the SAME parse stage through a real streaming source: a
    # file stream supplies the `value` column exactly as Kafka would
    src = tmp_path / "in"
    src.mkdir()
    with open(src / "batch1.txt", "w") as fh:
        for i in range(5):
            fh.write(json.dumps({"k": i, "v": f"x{i}"}) + "\n")
    raw = (spark.readStream.format("text").load(str(src))
           .withColumnRenamed("value", "value"))
    schema = T.StructType([T.StructField("k", T.LongType()),
                           T.StructField("v", T.StringType())])
    parsed = parse_value_stream(raw, "JSONEachRow", schema)
    q = (parsed.writeStream.format("memory").queryName("kafka_parse_t")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)
    out = spark.sql("SELECT * FROM kafka_parse_t ORDER BY k").collect()
    assert [r["k"] for r in out] == [0, 1, 2, 3, 4]
    assert out[3]["v"] == "x3"


def test_file_queue_source_streams_new_files(spark, tmp_path):
    src = tmp_path / "queue"
    src.mkdir()
    with open(src / "a.csv", "w") as fh:
        fh.write("1,one\n2,two\n")
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("name", T.StringType())])
    stream = file_queue_source(spark, str(src), "CSV", schema)
    assert stream.isStreaming
    q = (stream.writeStream.format("memory").queryName("file_queue_t")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)
    rows = sorted(tuple(r) for r in spark.sql("SELECT * FROM file_queue_t").collect())
    assert rows == [(1, "one"), (2, "two")]


def test_jdbc_derby_roundtrip(spark, tmp_path):
    """Real end-to-end JDBC read: Spark bundles the Derby embedded
    driver, so the external_table path runs against an actual database
    (not just option translation)."""
    from clickhouse_core_spark.sources import external_table
    db = str(tmp_path / "derby_db")
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    df = spark.range(10).selectExpr("id", "CAST(id * 1.5 AS DOUBLE) AS v")
    (df.write.format("jdbc").option("url", f"jdbc:derby:{db};create=true")
     .option("dbtable", "t_rt").option("driver", driver)
     .mode("overwrite").save())
    back = external_table(spark, "JDBC", url=f"jdbc:derby:{db}",
                          table="t_rt", driver=driver)
    rows = sorted((r["id"], r["v"]) for r in back.collect())
    assert rows == [(i, i * 1.5) for i in range(10)]


def test_mongodb_options_mapping():
    from clickhouse_core_spark.sources import mongodb_options
    o = mongodb_options(host="m1", database="shop", collection="orders",
                        user="u", password="p")
    assert o["connection.uri"] == "mongodb://u:p@m1:27017"
    assert (o["database"], o["collection"]) == ("shop", "orders")
    # explicit uri passthrough + extra options stringified
    o2 = mongodb_options(uri="mongodb://rs0/;rs1/", database="d",
                         collection="c", sampleSize=500)
    assert o2["connection.uri"].startswith("mongodb://rs0")
    assert o2["sampleSize"] == "500"
    with pytest.raises(ValueError, match="host or an explicit uri"):
        mongodb_options(database="d", collection="c")


def test_redis_options_mapping():
    from clickhouse_core_spark.sources import redis_options
    o = redis_options(table="dim_user", host="r1", port=6380, db_index=2,
                      password="s3c", key_column="user_id")
    assert o == {"table": "dim_user", "host": "r1", "port": "6380",
                 "dbNum": "2", "auth": "s3c", "key.column": "user_id"}
    with pytest.raises(ValueError, match="needs a host"):
        redis_options(table="t")
