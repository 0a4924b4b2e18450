"""External database engines and lakehouse readers.

Reference: the storage factory registers external engines —
MySQL / PostgreSQL / SQLite / ODBC / JDBC / MongoDB / Redis
(src/Storages/registerStorages.cpp:60-105) — and lakehouse readers
DeltaLake / Iceberg / Hudi (src/Storages/registerStorages.cpp:38-56).

Spark mapping: every relational engine is one configuration of
``spark.read.format("jdbc")`` (Spark ships the JDBC source; the
driver jar for a given database is a deploy-time artifact on the
cluster classpath, exactly like the reference's USE_MYSQL build flag).
Lakehouse tables are ``spark.read.format("delta" | "iceberg" | "hudi")``
— connector-jar-at-deploy-time again.  The builders below produce the
fully-configured reader so the mapping itself is testable without the
driver jars; ``.load()`` is the only step that needs them.

At 100 TB the JDBC path is for DIMENSION data (predicate pushdown +
``partitionColumn`` ranged parallel reads are configured here); fact
data belongs in parquet/lakehouse where scans scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# CH engine name -> JDBC subprotocol + default port
_JDBC_ENGINES = {
    "MySQL": ("mysql", 3306),
    "PostgreSQL": ("postgresql", 5432),
    "SQLite": ("sqlite", None),
    "JDBC": (None, None),       # raw URL passthrough
    "ODBC": (None, None),       # via a JDBC-ODBC bridge URL
}

LAKEHOUSE_FORMATS = {
    "DeltaLake": "delta",
    "Iceberg": "iceberg",
    "Hudi": "hudi",
}


def jdbc_options(engine: str, *, table: str, host: str | None = None,
                 port: int | None = None, database: str | None = None,
                 user: str | None = None, password: str | None = None,
                 url: str | None = None,
                 partition_column: str | None = None,
                 num_partitions: int | None = None,
                 lower_bound=None, upper_bound=None,
                 **extra) -> dict:
    """Translate a CH external-engine declaration — e.g.
    ``MySQL('host:port', 'db', 'table', 'user', 'password')``
    (src/Storages/StorageMySQL.h) — into Spark JDBC reader options.

    ``partition_column``/``num_partitions``/bounds configure Spark's
    ranged parallel read (N concurrent range queries), the scale knob
    the reference exposes as external_storage_max_read_* settings."""
    if engine not in _JDBC_ENGINES:
        raise ValueError(
            f"unknown external engine {engine!r}; one of {sorted(_JDBC_ENGINES)}")
    sub, default_port = _JDBC_ENGINES[engine]
    if url is None:
        if sub is None:
            raise ValueError(f"{engine} needs an explicit JDBC url")
        if engine == "SQLite":
            url = f"jdbc:sqlite:{database}"
        else:
            url = f"jdbc:{sub}://{host}:{port or default_port}/{database}"
    opts = {"url": url, "dbtable": table}
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if partition_column is not None:
        opts.update({
            "partitionColumn": partition_column,
            "numPartitions": str(num_partitions or 8),
            "lowerBound": str(lower_bound),
            "upperBound": str(upper_bound),
        })
    opts.update({k: str(v) for k, v in extra.items()})
    return opts


def external_table(spark: SparkSession, engine: str, **kw) -> DataFrame:
    """Read an external-DB table (StorageMySQL/PostgreSQL/SQLite/JDBC
    analog).  Requires the database's JDBC driver jar on the cluster
    classpath — the deploy-time equivalent of the reference's USE_MYSQL
    build flag."""
    return spark.read.format("jdbc").options(**jdbc_options(engine, **kw)).load()


def mongodb_options(*, database: str, collection: str,
                    host: str | None = None, port: int = 27017,
                    user: str | None = None, password: str | None = None,
                    uri: str | None = None, **extra) -> dict:
    """Translate a CH ``MongoDB('host:port', 'database', 'collection',
    'user', 'password')`` declaration (src/Storages/StorageMongoDB.h,
    registerStorages.cpp:90-95) into Spark MongoDB-connector reader
    options (``spark.read.format("mongodb")``; connector jar is a
    deploy-time artifact, same contract as the JDBC drivers).

    The connector pushes filters and projections into the aggregation
    pipeline and splits collections by partitioner — the scale story
    matches the JDBC ranged read."""
    if uri is None:
        if host is None:
            raise ValueError("MongoDB needs host or an explicit uri")
        cred = f"{user}:{password}@" if user is not None else ""
        uri = f"mongodb://{cred}{host}:{port}"
    opts = {"connection.uri": uri, "database": database,
            "collection": collection}
    opts.update({k: str(v) for k, v in extra.items()})
    return opts


def redis_options(*, table: str, host: str | None = None, port: int = 6379,
                  db_index: int = 0, password: str | None = None,
                  key_column: str | None = None, **extra) -> dict:
    """Translate a CH ``Redis('host:port', db_index, 'password',
    'primary_key')`` declaration (src/Storages/StorageRedis.h,
    registerStorages.cpp:96-100) into spark-redis reader options
    (``spark.read.format("org.apache.spark.sql.redis")``).

    Redis in the reference is a KEY-VALUE dimension store (direct-join
    source); the Spark analog reads hashes under ``table:*`` keys into a
    DataFrame — broadcast it, exactly like operators.dictionary."""
    if host is None:
        raise ValueError("Redis needs a host")
    opts = {"table": table, "host": host, "port": str(port),
            "dbNum": str(db_index)}
    if password is not None:
        opts["auth"] = password
    if key_column is not None:
        opts["key.column"] = key_column
    opts.update({k: str(v) for k, v in extra.items()})
    return opts


def mongodb_table(spark: SparkSession, **kw) -> DataFrame:
    """Read a MongoDB collection (StorageMongoDB analog); needs the
    mongo-spark connector jar on the classpath."""
    return spark.read.format("mongodb").options(**mongodb_options(**kw)).load()


def redis_table(spark: SparkSession, **kw) -> DataFrame:
    """Read a Redis table (StorageRedis analog); needs the spark-redis
    jar on the classpath."""
    return (spark.read.format("org.apache.spark.sql.redis")
            .options(**redis_options(**kw)).load())


def lakehouse_table(spark: SparkSession, kind: str, path: str,
                    **options) -> DataFrame:
    """Read a Delta/Iceberg/Hudi table (registerStorages.cpp:38-56
    analogs).  Needs the matching connector jar + catalog conf on the
    session; the mapping itself is engine-name -> format string."""
    if kind not in LAKEHOUSE_FORMATS:
        raise ValueError(
            f"unknown lakehouse kind {kind!r}; one of {sorted(LAKEHOUSE_FORMATS)}")
    return (spark.read.format(LAKEHOUSE_FORMATS[kind])
            .options(**{k: str(v) for k, v in options.items()}).load(path))
