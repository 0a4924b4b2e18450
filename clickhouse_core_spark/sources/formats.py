"""Format sources/sinks + generated sources.

Reference: ~90 input / ~60 output formats registered in
src/Formats/registerFormats.cpp:26-110; table functions numbers /
generate_series / generateRandom
(src/TableFunctions/registerTableFunctions.h:10-22).

Spark mapping: the built-in DataFrameReader/Writer formats cover the
mainstream set (Parquet, ORC, CSV/TSV, JSON(EachRow), Avro, text);
RowBinary(+WithNames/+WithNamesAndTypes), MsgPack, TSKV,
JSONCompactEachRow(+WithNames), Values, Regexp and CustomSeparated live
in rowformats.py; Native (incl. LowCardinality/Enum) in nativefmt.py;
CapnProto flat structs in capnproto.py; BSONEachRow in bsonfmt.py; the
JSON document family, MySQLDump, Form, Template, Null/One and the
display renderers in jsonforms.py.  Only server wire protocols
(MySQLWire/PostgreSQLWire/ODBCDriver2) and DWARF remain out of scope —
documented, not silently dropped.  generateRandom maps to spark.range +
per-type column generators (deterministic under a seed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# CH format name -> (spark format, reader options)
FORMAT_MAP: dict = {
    "Parquet": ("parquet", {}),
    "ORC": ("orc", {}),
    "CSV": ("csv", {"header": "false"}),
    "CSVWithNames": ("csv", {"header": "true"}),
    "TSV": ("csv", {"sep": "\t", "header": "false"}),
    "TabSeparated": ("csv", {"sep": "\t", "header": "false"}),
    "TSVWithNames": ("csv", {"sep": "\t", "header": "true"}),
    "JSONEachRow": ("json", {}),
    "NDJSON": ("json", {}),
    "JSONLines": ("json", {}),
    "Avro": ("avro", {}),
    "LineAsString": ("text", {}),
    "Raw": ("text", {}),
    # Hive default text serde: \x01 field separator, \N nulls
    # (src/Processors/Formats/Impl/HiveTextRowInputFormat.cpp)
    "HiveText": ("csv", {"sep": "\x01", "header": "false",
                         "nullValue": "\\N"}),
}


def read_format(spark: SparkSession, path: str, ch_format: str,
                schema=None, **extra) -> DataFrame:
    """file(path, format) table function analog."""
    if ch_format in ("Arrow", "ArrowStream"):
        return read_arrow(spark, path, schema=schema,
                          stream=(ch_format == "ArrowStream"))
    if ch_format in ("Protobuf", "ProtobufList"):
        from clickhouse_core_spark.sources.protobuf import read_protobuf
        if schema is None:
            raise ValueError("Protobuf reading needs an explicit schema")
        return read_protobuf(spark, path, schema, **extra)
    if ch_format.startswith("RowBinary"):
        from clickhouse_core_spark.sources.rowformats import read_rowbinary
        if schema is None:
            raise ValueError("RowBinary reading needs an explicit schema")
        return read_rowbinary(
            spark, path, schema,
            with_names=ch_format in ("RowBinaryWithNames",
                                     "RowBinaryWithNamesAndTypes"),
            with_types=ch_format == "RowBinaryWithNamesAndTypes",
            with_defaults=ch_format == "RowBinaryWithDefaults")
    if ch_format in ("JSON", "JSONCompact", "JSONStrings",
                     "JSONCompactStrings"):
        from clickhouse_core_spark.sources.jsonforms import (
            read_json_document)
        if schema is None:
            raise ValueError(f"{ch_format} reading needs an explicit schema")
        return read_json_document(
            spark, path, schema,
            compact=ch_format in ("JSONCompact", "JSONCompactStrings"),
            strings=ch_format in ("JSONStrings", "JSONCompactStrings"))
    if ch_format == "RawBLOB":
        from clickhouse_core_spark.sources.jsonforms import read_raw_blob
        return read_raw_blob(spark, path, **extra)
    if ch_format in ("JSONColumns", "JSONColumnsWithMetadata",
                     "JSONCompactColumns"):
        from clickhouse_core_spark.sources.jsonforms import (
            read_json_columns)
        if schema is None:
            raise ValueError(f"{ch_format} reading needs an explicit schema")
        return read_json_columns(
            spark, path, schema,
            compact=ch_format == "JSONCompactColumns")
    if ch_format == "JSONObjectEachRow":
        from clickhouse_core_spark.sources.jsonforms import (
            read_json_object_each_row)
        if schema is None:
            raise ValueError(f"{ch_format} reading needs an explicit schema")
        return read_json_object_each_row(spark, path, schema, **extra)
    if ch_format in ("JSONAsString", "JSONAsObject"):
        from clickhouse_core_spark.sources.jsonforms import (
            read_json_as_string)
        return read_json_as_string(spark, path, **extra)
    if ch_format == "MySQLDump":
        from clickhouse_core_spark.sources.jsonforms import read_mysql_dump
        if schema is None:
            raise ValueError("MySQLDump reading needs an explicit schema")
        return read_mysql_dump(spark, path, schema, **extra)
    if ch_format == "Form":
        from clickhouse_core_spark.sources.jsonforms import read_form
        if schema is None:
            raise ValueError("Form reading needs an explicit schema")
        return read_form(spark, path, schema)
    if ch_format == "One":
        from clickhouse_core_spark.sources.jsonforms import read_one
        return read_one(spark)
    if ch_format == "Null":
        from clickhouse_core_spark.sources.jsonforms import read_null
        if schema is None:
            raise ValueError("Null format needs a schema for the empty frame")
        return read_null(spark, schema)
    if ch_format == "Template":
        from clickhouse_core_spark.sources.jsonforms import read_template
        if schema is None or "row_format" not in extra:
            raise ValueError("Template format needs schema + row_format=")
        return read_template(spark, path, schema, extra["row_format"])
    if ch_format == "BSONEachRow":
        from clickhouse_core_spark.sources.bsonfmt import read_bson
        if schema is None:
            raise ValueError("BSONEachRow reading needs an explicit schema")
        return read_bson(spark, path, schema)
    if ch_format == "CapnProto":
        from clickhouse_core_spark.sources.capnproto import read_capnproto
        if schema is None:
            raise ValueError("CapnProto reading needs an explicit schema")
        return read_capnproto(spark, path, schema)
    if ch_format == "Native":
        from clickhouse_core_spark.sources.nativefmt import read_native
        return read_native(spark, path, schema=schema)
    if ch_format == "MsgPack":
        from clickhouse_core_spark.sources.rowformats import read_msgpack
        if schema is None:
            raise ValueError("MsgPack reading needs an explicit schema")
        return read_msgpack(spark, path, schema)
    if ch_format == "TSKV":
        from clickhouse_core_spark.sources.rowformats import read_tskv
        if schema is None:
            raise ValueError("TSKV reading needs an explicit schema")
        return read_tskv(spark, path, schema)
    if ch_format.startswith("JSONCompactEachRow"):
        from clickhouse_core_spark.sources.rowformats import (
            read_json_compact_each_row)
        if schema is None:
            raise ValueError("JSONCompactEachRow needs an explicit schema")
        return read_json_compact_each_row(
            spark, path, schema,
            with_names=ch_format != "JSONCompactEachRow")
    if ch_format == "Values":
        from clickhouse_core_spark.sources.rowformats import read_values
        if schema is None:
            raise ValueError("Values reading needs an explicit schema")
        return read_values(spark, path, schema)
    if ch_format == "Regexp":
        from clickhouse_core_spark.sources.rowformats import read_regexp
        if schema is None or "pattern" not in extra:
            raise ValueError("Regexp format needs schema + pattern=")
        return read_regexp(spark, path, schema, **extra)
    if ch_format == "Npy":
        from clickhouse_core_spark.sources.rowformats import read_npy
        return read_npy(spark, path, **extra)
    if ch_format == "CustomSeparated":
        from clickhouse_core_spark.sources.rowformats import (
            read_custom_separated)
        return read_custom_separated(spark, path, schema=schema, **extra)
    if ch_format not in FORMAT_MAP:
        raise NotImplementedError(
            f"format {ch_format!r} not mapped (see FORMAT_MAP for the "
            f"supported set; exotic row formats are out of scope)")
    fmt, opts = FORMAT_MAP[ch_format]
    reader = spark.read.format(fmt).options(**{**opts, **extra})
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_arrow(spark: SparkSession, path: str, schema=None,
               stream: bool = False) -> DataFrame:
    """Arrow / ArrowStream input format (reference
    src/Processors/Formats/Impl/ArrowBlockInputFormat.h, registered in
    src/Formats/registerFormats.cpp).

    Distributed decode: files ship as binary blobs through the
    `binaryFile` source (one row per file, splittable across executors)
    and each executor opens the IPC payload with pyarrow inside
    mapInArrow — record batches flow back over Arrow with no per-row
    Python cost.  When ``schema`` is omitted, one file's IPC schema is
    read driver-side (footer metadata only, not the data)."""
    import glob as _glob
    import os as _os

    import pyarrow as pa

    from pyspark.sql.pandas.types import from_arrow_schema

    if schema is None:
        pattern = _os.path.join(path, "*") if _os.path.isdir(path) else path
        candidates = sorted(_glob.glob(pattern)) or [path]
        with open(candidates[0], "rb") as fh:
            buf = fh.read()
        opener = pa.ipc.open_stream if stream else pa.ipc.open_file
        schema = from_arrow_schema(opener(pa.BufferReader(buf)).schema)

    blobs = spark.read.format("binaryFile").load(path).select("content")

    def _decode(it):
        for rb in it:
            for blob in rb.column(0).to_pylist():
                opener = pa.ipc.open_stream if stream else pa.ipc.open_file
                reader = opener(pa.BufferReader(blob))
                if stream:
                    yield from reader
                else:
                    for i in range(reader.num_record_batches):
                        yield reader.get_batch(i)

    return blobs.mapInArrow(_decode, schema)


def write_format(df: DataFrame, path: str, ch_format: str,
                 mode: str = "overwrite", **extra) -> None:
    if ch_format not in FORMAT_MAP:
        raise NotImplementedError(f"format {ch_format!r} not mapped")
    fmt, opts = FORMAT_MAP[ch_format]
    df.write.format(fmt).options(**{**opts, **extra}).mode(mode).save(path)


# Portable uniform draw: md5(seed:salt:row) first 15 hex digits as a
# 60-bit integer scaled to [0, 1).  Unlike F.rand(seed) — whose stream
# depends on the PARTITION layout — this is a pure function of
# (seed, salt, row id): identical on any cluster size, any partitioning,
# and exactly re-computable in any SQL engine (the md5_hash60 pattern
# pipeline/sampling.py uses for deterministic sampling).
def _u01(seed: int, salt: int = 0):
    h = F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.lit(str(seed)), F.lit(str(salt)),
        F.col("__i").cast("string"))), 1, 15), 16, 10).cast("long")
    return h.cast("double") / float(1 << 60)


def _randn_portable(seed: int):
    """Box-Muller from two portable uniforms (clamped away from 0)."""
    import math
    u1 = F.greatest(_u01(seed, 1), F.lit(1e-12))
    u2 = _u01(seed, 2)
    return F.sqrt(-2.0 * F.log(u1)) * F.cos(F.lit(2 * math.pi) * u2)


_RANDOM_GEN = {
    T.LongType: lambda seed: F.floor(_u01(seed) * (1 << 40)).cast("long"),
    T.IntegerType: lambda seed: F.floor(_u01(seed) * (1 << 28)).cast("int"),
    T.DoubleType: lambda seed: _randn_portable(seed) * 100.0,
    T.FloatType: lambda seed: (_randn_portable(seed) * 100.0).cast("float"),
    T.BooleanType: lambda seed: _u01(seed) > 0.5,
    T.StringType: lambda seed: F.concat(
        F.lit("s_"), F.floor(_u01(seed) * (1 << 30)).cast("long")
        .cast("string")),
    T.TimestampType: lambda seed: F.timestamp_seconds(
        (F.lit(800000000) + F.floor(_u01(seed) * 200000000)).cast("long")),
    T.DateType: lambda seed: F.date_add(
        F.lit("1995-01-01").cast("date"),
        F.floor(_u01(seed) * 3650).cast("int")),
}


def generate_random(spark: SparkSession, schema: T.StructType | str,
                    n: int, seed: int = 42) -> DataFrame:
    """generateRandom(schema, n) source: deterministic random typed rows
    (reference src/TableFunctions/registerTableFunctions.h:22).

    spark.range(n) + per-column generators — fully distributed, no
    driver-side data."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    df = spark.range(n).toDF("__i")
    for i, field in enumerate(schema.fields):
        dt = field.dataType
        gen = _RANDOM_GEN.get(type(dt))
        if gen is None:
            # parameterized / narrow types map through a carrier
            if isinstance(dt, T.DecimalType):
                gen = (lambda d: lambda seed: (
                    _u01(seed) * 1000.0).cast(d))(dt)
            elif isinstance(dt, (T.ShortType, T.ByteType)):
                hi = 1 << (12 if isinstance(dt, T.ShortType) else 6)
                gen = (lambda h, d: lambda seed: F.floor(
                    _u01(seed) * h).cast(d))(hi, dt)
            elif isinstance(dt, T.TimestampNTZType):
                gen = lambda seed: F.timestamp_seconds(
                    (F.lit(800000000)
                     + F.floor(_u01(seed) * 200000000)).cast("long")
                ).cast("timestamp_ntz")
            elif isinstance(dt, T.ArrayType):
                el = _RANDOM_GEN.get(type(dt.elementType))
                if el is not None:
                    gen = (lambda e: lambda seed: F.array(
                        e(seed), e(seed + 101), e(seed + 202)))(el)
        if gen is None:
            raise NotImplementedError(f"generateRandom: type {dt}")
        df = df.withColumn(field.name, gen(seed + i))
    return df.drop("__i")


# fileCluster(cluster, path, format, ...) (reference
# src/TableFunctions/TableFunctionFileCluster.cpp): distribute the file
# list across a cluster.  Spark's reader IS the cluster distribution —
# split planning assigns files/blocks to executors — so the cluster
# form and the local form share one implementation.
read_format_cluster = read_format


def fuzz_json(spark: SparkSession, template: str, n: int,
              seed: int = 42,
              mutate_probability: float = 0.3) -> DataFrame:
    """fuzzJSON(template, ...) table function (reference
    src/TableFunctions/TableFunctionFuzzJSON.cpp): n structurally
    perturbed variants of a JSON document.  Deterministic analog: a
    splittable hash of (seed, row, path) drives every decision, so the
    output is stable across partitionings and re-runs — same contract
    as generateRandom.  Mutations: integer nudge, string suffix, bool
    flip, occasional key rename — one pandas-batched pass, n rows out
    of spark.range(n)."""
    import json as _json
    import pandas as _pd

    def _h(*parts) -> int:
        x = seed & 0xFFFFFFFFFFFFFFFF
        for p in parts:
            for b in str(p).encode():
                x = ((x ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 33
        return x

    def _mut(v, row, path):
        h = _h(row, path)
        if (h % 1000) / 1000.0 >= mutate_probability:
            return v
        if isinstance(v, bool):
            return not v
        if isinstance(v, int):
            return v + (h % 7) - 3
        if isinstance(v, float):
            return v * (1.0 + ((h % 21) - 10) / 100.0)
        if isinstance(v, str):
            return v + chr(ord('a') + h % 26)
        if isinstance(v, list):
            return [_mut(e, row, f"{path}[{i}]")
                    for i, e in enumerate(v)]
        if isinstance(v, dict):
            out = {}
            for k, e in v.items():
                k2 = (k + chr(ord('a') + _h(row, path, k) % 26)
                      if (_h(row, path, k, "key") % 1000) / 1000.0
                      < mutate_probability / 3 else k)
                out[k2] = _mut(e, row, f"{path}.{k}")
            return out
        return v

    doc = _json.loads(template)

    def batches(it):
        for pdf in it:
            yield _pd.DataFrame({"json": [
                _json.dumps(_mut(doc, int(i), "$"), sort_keys=True)
                for i in pdf["id"]]})

    return spark.range(n).mapInPandas(batches, "json string")


def fuzz_query(spark: SparkSession, query: str, n: int,
               seed: int = 42) -> DataFrame:
    """fuzzQuery(query, ...) table function (reference
    src/TableFunctions/TableFunctionFuzzQuery.cpp): n perturbed
    variants of a SQL query string for parser fuzzing.  Deterministic
    token-level mutations (identifier suffix, number nudge, operator
    swap, clause duplication) keyed by the same splittable hash as
    fuzz_json."""
    import re as _re
    import pandas as _pd

    toks = _re.findall(r"\s+|\w+|[^\w\s]", query)
    swaps = {"=": "!=", "<": "<=", ">": ">=", "AND": "OR", "and": "or"}

    def _h(*parts) -> int:
        x = seed & 0xFFFFFFFFFFFFFFFF
        for p in parts:
            for b in str(p).encode():
                x = ((x ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 33
        return x

    def variant(row: int) -> str:
        out = []
        for i, t in enumerate(toks):
            h = _h(row, i)
            if t.strip() and h % 10 == 0:
                if t in swaps:
                    t = swaps[t]
                elif t.isdigit():
                    t = str(int(t) + h % 5)
                elif t.isidentifier():
                    t = t + ("_f" if h % 3 == 0 else "")
            out.append(t)
        return "".join(out)

    def batches(it):
        for pdf in it:
            yield _pd.DataFrame({"query": [variant(int(i))
                                           for i in pdf["id"]]})

    return spark.range(n).mapInPandas(batches, "query string")


def decode_avro_confluent(df: DataFrame, value_col: str,
                          reader_schema_json: str,
                          accepted_ids=None,
                          out_col: str = "avro") -> DataFrame:
    """AvroConfluent (reference
    src/Processors/Formats/Impl/AvroRowInputFormat.cpp, Confluent wire
    framing): each message is 0x00 magic + 4-byte big-endian schema id
    + Avro binary.  Decodes the payload with ``reader_schema_json``
    (standard Avro schema-evolution contract: writers registered under
    ``accepted_ids`` must resolve to this reader schema); rows whose
    magic/id don't match decode to NULL.  The schema-registry FETCH is
    a deploy-time concern — pass the resolved schema JSON; no registry
    runs in this container.  Needs the spark-avro module (Spark ships
    it as an external jar) — raises with the module name if absent."""
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "AvroConfluent needs the spark-avro module on the "
            "classpath (org.apache.spark:spark-avro)") from e
    payload = F.expr(
        f"substring({value_col}, 6, length({value_col}) - 5)")
    sid = F.conv(F.hex(F.expr(f"substring({value_col}, 2, 4)")),
                 16, 10).cast("long")
    cond = (F.expr(f"substring({value_col}, 1, 1)")
            == F.lit(bytes([0])))
    if accepted_ids is not None:
        cond = cond & sid.isin([int(i) for i in accepted_ids])
    decoded = from_avro(payload, reader_schema_json)
    return df.withColumn("schema_id", sid) \
             .withColumn(out_col, F.when(cond, decoded))
