"""system.* introspection tables.

Reference: src/Storages/System/ (StorageSystemTables.cpp,
StorageSystemColumns.cpp, StorageSystemFunctions.cpp,
StorageSystemNumbers.cpp, StorageSystemOne.cpp,
StorageSystemSettings.cpp).  Each maps to Spark catalog / session
metadata rendered as a DataFrame, so ``SELECT ... FROM system.x``
workflows port directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def system_tables(spark: SparkSession,
                  database: str | None = None) -> DataFrame:
    """system.tables analog: catalog tables + temp views."""
    rows = [(t.database or "", t.name, t.tableType or "",
             bool(t.isTemporary))
            for t in spark.catalog.listTables(database)]
    return spark.createDataFrame(
        rows, "database string, name string, engine string, "
              "is_temporary boolean")


def system_columns(spark: SparkSession, table: str) -> DataFrame:
    """system.columns analog for one table/view."""
    rows = [(table, c.name, c.dataType, bool(c.nullable),
             bool(c.isPartition))
            for c in spark.catalog.listColumns(table)]
    return spark.createDataFrame(
        rows, "table string, name string, type string, "
              "is_nullable boolean, is_in_partition_key boolean")


def system_functions(spark: SparkSession) -> DataFrame:
    """system.functions analog: every registered CH-name in the scalar
    registry plus the session's SQL functions."""
    from clickhouse_core_spark.functions import CH_FUNCTIONS
    rows = [(n, "ch_registry") for n in sorted(CH_FUNCTIONS)]
    return spark.createDataFrame(rows, "name string, origin string")


def system_numbers(spark: SparkSession, limit: int,
                   offset: int = 0) -> DataFrame:
    """system.numbers analog (bounded — Spark plans are finite)."""
    return spark.range(offset, offset + limit).select(
        F.col("id").alias("number"))


def system_one(spark: SparkSession) -> DataFrame:
    """system.one analog: single row, ``dummy`` = 0."""
    return spark.range(1).select(F.lit(0).cast("smallint").alias("dummy"))


def zeros_table(spark: SparkSession, limit: int) -> DataFrame:
    """zeros(N) table function (reference
    src/TableFunctions/TableFunctionZeros.cpp): N rows of a single
    UInt8 ``zero`` column — the reference's constant-row generator for
    benchmarking expression throughput."""
    return spark.range(limit).select(
        F.lit(0).cast("smallint").alias("zero"))


def merge_tree_index(spark: SparkSession, table) -> DataFrame:
    """mergeTreeIndex(db, table) analog (reference
    src/TableFunctions/TableFunctionMergeTreeIndex.cpp: exposes the
    primary index / marks of a MergeTree table): one row per (part,
    file, row group) with row counts and the min/max of the sort-key
    columns — the same granule-level metadata the reference surfaces,
    sourced from the parquet footers that ARE this engine's primary
    index.  Footer walk is driver-side O(files), the same planning
    cost a scan pays; the result is metadata, never data."""
    import os
    import pyarrow.parquet as pq
    rows = []
    keys = list(table.order_by)
    for part in table.parts():
        for root, dirs, files in os.walk(part):
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            for f in sorted(files):
                if not f.endswith(".parquet") or f.startswith(("_", ".")):
                    continue
                p = os.path.join(root, f)
                md = pq.ParquetFile(p).metadata
                names = [md.schema.column(i).name
                         for i in range(md.num_columns)]
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    mins, maxs = [], []
                    for k in keys:
                        if k in names:
                            st = g.column(names.index(k)).statistics
                            mins.append(str(st.min) if st else None)
                            maxs.append(str(st.max) if st else None)
                        else:
                            mins.append(None)
                            maxs.append(None)
                    rows.append((os.path.basename(part), p, rg,
                                 g.num_rows, g.total_byte_size,
                                 ",".join(m or "" for m in mins),
                                 ",".join(m or "" for m in maxs)))
    return spark.createDataFrame(
        rows, "part_name string, file string, row_group int, "
              "rows bigint, bytes bigint, min_key string, max_key string")


def view_if_permitted(spark: SparkSession, query: str,
                      permitted: bool, else_schema) -> DataFrame:
    """viewIfPermitted(SELECT ... ELSE null('schema')) analog
    (reference src/TableFunctions/TableFunctionViewIfPermitted.cpp):
    run the view query when the caller is permitted, otherwise an
    empty table of the ELSE schema — composes with sources/policies.py
    row policies for the permission decision."""
    if permitted:
        return spark.sql(query)
    return spark.createDataFrame([], else_schema)


def system_settings(spark: SparkSession) -> DataFrame:
    """system.settings analog: the session's runtime SQL conf."""
    items = sorted(spark.sparkContext.getConf().getAll())
    runtime = []
    for k in ("spark.sql.shuffle.partitions", "spark.sql.ansi.enabled",
              "spark.sql.session.timeZone",
              "spark.sql.adaptive.enabled"):
        try:
            runtime.append((k, spark.conf.get(k)))
        except Exception:
            pass
    seen = {k for k, _ in runtime}
    rows = runtime + [(k, v) for k, v in items if k not in seen]
    return spark.createDataFrame(rows, "name string, value string")


def has_column_in_table(spark: SparkSession, table: str,
                        column: str) -> bool:
    """hasColumnInTable analog (src/Functions/hasColumnInTable.cpp) —
    catalog metadata, so a plan-time bool."""
    return any(c.name == column for c in spark.catalog.listColumns(table))


def to_column_type_name(df: DataFrame, column: str) -> str:
    """toColumnTypeName analog: the column's Spark type name."""
    return df.schema[column].dataType.simpleString()


def is_nullable_column(df: DataFrame, column: str) -> bool:
    """isNullable analog (schema metadata)."""
    return bool(df.schema[column].nullable)


def dump_column_structure(df: DataFrame, column: str) -> str:
    """dumpColumnStructure analog: type + nullability rendering."""
    f = df.schema[column]
    return f"{f.name} {f.dataType.simpleString()}" + \
        (" NULL" if f.nullable else " NOT NULL")


def format_prometheus(df: DataFrame, max_rows: int = 10000) -> str:
    """CH `Prometheus` output format (src/Processors/Formats/Impl/
    PrometheusTextOutputFormat.cpp): text exposition from rows with
    columns ``name``, ``value`` and optional ``help``, ``type``,
    ``labels`` (map<string,string>).  Driver-side display helper like
    the Markdown/Vertical renderers."""
    from .jsonforms import _collect_bounded
    rows = _collect_bounded(df, max_rows)
    cols = set(df.columns)
    if not {"name", "value"} <= cols:
        raise ValueError("Prometheus format needs 'name' and 'value'")
    out = []
    seen_meta = set()
    for r in rows:
        name = r["name"]
        if name not in seen_meta:
            if "help" in cols and r["help"]:
                out.append(f"# HELP {name} {r['help']}")
            if "type" in cols and r["type"]:
                out.append(f"# TYPE {name} {r['type']}")
            seen_meta.add(name)
        label_txt = ""
        if "labels" in cols and r["labels"]:
            items = ",".join(f'{k}="{v}"'
                             for k, v in sorted(r["labels"].items()))
            label_txt = "{" + items + "}"
        out.append(f"{name}{label_txt} {r['value']}")
    return "\n".join(out) + "\n"
