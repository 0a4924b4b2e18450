"""Table/storage layer: MergeTree-style managed Parquet tables.

Reference: src/Storages/MergeTree/MergeTreeData.h:151 (partitioned,
sorted, immutable parts merged in background). Spark-first: parts are
Parquet directories written with partitionBy + sortWithinPartitions;
FINAL semantics are read-time view rewrites (operators/final.py);
compaction is a batch job applying the same rewrite.
"""

from clickhouse_core_spark.sources.mergetree import (
    MergeTreeTable, Projection, add_projection,
    refresh_projection_with_part, select_aggregate,
)
from clickhouse_core_spark.sources.formats import (
    FORMAT_MAP, read_format, write_format, generate_random,
    read_format_cluster, fuzz_json, fuzz_query,
)
from clickhouse_core_spark.sources.rowformats import (
    encode_rowbinary, read_rowbinary, encode_msgpack, read_msgpack,
    read_tskv, write_tskv, read_json_compact_each_row,
    write_json_compact_each_row, read_regexp, read_values, format_values,
    read_custom_separated, read_npy, write_npy,
    decode_rowbinary, decode_msgpack,
)
from clickhouse_core_spark.sources.nativefmt import (
    encode_native, read_native, decode_native, infer_native_schema,
)
from clickhouse_core_spark.sources.capnproto import (
    encode_capnproto, read_capnproto, decode_capnproto_blob,
)
from clickhouse_core_spark.sources.bsonfmt import (
    encode_bson, decode_bson_blob, read_bson,
)
from clickhouse_core_spark.sources.jsonforms import (
    read_json_document, read_json_columns, read_json_object_each_row,
    read_json_as_string, read_mysql_dump, read_form, read_one, read_null,
    format_markdown, format_vertical, format_sql_insert, format_xml,
    read_template, format_template,
)
from clickhouse_core_spark.sources.external import (
    jdbc_options, external_table, lakehouse_table, LAKEHOUSE_FORMATS,
    mongodb_options, redis_options, mongodb_table, redis_table,
)
from clickhouse_core_spark.sources.engines import (
    SetTable, JoinTable, BufferTable, MemoryTable,
)
from clickhouse_core_spark.sources.system import (
    system_tables, system_columns, system_functions, system_numbers,
    system_one, system_settings, has_column_in_table,
    to_column_type_name, is_nullable_column, dump_column_structure,
    format_prometheus, zeros_table, merge_tree_index, view_if_permitted,
)
from clickhouse_core_spark.sources.policies import (
    RowPolicy, apply_row_policies, CheckConstraint, ConstraintViolation,
    with_check_constraints, validate_constraints,
)

__all__ = ["MergeTreeTable", "Projection", "add_projection",
           "refresh_projection_with_part", "select_aggregate",
           "SetTable", "JoinTable", "BufferTable", "MemoryTable",
           "system_tables", "system_columns", "system_functions",
           "system_numbers", "system_one", "system_settings",
           "zeros_table", "merge_tree_index", "view_if_permitted",
           "has_column_in_table", "to_column_type_name",
           "is_nullable_column", "dump_column_structure",
           "format_prometheus", "FORMAT_MAP", "read_format", "write_format",
           "encode_rowbinary", "read_rowbinary", "encode_msgpack",
           "read_msgpack", "read_tskv", "write_tskv",
           "read_json_compact_each_row", "write_json_compact_each_row",
           "read_regexp", "read_values", "format_values",
           "read_custom_separated", "read_npy", "write_npy",
           "decode_rowbinary", "decode_msgpack",
           "encode_native", "read_native", "decode_native",
           "infer_native_schema",
           "encode_capnproto", "read_capnproto", "decode_capnproto_blob",
           "encode_bson", "decode_bson_blob", "read_bson",
           "read_json_document", "read_json_columns",
           "read_json_object_each_row", "read_json_as_string",
           "read_mysql_dump", "read_form", "read_one", "read_null",
           "format_markdown", "format_vertical", "format_sql_insert",
           "format_xml", "read_template", "format_template",
           "generate_random", "read_format_cluster", "fuzz_json",
           "fuzz_query", "jdbc_options", "external_table",
           "lakehouse_table", "LAKEHOUSE_FORMATS",
           "mongodb_options", "redis_options", "mongodb_table",
           "redis_table",
           "RowPolicy", "apply_row_policies", "CheckConstraint",
           "ConstraintViolation", "with_check_constraints",
           "validate_constraints"]
