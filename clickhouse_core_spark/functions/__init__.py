"""ClickHouse-SQL scalar function surface re-expressed as Spark Columns.

``CH_FUNCTIONS`` maps reference function names (reference
src/Functions/, ~1281 registrations — SURVEY.md §2.8) to callables
returning a pyspark Column. Everything stays in built-in JVM
expressions (whole-stage codegen); nothing here drops to Python UDFs.

Usage:
    from clickhouse_core_spark.functions import ch
    df.select(ch.toStartOfMonth(F.col("d")), ch.domain(F.col("url")))
"""

from clickhouse_core_spark.functions.registry import CH_FUNCTIONS, ch

__all__ = ["CH_FUNCTIONS", "ch"]
