"""Query frontend: ClickHouse-SQL dialect -> Spark SQL translation.

Reference lifecycle (SURVEY.md §3): parse (src/Parsers/ParserQuery.h) ->
analyze/rewrite (src/Analyzer/QueryTreePassManager.cpp) -> plan. On
Spark the analyzer/optimizer/executor are Catalyst; the genuinely new
work is the dialect frontend that rewrites ClickHouse SQL surface forms
into Spark SQL equivalents.
"""

from clickhouse_core_spark.plans.frontend import (
    ch_sql, translate_ch_sql, apply_date_preimage, register_mergetree_sql,
    create_table_sql, system_query_log, clear_query_log)
from clickhouse_core_spark.plans.routing import SummaryRouter, Summary, build_summary
from clickhouse_core_spark.plans.kql import kql
from clickhouse_core_spark.plans.prql import prql

__all__ = ["ch_sql", "translate_ch_sql", "apply_date_preimage",
           "register_mergetree_sql", "create_table_sql",
           "SummaryRouter", "Summary", "build_summary", "kql", "prql",
           "system_query_log", "clear_query_log"]
