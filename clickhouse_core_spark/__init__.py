"""clickhouse_core_spark — a PySpark-native analytics engine.

A from-scratch Spark-first re-expression of the query/data-processing
capabilities of the reference engine (rohan-flutterint/ClickHouse-core,
a ClickHouse fork): relational operators, scalar/aggregate/window
functions, MergeTree-style storage layout, streaming windows, and
large-scale training-data pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing).

Design principles (see SURVEY.md):
- Declare logical plans with the DataFrame/SQL API; let Catalyst+Tungsten
  pick physical strategy (pushdown, pruning, AQE, codegen).
- Broadcast small dimensions, pre-aggregate before shuffles, keep
  expressions JVM-side; Arrow-batched pandas UDFs only when unavoidable.
- Everything here must hold up on a 1000-executor cluster at 100 TB:
  no driver-side collect loops in operators, no row-at-a-time Python.
"""

from clickhouse_core_spark.session import get_spark
from clickhouse_core_spark.catalog import Catalog

__version__ = "0.1.0"

__all__ = ["get_spark", "Catalog", "__version__"]
