"""User-defined function surface.

Reference (§2.10): SQL lambda UDFs macro-expand in the query tree
(src/Functions/UserDefined/UserDefinedSQLFunctionFactory.h); executable
UDFs stream rows through an external process
(src/Functions/UserDefined/UserDefinedExecutableFunction.h); table
functions come from C++ (src/TableFunctions/).

Spark mapping:
- SQL lambda UDF  -> a python function Column -> Column, registered in
  our function registry (macro expansion happens at plan build, same
  as the reference's query-tree substitution);
- executable UDF  -> Arrow-batched pandas_udf (the process boundary the
  reference crosses per block, Spark crosses per Arrow batch — same
  shape, faster transport);
- executable table function -> Python UDTF (Spark 3.5+) / mapInArrow.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

# registry of SQL-lambda-style UDFs: name -> Column-level callable
_SQL_UDFS: dict[str, Callable[..., Column]] = {}


def create_function(name: str, fn: Callable[..., Column]) -> None:
    """CREATE FUNCTION name AS (args) -> expr — macro registration.
    The callable takes/returns Columns, so calls inline into the plan
    (no execution boundary, exactly like the reference's substitution).
    """
    _SQL_UDFS[name] = fn


def call_function(name: str, *args) -> Column:
    if name not in _SQL_UDFS:
        raise KeyError(f"unknown SQL UDF {name!r}")
    return _SQL_UDFS[name](*args)


def register_executable_udf(spark: SparkSession, name: str,
                            batch_fn: Callable[[pd.Series], pd.Series],
                            return_type: str) -> None:
    """Executable-UDF analog: ``batch_fn`` receives a pandas Series per
    Arrow batch (the reference feeds blocks to a child process via
    stdin; Arrow batches are the Spark-native equivalent).  Registered
    for both DataFrame and spark.sql use."""
    pudf = F.pandas_udf(batch_fn, returnType=return_type)
    spark.udf.register(name, pudf)


def register_python_udtf(spark: SparkSession, name: str, cls,
                         return_type: str) -> None:
    """Executable-table-function analog via Python UDTF (Spark 3.5+)."""
    from pyspark.sql.functions import udtf
    spark.udtf.register(name, udtf(cls, returnType=return_type))
