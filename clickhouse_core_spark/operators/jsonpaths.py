"""JSON introspection aggregates.

Reference: distinctJSONPaths / distinctJSONPathsAndTypes
(src/AggregateFunctions/AggregateFunctionDistinctJSONPaths.cpp) collect
the set of dot-paths (and leaf types) appearing in a JSON column —
schema discovery over semi-structured data.  distinctDynamicTypes is the
same idea over the Dynamic type, which this engine maps to JSON strings
(SURVEY.md §1.2), so these cover it.

Spark shape: a bounded-depth level walk.  Each level parses the current
objects with ``from_json(map<string,string>)`` (dynamic keys — no
literal-path restriction) and explodes one row per key; nested objects
feed the next level.  Depth is a plan-time constant, so the whole walk
is built-in expressions — no UDF.  Leaf types are re-derived from the
stringified values (``from_json`` loses the original quoting), which
conflates e.g. the string "true" with boolean true — documented
heuristic, exact for data whose strings are non-numeric/non-boolean.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# type names follow the reference's JSON type vocabulary
_INT_RE = r"^-?\d+$"
_FLOAT_RE = r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$"


def _jtype(v: Column) -> Column:
    return (F.when(v.isNull(), "Null")
            .when(v.rlike(r"^\{"), "Object")
            .when(v.rlike(r"^\["), "Array")
            .when(v.isin("true", "false"), "Bool")
            .when(v.rlike(_INT_RE), "Int64")
            .when(v.rlike(_FLOAT_RE), "Float64")
            .otherwise("String"))


def distinct_json_paths(df: DataFrame, json_col: str,
                        keys: Sequence[str] = (), max_depth: int = 3,
                        with_types: bool = False) -> DataFrame:
    """Distinct dot-paths (one output row per path) per key group; with
    ``with_types`` each (path, type) pair is a row.  Paths deeper than
    ``max_depth`` report their level-``max_depth`` prefix as Object."""
    keys = list(keys)
    frontier = df.select(*keys, F.lit("").alias("__pfx"),
                         F.col(json_col).alias("__v"))
    levels = []
    for depth in range(max_depth):
        kv = (frontier
              .select(*keys, "__pfx",
                      F.explode(F.from_json("__v", "map<string,string>"))
                      .alias("__k", "__v"))
              .select(*keys,
                      F.when(F.col("__pfx") == "", F.col("__k"))
                      .otherwise(F.concat_ws(".", "__pfx", "__k"))
                      .alias("__pfx"),
                      "__v"))
        # coalesce: rlike(NULL) is NULL and would silently drop
        # null-valued keys from BOTH branches of the filter pair
        is_obj = F.coalesce(F.col("__v").rlike(r"^\{"), F.lit(False))
        last = depth == max_depth - 1
        levels.append(kv if last else kv.filter(~is_obj))
        if not last:
            frontier = kv.filter(is_obj)

    all_kv = levels[0]
    for lv in levels[1:]:
        all_kv = all_kv.unionByName(lv)
    cols = [F.col("__pfx").alias("path")]
    if with_types:
        cols.append(_jtype(F.col("__v")).alias("jtype"))
    return all_kv.select(*keys, *cols).distinct()
