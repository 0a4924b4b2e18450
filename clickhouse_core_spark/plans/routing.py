"""Summary-table routing: the aggregate-projection analog.

Reference: MergeTree projections are materialized alternative layouts
chosen at plan time when they can answer the query
(src/Processors/QueryPlan/Optimizations/optimizeUseAggregateProjection.cpp).

Spark mapping: maintain pre-aggregated summary tables (plain DataFrames
or MergeTree tables fed by rollup_states) and route a grouped aggregate
to the cheapest summary whose keys cover the query's grouping keys.
Partial sums/counts/mins/maxes re-aggregate losslessly; avg rewrites to
sum/count. At 100 TB this is the difference between scanning the fact
table and scanning a table 10^4x smaller.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# measures we can re-aggregate from partials losslessly
_REAGG = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


class Summary:
    def __init__(self, df: DataFrame, keys: Sequence[str],
                 measures: dict[str, tuple[str, str]]):
        """``measures``: output measure name -> (kind, summary column),
        kind in {'sum','count','min','max'}."""
        self.df = df
        self.keys = list(keys)
        self.measures = dict(measures)

    def covers(self, group_keys: Sequence[str],
               wanted: Sequence[str]) -> bool:
        return (set(group_keys) <= set(self.keys)
                and set(wanted) <= set(self.measures))


class SummaryRouter:
    """Chooses the smallest registered summary that can answer
    groupBy(keys).agg(measures); falls back to the base relation."""

    def __init__(self, base: DataFrame):
        self.base = base
        self.summaries: list[Summary] = []

    def register(self, summary: Summary) -> "SummaryRouter":
        self.summaries.append(summary)
        return self

    def aggregate(self, group_keys: Sequence[str],
                  measures: dict[str, tuple[str, str]]) -> DataFrame:
        """``measures``: output name -> (kind, base column). kind in
        {'sum','count','min','max','avg'}. Routes to a summary when one
        covers the request (avg needs sum + non-null-count partials named
        '<col>__sum'/'<col>__cnt' by convention — build_summary and
        rollup_states emit these).
        """
        group_keys = list(group_keys)
        # avg decomposes into sum+count
        needed: list[str] = []
        for name, (kind, col) in measures.items():
            if kind == "avg":
                # avg must divide by the NON-NULL count (F.avg semantics);
                # __rows would skew the routed answer when col has NULLs
                needed += [f"{col}__sum", f"{col}__cnt"]
            else:
                needed.append(f"{col}__{kind}" if kind != "count" else "__rows")

        for s in sorted(self.summaries, key=lambda s: len(s.keys)):
            if set(group_keys) <= set(s.keys) and \
                    all(n in s.df.columns for n in needed):
                aggs: list[Column] = []
                for name, (kind, col) in measures.items():
                    if kind == "avg":
                        aggs.append((F.sum(f"{col}__sum")
                                     / F.sum(f"{col}__cnt")).alias(name))
                    elif kind == "count":
                        aggs.append(F.sum("__rows").alias(name))
                    else:
                        aggs.append(_REAGG[kind](f"{col}__{kind}").alias(name))
                return s.df.groupBy(*group_keys).agg(*aggs)

        # fallback: base scan
        aggs = []
        for name, (kind, col) in measures.items():
            fn = {"sum": F.sum, "count": F.count, "min": F.min,
                  "max": F.max, "avg": F.avg}[kind]
            aggs.append(fn(col if kind != "count" else "*").alias(name))
        return self.base.groupBy(*group_keys).agg(*aggs)


def build_summary(base: DataFrame, keys: Sequence[str],
                  sum_cols: Sequence[str] = (),
                  min_cols: Sequence[str] = (),
                  max_cols: Sequence[str] = ()) -> Summary:
    """Materialize a partial-aggregate summary over ``keys``."""
    keys = list(keys)
    aggs = [F.count("*").alias("__rows")]
    measures: dict[str, tuple[str, str]] = {"__rows": ("count", "*")}
    for c in sum_cols:
        aggs.append(F.sum(c).alias(f"{c}__sum"))
        measures[f"{c}__sum"] = ("sum", c)
        # non-null count so routed avg = sum/cnt matches F.avg on NULLs
        aggs.append(F.count(c).alias(f"{c}__cnt"))
        measures[f"{c}__cnt"] = ("count_col", c)
    for c in min_cols:
        aggs.append(F.min(c).alias(f"{c}__min"))
        measures[f"{c}__min"] = ("min", c)
    for c in max_cols:
        aggs.append(F.max(c).alias(f"{c}__max"))
        measures[f"{c}__max"] = ("max", c)
    return Summary(base.groupBy(*keys).agg(*aggs), keys, measures)
