"""Dictionaries + range joins.

Reference:
- external dictionaries with dictGet/dictHas/dictGetOrDefault lookups
  (reference src/Dictionaries/FlatDictionary.h, functions
  src/Functions/FunctionsExternalDictionaries.h:56-61);
- range_hashed dictionaries keyed by (key, range) — lookup by key +
  point-in-range (reference src/Dictionaries/RangeHashedDictionary.h).

Spark mapping: a dictionary IS a broadcast DataFrame; dictGet is a
broadcast equi-join (the reference's DirectJoin does exactly this
against the dictionary store). The range variant buckets the ranges so
the join stays an equi-join on (key, bucket) instead of a
BroadcastNestedLoop — the standard scalable range-join rewrite.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Dictionary:
    """dictGet / dictHas over a key->attributes dimension table."""

    def __init__(self, source: DataFrame, key_cols: Sequence[str]):
        self.source = source
        self.key_cols = list(key_cols)

    def get(self, df: DataFrame, attrs: Mapping[str, str],
            on: Mapping[str, str] | None = None,
            defaults: Mapping[str, object] | None = None) -> DataFrame:
        """dictGet: add ``attrs`` (dict-column -> output-name) to ``df``
        by broadcast lookup.  ``on`` maps df columns to dict key columns
        (defaults to same names).  Missing keys yield NULL, or
        ``defaults`` when given (dictGetOrDefault)."""
        on = dict(on) if on else {k: k for k in self.key_cols}
        dim = self.source.select(
            *[F.col(k).alias(f"__dk_{k}") for k in self.key_cols],
            *[F.col(src).alias(out) for src, out in attrs.items()])
        cond = None
        for df_col, dict_col in on.items():
            c = df[df_col] == dim[f"__dk_{dict_col}"]
            cond = c if cond is None else cond & c
        out = df.join(F.broadcast(dim), cond, "left") \
                .drop(*[f"__dk_{k}" for k in self.key_cols])
        if defaults:
            for col, dv in defaults.items():
                out = out.withColumn(col, F.coalesce(F.col(col), F.lit(dv)))
        return out

    def has(self, df: DataFrame, on: Mapping[str, str] | None = None,
            flag: str = "dict_has") -> DataFrame:
        """dictHas: boolean membership flag via the same broadcast join."""
        on = dict(on) if on else {k: k for k in self.key_cols}
        dim = self.source.select(
            *[F.col(k).alias(f"__dk_{k}") for k in self.key_cols]).distinct() \
            .withColumn("__hit", F.lit(1))
        cond = None
        for df_col, dict_col in on.items():
            c = df[df_col] == dim[f"__dk_{dict_col}"]
            cond = c if cond is None else cond & c
        return (df.join(F.broadcast(dim), cond, "left")
                .withColumn(flag, F.col("__hit").isNotNull().cast("int"))
                .drop("__hit", *[f"__dk_{k}" for k in self.key_cols]))


    def get_hierarchy(self, df: DataFrame, key_col: str, parent_col: str,
                      out_col: str = "hierarchy",
                      max_depth: int = 10) -> DataFrame:
        """dictGetHierarchy (reference
        src/Dictionaries/HierarchyDictionariesUtils.h): the ancestor
        chain [key, parent, grandparent, ...] following ``parent_col``
        in the dictionary until NULL.

        Unrolled as ``max_depth`` broadcast joins (hierarchies are
        shallow dimension data; each hop is a map-side lookup, no
        shuffle of ``df``)."""
        key = self.key_cols[0]
        dim = self.source.select(F.col(key).cast("long").alias("__k"),
                                 F.col(parent_col).cast("long").alias("__p"))
        dim = F.broadcast(dim)
        out = (df.withColumn(out_col, F.array(F.col(key_col).cast("long")))
               .withColumn("__cur", F.col(key_col).cast("long")))
        for _ in range(max_depth):
            out = (out.join(dim, out["__cur"] == dim["__k"], "left")
                   .withColumn(out_col,
                               F.when(F.col("__p").isNotNull(),
                                      F.concat(F.col(out_col),
                                               F.array(F.col("__p"))))
                               .otherwise(F.col(out_col)))
                   .withColumn("__cur", F.col("__p"))
                   .drop("__k", "__p"))
        return out.drop("__cur")

    def is_in(self, df: DataFrame, key_col: str, parent_col: str,
              ancestor, flag: str = "dict_is_in",
              max_depth: int = 10) -> DataFrame:
        """dictIsIn(child, ancestor) (reference
        src/Functions/dictGet...; hierarchy membership): 1 when
        ``ancestor`` appears in the child's ancestor chain."""
        anc = F.lit(ancestor) if not isinstance(ancestor, Column) else ancestor
        out = self.get_hierarchy(df, key_col, parent_col,
                                 out_col="__h", max_depth=max_depth)
        return (out.withColumn(flag,
                               F.array_contains(F.col("__h"),
                                                anc.cast("long")).cast("int"))
                .drop("__h"))


def range_join(left: DataFrame, right: DataFrame,
               left_point: str, right_start: str, right_end: str,
               on: Sequence[str] = (),
               bucket_width: float | int | None = None,
               how: str = "inner") -> DataFrame:
    """Join left rows to right intervals containing their point:
    ``right_start <= left_point < right_end`` (+ optional equi-keys).

    Without bucketing Spark plans a BroadcastNestedLoopJoin (all-pairs
    per key).  With ``bucket_width`` both sides get bucket keys —
    intervals explode into ceil(len/width)+1 buckets — and the join is
    an equi-join on (keys, bucket) + exact range filter: shuffle volume
    is linear in rows x avg_interval_width/bucket_width, never
    quadratic.  Pick bucket_width ~ the typical interval length.
    """
    on = list(on)
    if bucket_width is None:
        cond = ((left[left_point] >= right[right_start])
                & (left[left_point] < right[right_end]))
        for k in on:
            cond = cond & (left[k] == right[k])
        return left.join(right, cond, how)

    bw = float(bucket_width)
    l_b = left.withColumn("__bkt", F.floor(F.col(left_point) / bw).cast("long"))
    r_b = right.withColumn(
        "__bkt",
        F.explode(F.sequence(F.floor(F.col(right_start) / bw).cast("long"),
                             F.floor((F.col(right_end)) / bw).cast("long"))))
    joined = l_b.join(r_b, on=on + ["__bkt"], how="inner")
    out = (joined.filter((F.col(left_point) >= F.col(right_start))
                         & (F.col(left_point) < F.col(right_end)))
           .drop("__bkt"))
    return out
