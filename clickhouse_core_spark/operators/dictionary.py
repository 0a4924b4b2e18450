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


# CH type name -> Spark carrier for the typed dictGet<T>[OrDefault]
# family (UInt64 -> decimal(20,0), IP/UUID -> canonical strings:
# SURVEY §1.2); covers dictGetInt8..dictGetUUID + OrDefault forms.
DICT_GET_TYPES = {
    "Int8": "tinyint", "Int16": "smallint", "Int32": "int", "Int64": "bigint",
    "UInt8": "smallint", "UInt16": "int", "UInt32": "bigint",
    "UInt64": "decimal(20,0)", "Float32": "float", "Float64": "double",
    "Date": "date", "DateTime": "timestamp", "String": "string",
    "UUID": "string", "IPv4": "string", "IPv6": "string",
}


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


    def get_typed(self, df: DataFrame, type_name: str,
                  attrs: Mapping[str, str],
                  on: Mapping[str, str] | None = None,
                  defaults: Mapping[str, object] | None = None) -> DataFrame:
        """Typed dictGet<T>/dictGet<T>OrDefault family (reference
        src/Functions/FunctionsExternalDictionaries.h registrations:
        dictGetInt8..dictGetUInt64, Float32/64, Date, DateTime, String,
        UUID, IPv4/IPv6 + their OrDefault forms): the generic broadcast
        lookup with the result cast to the requested carrier type.
        ``type_name`` is the CH type name, e.g. "Int32"."""
        spark_t = DICT_GET_TYPES[type_name]
        out = self.get(df, attrs, on=on, defaults=defaults)
        for col in attrs.values():
            out = out.withColumn(col, F.col(col).try_cast(spark_t))
        return out

    def get_or_null(self, df: DataFrame, attrs: Mapping[str, str],
                    on: Mapping[str, str] | None = None) -> DataFrame:
        """dictGetOrNull: NULL on missing key — the generic lookup's
        default behavior, named for parity."""
        return self.get(df, attrs, on=on)

    def get_children(self, df: DataFrame, key_col: str, parent_col: str,
                     out_col: str = "children") -> DataFrame:
        """dictGetChildren (HierarchyDictionariesUtils.h): direct
        children of each key — one broadcast reverse-lookup join against
        the parent->keys aggregation of the dictionary."""
        key = self.key_cols[0]
        kids = (self.source
                .groupBy(F.col(parent_col).cast("long").alias("__p"))
                .agg(F.array_sort(F.collect_list(F.col(key).cast("long")))
                     .alias("__kids")))
        out = (df.join(F.broadcast(kids),
                       df[key_col].cast("long") == kids["__p"], "left")
               .withColumn(out_col, F.coalesce(
                   F.col("__kids"), F.array().cast("array<bigint>")))
               .drop("__p", "__kids"))
        return out

    def get_descendants(self, df: DataFrame, key_col: str, parent_col: str,
                        out_col: str = "descendants",
                        max_depth: int = 10) -> DataFrame:
        """dictGetDescendants: all transitive children, unrolled as
        ``max_depth`` broadcast expansion joins (same shallow-dimension
        contract as get_hierarchy)."""
        key = self.key_cols[0]
        kids = (self.source
                .groupBy(F.col(parent_col).cast("long").alias("__p"))
                .agg(F.collect_list(F.col(key).cast("long")).alias("__kids")))
        kids = F.broadcast(kids)
        out = (df.withColumn(out_col, F.array().cast("array<bigint>"))
               .withColumn("__frontier", F.array(F.col(key_col).cast("long"))))
        for _ in range(max_depth):
            expanded = (out.select("*", F.explode_outer("__frontier").alias("__f"))
                        .join(kids, F.col("__f") == kids["__p"], "left")
                        .drop("__p"))
            grp = [c for c in out.columns if c not in ("__frontier",)]
            out = (expanded.groupBy(*grp)
                   .agg(F.array_distinct(F.flatten(F.collect_list(
                       F.coalesce(F.col("__kids"),
                                  F.array().cast("array<bigint>")))))
                       .alias("__next")))
            out = (out.withColumn(out_col, F.array_distinct(
                       F.concat(F.col(out_col), F.col("__next"))))
                   .withColumn("__frontier", F.col("__next"))
                   .drop("__next"))
        return out.withColumn(out_col, F.array_sort(out_col)) \
                  .drop("__frontier")


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
