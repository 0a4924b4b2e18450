"""FINAL / MergeTree-engine-variant semantics as read-time view rewrites.

The reference merges parts lazily in the background and offers ``FINAL``
to get fully-merged semantics at read time, with per-engine merge rules
(reference src/Processors/Merges/ReplacingSortedTransform.h:15,
SummingSortedTransform.h:15, CollapsingSortedTransform.h:15,
VersionedCollapsingTransform.h:15; engines registered in
src/Storages/MergeTree/registerStorageMergeTree.cpp:931-937).

On Spark the storage is immutable Parquet, so FINAL is a *view rewrite*
over the raw appended rows — each a single shuffle on the sort key, with
partial aggregation where applicable.  The same rewrites double as the
compaction job's transformation (sources/mergetree.py).
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BARE_NAME = re.compile(r"^`?[A-Za-z_][A-Za-z0-9_.]*`?$")


def _key_exprs(df: DataFrame, keys: Sequence[str]):
    """Resolve sort-key strings to groupable columns.  The reference
    allows arbitrary EXPRESSIONS in the engine ORDER BY (sort-key
    expressions are first-class key descriptions,
    reference src/Storages/MergeTree/MergeTreeData.h:151), e.g.
    ``ORDER BY (toDate(b), a)``.  Bare column names pass through;
    expression keys are materialized as hidden ``__sk{i}`` columns so
    window/groupBy partitioning works, and the caller drops them.

    Returns ``(df_with_hidden, effective_key_names, hidden_names)``.
    """
    eff: list[str] = []
    hidden: list[str] = []
    out = df
    for i, k in enumerate(keys):
        k = k.strip()
        bare = k.strip("`")
        if _BARE_NAME.match(k) and bare in df.columns:
            eff.append(bare)
        else:
            h = f"__sk{i}"
            out = out.withColumn(h, F.expr(k))
            eff.append(h)
            hidden.append(h)
    return out, eff, hidden


def replacing_final(df: DataFrame, keys: Sequence[str],
                    version: str | None = None,
                    is_deleted: str | None = None) -> DataFrame:
    """ReplacingMergeTree FINAL: keep one row per key — the one with the
    greatest ``version`` (or an arbitrary-but-deterministic last row when
    no version column is declared).  With ``is_deleted`` (the
    ReplacingMergeTree(version, is_deleted) form,
    src/Processors/Merges/ReplacingSortedAlgorithm.h): a key whose
    surviving row carries is_deleted = 1 is a tombstone and is dropped
    from the FINAL view entirely."""
    df, keys, hidden = _key_exprs(df, list(keys))
    order = [F.col(version).desc()] if version else []
    if "__part_seq" in df.columns:
        # equal versions: the reference keeps the LAST row in the
        # selection — most recent part wins
        order.append(F.col("__part_seq").desc())
    if not order:
        order = [F.lit(1)]
    w = Window.partitionBy(*keys).orderBy(*order)
    out = (df.withColumn("__rn", F.row_number().over(w))
           .filter(F.col("__rn") == 1).drop("__rn", *hidden))
    if is_deleted:
        out = out.filter(F.col(is_deleted).cast("int") != 1)
    return out


def summing_final(df: DataFrame, keys: Sequence[str],
                  sum_cols: Sequence[str] | None = None) -> DataFrame:
    """SummingMergeTree FINAL: sum all numeric non-key columns per key;
    non-numeric, non-key columns take an arbitrary (first) value."""
    orig_fields = list(df.schema.fields)
    df, keys, hidden = _key_exprs(df, list(keys))
    numeric = set(sum_cols) if sum_cols is not None else {
        f.name for f in orig_fields
        if f.name not in keys and f.dataType.typeName() in
        ("long", "integer", "short", "byte", "double", "float", "decimal")}
    aggs = []
    for f_ in orig_fields:
        if f_.name in keys:
            continue
        if f_.name in numeric:
            aggs.append(F.sum(f_.name).alias(f_.name))
        else:
            aggs.append(F.first(f_.name).alias(f_.name))
    return df.groupBy(*keys).agg(*aggs).drop(*hidden)


def collapsing_final(df: DataFrame, keys: Sequence[str], sign: str,
                     order_col: str | None = None,
                     only_positive_sign: bool = True) -> DataFrame:
    """CollapsingMergeTree FINAL: rows carry sign=+1 (state) / -1
    (cancel); pairs cancel out, and a key survives only if the signs
    don't fully cancel.  The surviving row is the latest +1 state —
    "latest" per ``order_col`` when given (the reference uses physical
    insert order, which has no distributed analog), else an arbitrary
    deterministic +1 row.

    GroupBy-sum of the sign plus max_by for the surviving values — one
    shuffle, map-side partial aggregation."""
    orig_cols = list(df.columns)
    sign_t = df.schema[sign].dataType
    df, keys, _hidden = _key_exprs(df, list(keys))
    value_cols = [c for c in orig_cols if c not in keys and c != sign]
    if order_col:
        rank = F.col(order_col)
    else:
        # physical insert order (CollapsingSortedTransform merges in
        # stored order — golden 01764 keeps the last +1 of an
        # equal-count run).  monotonically_increasing_id alone is NOT
        # enough: Spark packs file splits into partitions by file SIZE
        # descending, so partition indices (the id's high bits) don't
        # follow part chronology.  Rank on (file path, id):
        # part-<timestamp> paths sort chronologically, and within one
        # file parquet preserves row order, where the id is monotone.
        df = df.withColumn(
            "__ins_seq",
            F.struct(F.input_file_name().alias("f"),
                     F.monotonically_increasing_id().alias("i")))
        rank = F.col("__ins_seq")
    # CollapsingSortedAlgorithm::insertRows, faithfully:
    #   more +1 than -1            -> keep the LAST +1 state
    #   more -1 than +1            -> keep the FIRST -1 row
    #   equal and last row is +1   -> keep BOTH (first -1, last +1)
    #   equal and last row is -1   -> fully cancelled, keep nothing
    # FINAL READS construct the transform with only_positive_sign =
    # true (ReadFromMergeTree.cpp Collapsing case) — unmatched -1 rows
    # never emit on reads (golden 03290 lone -1 -> count 0); MERGES
    # (MergeTask) keep them in the part.
    row_struct = (F.struct(*[F.col(c) for c in value_cols])
                  if value_cols else F.struct(F.lit(0).alias("__d")))
    g = df.groupBy(*keys).agg(
        F.sum(F.when(F.col(sign) == 1, 1).otherwise(0)).alias("__cp"),
        F.sum(F.when(F.col(sign) == -1, 1).otherwise(0)).alias("__cn"),
        F.max_by(F.col(sign), rank).alias("__ls"),
        F.max_by(row_struct,
                 F.when(F.col(sign) == 1, rank)).alias("__lp"),
        F.min_by(row_struct,
                 F.when(F.col(sign) == -1, rank)).alias("__fn"))
    cp, cn = F.col("__cp"), F.col("__cn")
    cancelled = (cp == cn) & (F.col("__ls") != 1)
    emit_neg = (cn >= cp) & (cn > 0) & ~cancelled
    if only_positive_sign:
        emit_neg = F.lit(False)
    emit_pos = (cp >= cn) & (cp > 0) & ~cancelled
    neg = F.when(emit_neg, F.struct(F.col("__fn").alias("v"),
                                    F.lit(-1).alias("s")))
    pos = F.when(emit_pos, F.struct(F.col("__lp").alias("v"),
                                    F.lit(1).alias("s")))
    rows = F.filter(F.array(neg, pos), lambda x: x.isNotNull())
    out = g.select(*keys, F.explode(rows).alias("__r"))
    sel = []
    for c in orig_cols:
        if c in keys:
            sel.append(F.col(c))
        elif c == sign:
            sel.append(F.col("__r.s").cast(sign_t).alias(sign))
        else:
            sel.append(F.col(f"__r.v.{c}").alias(c))
    return out.select(*sel)


def versioned_collapsing_final(df: DataFrame, keys: Sequence[str],
                               sign: str, version: str) -> DataFrame:
    """VersionedCollapsingMergeTree FINAL
    (src/Processors/Merges/VersionedCollapsingTransform.h:15): +1/-1
    PAIRS cancel per (key, version); every uncancelled row survives —
    |pos−neg| copies of the majority-sign state per version (golden
    00564: two unmatched -1 rows both survive).  One hash shuffle with
    map-side partial aggregation; the copy fan-out is array_repeat +
    explode, JVM-side."""
    orig_cols = list(df.columns)
    sign_t = df.schema[sign].dataType
    df, keys, hidden = _key_exprs(df, list(keys))
    value_cols = [c for c in orig_cols
                  if c not in keys and c not in (sign, version)]
    row_struct = (F.struct(*[F.col(c) for c in value_cols])
                  if value_cols else F.struct(F.lit(0).alias("__d")))
    g = df.groupBy(*keys, version).agg(
        F.sum(F.when(F.col(sign) == 1, 1).otherwise(0)).alias("__p"),
        F.sum(F.when(F.col(sign) == -1, 1).otherwise(0)).alias("__n"),
        F.max_by(row_struct,
                 F.when(F.col(sign) == 1, 1)).alias("__pr"),
        F.max_by(row_struct,
                 F.when(F.col(sign) == -1, 1)).alias("__nr"))
    p, n = F.col("__p"), F.col("__n")
    cnt = F.abs(p - n)
    maj = F.when(p > n, 1).otherwise(-1)
    row = F.when(p > n, F.col("__pr")).otherwise(F.col("__nr"))
    out = (g.filter(cnt > 0)
           .select(*keys, version, maj.alias("__sgn"),
                   F.explode(F.array_repeat(row, cnt.cast("int")))
                   .alias("__r")))
    sel = []
    for c in orig_cols:
        if c in keys or c == version:
            sel.append(F.col(c))
        elif c == sign:
            sel.append(F.col("__sgn").cast(sign_t).alias(sign))
        else:
            sel.append(F.col(f"__r.{c}").alias(c))
    return out.select(*sel).drop(*hidden)


def coalescing_final(df: DataFrame, keys: Sequence[str],
                     order_col: str | None = None) -> DataFrame:
    """CoalescingMergeTree FINAL: per key, each non-key column takes its
    LATEST NON-NULL value across the merged rows — partial-row upserts
    coalesce into one complete row (reference
    src/Processors/Merges/CoalescingSortedTransform.h:14, a
    SummingSortedAlgorithm configured to keep last-non-NULL).

    max_by over a rank that is NULL when the value is NULL: one shuffle
    with map-side partial aggregation, like summing_final."""
    orig_cols = list(df.columns)
    df, keys, hidden = _key_exprs(df, list(keys))
    rank = F.col(order_col) if order_col else F.lit(1)
    aggs = []
    for c in orig_cols:
        if c in keys or c == order_col:
            continue
        aggs.append(F.max_by(c, F.when(F.col(c).isNotNull(), rank)).alias(c))
    if order_col:
        aggs.append(F.max(order_col).alias(order_col))
    return df.groupBy(*keys).agg(*aggs).drop(*hidden)


def graphite_rollup(df: DataFrame, retentions: Sequence[tuple[int, int]],
                    now, path_col: str = "path", time_col: str = "time",
                    value_col: str = "value",
                    version_col: str | None = None,
                    agg: str = "avg") -> DataFrame:
    """GraphiteMergeTree rollup (reference
    src/Processors/Merges/Algorithms/GraphiteRollupSortedAlgorithm.h:10):
    per metric path, rows whose age (relative to ``now``, the merge
    time) reaches a retention rule's ``age`` are re-bucketed to that
    rule's ``precision`` seconds; ``value`` aggregates within the bucket
    with the configured function and ``version`` keeps its max.

    ``retentions``: [(age_seconds, precision_seconds), ...]; the rule
    with the LARGEST age <= row age applies (rules sorted here).  Pass
    ``now`` explicitly (epoch seconds) — determinism over current_time
    keeps the operator oracle-able and re-runnable.

    Pure groupBy: the precision pick is a CASE chain, the bucket is
    integer arithmetic — one shuffle on (path, bucket)."""
    # build the CASE chain in ascending age order: each when() overrides
    # the previous, so the largest matching age ends up winning
    rules = sorted(retentions, key=lambda r: r[0])
    t = F.unix_timestamp(F.col(time_col).cast("timestamp")) \
        if dict(df.dtypes)[time_col] in ("timestamp", "timestamp_ntz") \
        else F.col(time_col).cast("long")
    age = F.lit(int(now)) - t
    prec = F.lit(1)
    for age_s, prec_s in rules:
        prec = F.when(age >= age_s, F.lit(prec_s)).otherwise(prec)
    bucket = (t - (t % prec)).alias("time_bucket")
    agg_fn = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max,
              "any": F.first}[agg]
    aggs = [agg_fn(value_col).alias(value_col)]
    if version_col:
        aggs.append(F.max(version_col).alias(version_col))
    return (df.groupBy(F.col(path_col), bucket).agg(*aggs))
