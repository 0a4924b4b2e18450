"""Sequence / behavioral analytics aggregates.

Reference semantics:
- windowFunnel  (reference src/AggregateFunctions/AggregateFunctionWindowFunnel.h)
- retention     (reference src/AggregateFunctions/AggregateFunctionRetention.h)
- sequenceMatch (reference src/AggregateFunctions/AggregateFunctionSequenceMatch.h)
- deltaSum      (reference src/AggregateFunctions/AggregateFunctionDeltaSum.h)
- exponentialMovingAverage (reference src/AggregateFunctions/AggregateFunctionExponentialMovingAverage.cpp)
- boundingRatio (reference src/AggregateFunctions/AggregateFunctionBoundingRatio.h)
- maxIntersections / intervalLengthSum
  (reference src/AggregateFunctions/AggregateFunctionMaxIntersections.h,
   AggregateFunctionIntervalLengthSum.h)
- uniqUpTo      (reference src/AggregateFunctions/AggregateFunctionUniqUpTo.h)
- entropy       (reference src/AggregateFunctions/AggregateFunctionEntropy.h)

Spark-first design: the order-independent ones are plain groupBy
compositions (two-level aggregation, window lag chains) that keep
partial aggregation and AQE. The order-*dependent* ones (funnel,
sequence match) fold over a per-key time-sorted event array with
``F.aggregate`` — pure built-in catalyst expressions, no Python in the
hot path. The per-key event list is collected, which is the same state
shape the reference keeps (its funnel state is a sorted (ts, event-bitmap)
vector per group, AggregateFunctionWindowFunnel.h state struct); the
scale contract is therefore identical: keys may be many, one key's
events must fit in memory.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _match_mask(conds: Sequence[Column]) -> Column:
    """Bitmask of which step conditions an event satisfies."""
    mask = F.lit(0)
    for i, c in enumerate(conds):
        mask = mask + F.when(c, F.lit(1 << i)).otherwise(0)
    return mask.cast("long")


def _bit(mask: Column, idx: Column | int) -> Column:
    # F.shiftright requires a literal shift amount; idx here is often a
    # lambda-bound Column (fold position), so test the bit arithmetically.
    # Masks are < 2^30 (condition count), so double precision is exact.
    return (F.floor(mask / F.pow(F.lit(2.0), idx)).cast("long")
            .bitwiseAND(F.lit(1)) == 1)


def window_funnel(df: DataFrame, keys: Sequence[str], ts_col: str,
                  conds: Sequence[Column], window: str | int,
                  alias: str = "level") -> DataFrame:
    """windowFunnel(window)(ts, cond1, ..., condN): per key, the length
    of the longest prefix of the condition chain completed in order
    within ``window`` of the chain's first event.

    ``window`` is seconds (int) or an interval string like '1 hour'.

    Fold over the time-sorted event array: the accumulator is an
    array<long> where slot i holds the chain-start timestamp (epoch
    seconds) of the best chain that has reached level i+1, or null.
    Advancing to level i requires level i-1 reached and
    ``ts - chain_start <= window`` — the reference's semantics
    (AggregateFunctionWindowFunnel.h `getEventLevel`).
    """
    n = len(conds)
    if isinstance(window, str):
        num, unit = window.split()
        mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
                "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}[unit]
        window_s = int(num) * mult
    else:
        window_s = int(window)

    keys = list(keys)
    ev = df.select(*keys,
                   F.unix_timestamp(F.col(ts_col)).alias("__t"),
                   _match_mask(conds).alias("__m"))
    per_key = (ev.filter(F.col("__m") != 0)
               .groupBy(*keys)
               .agg(F.array_sort(F.collect_list(F.struct("__t", "__m"))).alias("__evs")))

    init = F.array_repeat(F.lit(None).cast("long"), n)

    def merge(acc, e):
        # Reference fold (AggregateFunctionWindowFunnel.h getEventLevel):
        # a level-1 event always (re)sets slot 0 to its own timestamp;
        # a level-i event advances when slot i-1 holds a chain start
        # within the window, carrying that chain start forward.  Slots
        # are overwritten, never cleared, so reached levels persist.
        def slot(a, i):
            prev = F.element_at(acc, i)  # element_at is 1-based: acc[i-1]
            start = F.when(_bit(e["__m"], F.lit(0)) & (i == 0), e["__t"])
            advance = F.when((i > 0) & _bit(e["__m"], i) & prev.isNotNull()
                             & ((e["__t"] - prev) <= window_s), prev)
            return F.coalesce(start, advance, a)
        return F.transform(acc, slot)

    folded = per_key.withColumn("__acc", F.aggregate("__evs", init, merge))
    return (folded.withColumn(
                alias,
                F.size(F.filter("__acc", lambda a: a.isNotNull())).cast("int"))
            .drop("__evs", "__acc"))


def retention(df: DataFrame, keys: Sequence[str],
              conds: Sequence[Column],
              prefix: str = "r") -> DataFrame:
    """retention(cond1, ..., condN): per key, r_0 = cond1 ever held;
    r_i = cond1 held AND cond_{i+1} held (reference
    AggregateFunctionRetention.h).  Output: one int column per condition.

    Plain groupBy(max) — fully partial-aggregatable, one shuffle.
    """
    keys = list(keys)
    flags = df.groupBy(*keys).agg(
        *[F.max(F.when(c, 1).otherwise(0)).alias(f"__c{i}")
          for i, c in enumerate(conds)])
    out = flags.withColumn(f"{prefix}_0", F.col("__c0"))
    for i in range(1, len(conds)):
        out = out.withColumn(f"{prefix}_{i}",
                             (F.col("__c0") == 1).cast("int")
                             * (F.col(f"__c{i}") == 1).cast("int"))
    return out.drop(*[f"__c{i}" for i in range(len(conds))])


def sequence_match(df: DataFrame, keys: Sequence[str], ts_col: str,
                   conds: Sequence[Column],
                   alias: str = "matched") -> DataFrame:
    """sequenceMatch('(?1).*(?2)...(?N)')(ts, cond1..condN): true when
    the conditions occur in order (any gaps) in event-time order.

    Subset of the reference pattern language (no time constraints
    ``(?t<=...)`` and no strict adjacency ``.`` — the common '(?i)
    followed by (?j)' form; AggregateFunctionSequenceMatch.h).

    Fold over the sorted event array advancing a matched-prefix counter.
    """
    n = len(conds)
    keys = list(keys)
    ev = df.select(*keys,
                   F.unix_timestamp(F.col(ts_col)).alias("__t"),
                   _match_mask(conds).alias("__m"))
    per_key = (ev.filter(F.col("__m") != 0)
               .groupBy(*keys)
               .agg(F.array_sort(F.collect_list(F.struct("__t", "__m"))).alias("__evs")))

    def merge(acc, e):
        return F.when(acc >= n, acc).otherwise(
            acc + F.when(_bit(e["__m"], acc.cast("int")), 1).otherwise(0))

    return (per_key.withColumn("__pref",
                               F.aggregate("__evs", F.lit(0), merge))
            .withColumn(alias, (F.col("__pref") >= n).cast("int"))
            .drop("__evs", "__pref"))


def sequence_count(df: DataFrame, keys: Sequence[str], ts_col: str,
                   cond_a: Column, cond_b: Column,
                   alias: str = "n_matches",
                   tiebreak: Sequence[str] = ()) -> DataFrame:
    """sequenceCount('(?1).*(?2)')(ts, condA, condB): number of
    sequential A-then-B matches per key in event-time order, where the
    scan RESTARTS after each completed match (reference
    src/AggregateFunctions/AggregateFunctionSequenceMatch.cpp:761 —
    ``countMatches`` re-enters the DFA from the start after a match, so
    for A,B,A,A,B,B it returns 2, not the maximum disjoint pairing 3).

    Fold over the per-key time-sorted event array with ``F.aggregate``
    (pure Catalyst expressions, no Python).  Accumulator encodes
    ``2*count + state`` (state 0 = awaiting A, 1 = awaiting B); both
    transitions — A seen while awaiting A, B seen while awaiting B —
    add exactly 1, so ``count = acc >> 1``.  Non-matching events are
    skipped at collect time (collect_list drops the NULLs the WHEN
    produces), keeping per-key state proportional to matching events
    only — the same state shape the reference keeps.
    """
    keys = list(keys)
    mask = (F.when(cond_a, 1).otherwise(0)
            + F.when(cond_b, 2).otherwise(0)).cast("int")
    ev_struct = F.struct(F.col(ts_col).alias("__t"),
                         *[F.col(t).alias(f"__tb{i}")
                           for i, t in enumerate(tiebreak)],
                         mask.alias("__m"))
    per_key = (df.groupBy(*keys)
               .agg(F.array_sort(
                   F.collect_list(F.when(mask != 0, ev_struct))).alias("__evs")))

    def step(acc, e):
        return (F.when((acc % 2 == 0) & (e["__m"].bitwiseAND(1) == 1), acc + 1)
                .when((acc % 2 == 1) & (e["__m"].bitwiseAND(2) == 2), acc + 1)
                .otherwise(acc))

    return (per_key.withColumn(
        alias, F.aggregate("__evs", F.lit(0), step,
                           lambda acc: F.shiftright(acc, 1).cast("long")))
        .drop("__evs"))


def sequence_next_node(df: DataFrame, keys: Sequence[str], ts_col: str,
                       event_col: str, base_cond: Column,
                       alias: str = "next_node",
                       tiebreak: Sequence[str] = ()) -> DataFrame:
    """sequenceNextNode(forward, head)(ts, event, base_cond): the event
    value immediately following the FIRST event matching ``base_cond``
    per key (reference
    src/AggregateFunctions/AggregateFunctionSequenceNextNode.cpp —
    forward/head direction subset).

    lead() over the event-time window, then keep the first matching row
    per key — one shuffle.
    """
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(ts_col, *tiebreak)
    nxt = df.withColumn("__next", F.lead(event_col).over(w))
    first_match = (nxt.filter(base_cond)
                   .withColumn("__rn", F.row_number().over(w))
                   .filter(F.col("__rn") == 1))
    return first_match.select(*keys, F.col("__next").alias(alias))


def delta_sum(df: DataFrame, keys: Sequence[str], ts_col: str,
              value_col: str, alias: str = "delta_sum") -> DataFrame:
    """deltaSum(value): sum of positive deltas between consecutive rows
    in time order (reference AggregateFunctionDeltaSum.h).

    lag window + groupBy-sum: one shuffle on keys; the window sort is
    per-key.
    """
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(ts_col)
    delta = F.col(value_col) - F.lag(value_col).over(w)
    return (df.withColumn("__d", F.when(delta > 0, delta).otherwise(0.0))
            .groupBy(*keys).agg(F.sum("__d").alias(alias)))


def exponential_moving_average(df: DataFrame, keys: Sequence[str],
                               ts_col: str, value_col: str,
                               halflife_s: float,
                               alias: str = "ema") -> DataFrame:
    """exponentialMovingAverage(halflife)(value, time): exponentially
    weighted mean of values at the latest observed time (reference
    AggregateFunctionExponentialMovingAverage.cpp: value at point t is
    averaged with weight 2^-((t_max - t_i)/halflife)).

    Algebraic rewrite: weights are computed relative to the per-key max
    timestamp, so the whole thing is two ordinary aggregates (max, then
    weighted sum) — no order-dependent fold, fully partial-aggregatable.
    """
    keys = list(keys)
    mx = df.groupBy(*keys).agg(F.max(F.unix_timestamp(F.col(ts_col))).alias("__tmax"))
    joined = df.join(mx, on=keys)
    weight = F.pow(F.lit(2.0),
                   (F.unix_timestamp(F.col(ts_col)) - F.col("__tmax"))
                   / F.lit(float(halflife_s)))
    return (joined
            .withColumn("__w", weight)
            .groupBy(*keys)
            .agg((F.sum(F.col("__w") * F.col(value_col)) / F.sum("__w")).alias(alias)))


def bounding_ratio(df: DataFrame, keys: Sequence[str], x_col: str,
                   y_col: str, alias: str = "ratio") -> DataFrame:
    """boundingRatio(x, y): slope between the points with minimal and
    maximal x — (y@max_x - y@min_x) / (max_x - min_x) (reference
    AggregateFunctionBoundingRatio.h).  min_by/max_by composition."""
    keys = list(keys)
    return (df.groupBy(*keys)
            .agg(((F.max_by(y_col, x_col) - F.min_by(y_col, x_col))
                  / (F.max(x_col) - F.min(x_col))).alias(alias)))


def uniq_up_to(df: DataFrame, keys: Sequence[str], value_col: str,
               n: int, alias: str = "uniq_up_to") -> DataFrame:
    """uniqUpTo(N)(x): exact distinct count if <= N, else N+1
    (reference AggregateFunctionUniqUpTo.h)."""
    keys = list(keys)
    return (df.groupBy(*keys)
            .agg(F.least(F.countDistinct(value_col), F.lit(n + 1)).alias(alias)))


def entropy(df: DataFrame, keys: Sequence[str], value_col: str,
            alias: str = "entropy") -> DataFrame:
    """entropy(x): Shannon entropy (bits) of the value distribution per
    key (reference AggregateFunctionEntropy.h).

    Two-level aggregation: count per (key, value), then
    -sum(p*log2(p)).  Both stages partial-aggregate map-side.
    """
    keys = list(keys)
    counted = df.groupBy(*keys, value_col).agg(F.count("*").alias("__c"))
    w_tot = Window.partitionBy(*keys)
    p = F.col("__c") / F.sum("__c").over(w_tot)
    return (counted.withColumn("__plogp", -p * F.log2(p))
            .groupBy(*keys).agg(F.sum("__plogp").alias(alias)))


def max_intersections(df: DataFrame, keys: Sequence[str],
                      start_col: str, end_col: str,
                      alias: str = "max_intersections") -> DataFrame:
    """maxIntersections(start, end): maximum number of simultaneously
    overlapping [start, end) intervals per key (reference
    AggregateFunctionMaxIntersections.h).

    Sweep line as a DataFrame: explode each interval into (+1 at start,
    -1 at end) events, running sum over an ordered window, max.  Ends
    sort before starts at the same point (half-open intervals).
    """
    keys = list(keys)
    events = df.select(
        *keys,
        F.explode(F.array(
            F.struct(F.col(start_col).alias("__p"), F.lit(1).alias("__d")),
            F.struct(F.col(end_col).alias("__p"), F.lit(-1).alias("__d")),
        )).alias("__e")
    ).select(*keys, "__e.__p", "__e.__d")
    w = (Window.partitionBy(*keys).orderBy("__p", "__d")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (events.withColumn("__depth", F.sum("__d").over(w))
            .groupBy(*keys).agg(F.max("__depth").cast("int").alias(alias)))


def max_intersections_position(df: DataFrame, keys: Sequence[str],
                               start_col: str, end_col: str,
                               alias: str = "position") -> DataFrame:
    """maxIntersectionsPosition(start, end): leftmost position where the
    maximum interval overlap is first attained (reference
    src/AggregateFunctions/AggregateFunctionMaxIntersections.cpp:34 —
    points sorted by (position, weight) so ends precede starts at equal
    position; the position recorded is the first point whose running
    depth strictly exceeds every earlier depth and equals the max).

    Same sweep as max_intersections plus a min_by over the first
    max-depth attainment.
    """
    keys = list(keys)
    events = df.select(
        *keys,
        F.explode(F.array(
            F.struct(F.col(start_col).alias("__p"), F.lit(1).alias("__d")),
            F.struct(F.col(end_col).alias("__p"), F.lit(-1).alias("__d")),
        )).alias("__e")
    ).select(*keys, "__e.__p", "__e.__d")
    w = (Window.partitionBy(*keys).orderBy("__p", "__d")
         .rowsBetween(Window.unboundedPreceding, 0))
    w_all = Window.partitionBy(*keys)
    depth = F.sum("__d").over(w)
    swept = (events.withColumn("__depth", depth)
             .withColumn("__rn", F.row_number().over(
                 Window.partitionBy(*keys).orderBy("__p", "__d")))
             .withColumn("__max", F.max("__depth").over(w_all)))
    return (swept.filter(F.col("__depth") == F.col("__max"))
            .groupBy(*keys)
            .agg(F.min_by("__p", "__rn").alias(alias)))


def sequence_match_events(df: DataFrame, keys: Sequence[str], ts_col: str,
                          conds: Sequence[Column],
                          alias: str = "match_events") -> DataFrame:
    """sequenceMatchEvents('(?1).*(?2)...')(ts, cond1..condN) (reference
    src/AggregateFunctions/AggregateFunctionSequenceMatch.cpp:719):
    the timestamps of the events bound to each (?N) in the FIRST match —
    the backtracking matcher binds each step to the earliest eligible
    event, so for the supported '(?i) then (?j)' pattern subset the
    result is the greedy earliest chain; empty array when no match.

    Same fold as sequence_match with a timestamp-accumulating state.
    """
    n = len(conds)
    keys = list(keys)
    # microsecond precision: second-truncated timestamps collide across
    # events and make the greedy chain order ambiguous vs any oracle
    ev = df.select(*keys,
                   F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__t"),
                   _match_mask(conds).alias("__m"))
    per_key = (ev.filter(F.col("__m") != 0)
               .groupBy(*keys)
               .agg(F.array_sort(F.collect_list(F.struct("__t", "__m"))).alias("__evs")))

    def step(acc, e):
        want = F.size(acc)
        hit = _bit(e["__m"], want)
        return F.when(want >= n, acc).otherwise(
            F.when(hit, F.concat(acc, F.array(e["__t"]))).otherwise(acc))

    matched = F.aggregate(
        "__evs", F.array().cast("array<long>"), step,
        lambda acc: F.when(F.size(acc) >= n, acc)
        .otherwise(F.array().cast("array<long>")))
    return per_key.withColumn(alias, matched).drop("__evs")


def interval_length_sum(df: DataFrame, keys: Sequence[str],
                        start_col: str, end_col: str,
                        alias: str = "interval_length_sum") -> DataFrame:
    """intervalLengthSum(start, end): total length of the union of the
    per-key intervals, overlaps counted once (reference
    AggregateFunctionIntervalLengthSum.h).

    Sort by start within key; each interval contributes
    max(end, prev_max_end) - max(start, prev_max_end) when positive —
    one window pass, one aggregate.
    """
    keys = list(keys)
    w = (Window.partitionBy(*keys).orderBy(start_col, end_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    prev_end = F.max(end_col).over(w)
    eff_start = F.greatest(F.col(start_col), F.coalesce(prev_end, F.col(start_col)))
    contrib = F.greatest(F.col(end_col) - eff_start, F.lit(0.0))
    return (df.withColumn("__len", contrib)
            .groupBy(*keys).agg(F.sum("__len").alias(alias)))


# deltaSumTimestamp(value, ts) (reference
# src/AggregateFunctions/AggregateFunctionDeltaSumTimestamp.h) exists in
# the reference only to make merge order explicit — our delta_sum already
# orders by the timestamp column, so the two coincide.
delta_sum_timestamp = delta_sum


def running_concurrency(df: DataFrame, keys: Sequence[str],
                        start_col: str, end_col: str,
                        alias: str = "concurrency") -> DataFrame:
    """runningConcurrency(begin, end) (reference
    src/Functions/runningConcurrency.cpp): for each row (ordered by
    begin) the number of intervals containing its begin instant —
    intervals are [begin, end): an interval ending exactly at t does
    not overlap one beginning at t.

    Distributed sweep: union (+1 at begin, -1 at end) events, running
    sum ordered by (t, delta) so closes at t apply before opens at t,
    then keep the begin events.  Two window passes, no self-join —
    survives arbitrary interval counts per key.
    """
    keys = list(keys)
    if df.schema[start_col].dataType == df.schema[end_col].dataType:
        # r14: one explode instead of union(opens, closes) — the union
        # planned and executed the input subtree once per branch (two
        # scans of the interval source; no common-subexpression reuse
        # across union arms), the explode is narrow and reads it once.
        # Same rows, same (t, d) tie rule in the window order below.
        sweep = df.select(*keys, F.explode(F.array(
            F.struct(F.col(start_col).alias("__t"),
                     F.lit(1).alias("__d"),
                     F.col(start_col).alias("__b"),
                     F.col(end_col).alias("__e")),
            F.struct(F.col(end_col).alias("__t"),
                     F.lit(-1).alias("__d"),
                     F.lit(None).cast(df.schema[start_col].dataType)
                     .alias("__b"),
                     F.lit(None).cast(df.schema[end_col].dataType)
                     .alias("__e")),
        )).alias("__ev")).select(*keys, "__ev.__t", "__ev.__d",
                                 "__ev.__b", "__ev.__e")
    else:
        # mixed start/end types: keep the union, whose type coercion
        # widens __t correctly
        opens = df.select(*keys, F.col(start_col).alias("__t"),
                          F.lit(1).alias("__d"),
                          F.col(start_col).alias("__b"),
                          F.col(end_col).alias("__e"))
        closes = df.select(*keys, F.col(end_col).alias("__t"),
                           F.lit(-1).alias("__d"),
                           F.lit(None).cast(df.schema[start_col].dataType)
                           .alias("__b"),
                           F.lit(None).cast(df.schema[end_col].dataType)
                           .alias("__e"))
        sweep = opens.unionByName(closes)
    w = (Window.partitionBy(*keys)
         .orderBy(F.col("__t"), F.col("__d"))
         .rowsBetween(Window.unboundedPreceding, 0))
    out = (sweep.withColumn("__c", F.sum("__d").over(w))
           .filter(F.col("__d") == 1)
           .select(*keys, F.col("__b").alias(start_col),
                   F.col("__e").alias(end_col),
                   F.col("__c").cast("long").alias(alias)))
    return out
