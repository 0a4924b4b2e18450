"""Hand-computed cases for the order-dependent sequence aggregates
(windowFunnel / sequenceMatch — reference
src/AggregateFunctions/AggregateFunctionWindowFunnel.h,
AggregateFunctionSequenceMatch.h), plus spot checks for the
order-independent ones against plain python."""

import datetime as dt

from pyspark.sql import functions as F

from clickhouse_core_spark.operators import (
    window_funnel, sequence_match, retention, delta_sum,
    exponential_moving_average, max_intersections, interval_length_sum,
)


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, et string")


FUNNEL_CONDS = lambda: [F.col("et") == "a", F.col("et") == "b", F.col("et") == "c"]  # noqa: E731


def test_funnel_full_chain(spark):
    df = _events(spark, [
        (1, _ts(0), "a"), (1, _ts(1), "b"), (1, _ts(2), "c"),   # full chain
        (2, _ts(0), "a"), (2, _ts(1), "c"),                     # skips b -> level 1
        (3, _ts(0), "b"), (3, _ts(1), "c"),                     # never starts
        (4, _ts(0), "a"),                                       # only start
    ])
    out = {r["user_id"]: r["level"]
           for r in window_funnel(df, ["user_id"], "ts", FUNNEL_CONDS(),
                                  window="1 day").collect()}
    assert out == {1: 3, 2: 1, 3: 0, 4: 1}  # user 3 never starts the chain


def test_funnel_window_expiry(spark):
    df = _events(spark, [
        # b arrives 2h after chain start a; window is 1h -> level stays 1
        (1, _ts(0), "a"), (1, _ts(2), "b"),
        # second chain start within window of c
        (2, _ts(0), "a"), (2, _ts(3), "a"), (2, _ts(3, 30), "b"),
    ])
    out = {r["user_id"]: r["level"]
           for r in window_funnel(df, ["user_id"], "ts", FUNNEL_CONDS(),
                                  window="1 hour").collect()}
    assert out[1] == 1
    # reference semantics: the funnel tracks the best chain; the second
    # 'a' at 3:00 lets 'b' at 3:30 advance (ts - chain_start = 30min)
    assert out[2] == 2


def test_funnel_same_event_multi_step(spark):
    # one event can satisfy several conditions (bitmask semantics)
    df = spark.createDataFrame([(1, _ts(0), "a"), (1, _ts(1), "ab")],
                               "user_id long, ts timestamp, et string")
    conds = [F.col("et").contains("a"), F.col("et").contains("b")]
    out = window_funnel(df, ["user_id"], "ts", conds, window=3600 * 24).collect()
    assert out[0]["level"] == 2


def test_sequence_match_basic(spark):
    df = _events(spark, [
        (1, _ts(0), "a"), (1, _ts(5), "b"),        # a then b -> match
        (2, _ts(0), "b"), (2, _ts(5), "a"),        # wrong order
        (3, _ts(0), "a"),                          # incomplete
        (4, _ts(0), "b"), (4, _ts(1), "a"), (4, _ts(2), "b"),  # a.*b present
    ])
    conds = [F.col("et") == "a", F.col("et") == "b"]
    out = {r["user_id"]: r["matched"]
           for r in sequence_match(df, ["user_id"], "ts", conds).collect()}
    assert out == {1: 1, 2: 0, 3: 0, 4: 1}


def test_retention_semantics(spark):
    df = _events(spark, [
        (1, _ts(0), "a"), (1, _ts(1), "c"),   # first + third, no second
        (2, _ts(0), "b"),                     # second only -> all zero except nothing
    ])
    conds = [F.col("et") == "a", F.col("et") == "b", F.col("et") == "c"]
    rows = {r["user_id"]: (r["r_0"], r["r_1"], r["r_2"])
            for r in retention(df, ["user_id"], conds).collect()}
    assert rows[1] == (1, 0, 1)
    assert rows[2] == (0, 0, 0)


def test_delta_sum(spark):
    df = spark.createDataFrame(
        [(1, _ts(0), 10.0), (1, _ts(1), 15.0), (1, _ts(2), 12.0), (1, _ts(3), 20.0)],
        "user_id long, ts timestamp, value double")
    out = delta_sum(df, ["user_id"], "ts", "value").collect()
    assert out[0]["delta_sum"] == 13.0  # +5 (10->15) skip -3, +8 (12->20)


def test_ema_weighted_mean(spark):
    # two points one halflife apart: ema = (old*0.5 + new) / 1.5
    df = spark.createDataFrame(
        [(1, _ts(0), 0.0), (1, _ts(1), 30.0)],
        "user_id long, ts timestamp, value double")
    out = exponential_moving_average(df, ["user_id"], "ts", "value",
                                     halflife_s=3600.0).collect()
    assert abs(out[0]["ema"] - 20.0) < 1e-9


def test_max_intersections_and_interval_union(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 10.0), (1, 5.0, 15.0), (1, 20.0, 30.0)],
        "k long, s double, e double")
    mi = max_intersections(df, ["k"], "s", "e").collect()[0]["max_intersections"]
    assert mi == 2  # [0,10) overlaps [5,15)
    ul = interval_length_sum(df, ["k"], "s", "e").collect()[0]["interval_length_sum"]
    assert ul == 25.0  # union [0,15) + [20,30)


def test_sequence_count_non_overlapping(spark):
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    # A B A A B B A -> sequential restart-after-match scan (reference
    # AggregateFunctionSequenceMatch.cpp countMatches): match (0,1),
    # restart, match (2,4), restart, no further B after an A = 2.
    evs = ["A", "B", "A", "A", "B", "B", "A"]
    rows = [(1, t0 + dt.timedelta(minutes=i), e, i) for i, e in enumerate(evs)]
    # B before any A never matches
    rows += [(2, t0, "B", 0), (2, t0 + dt.timedelta(minutes=1), "A", 1),
             (2, t0 + dt.timedelta(minutes=2), "B", 2)]
    from pyspark.sql import functions as F
    from clickhouse_core_spark.operators import sequence_count
    df = spark.createDataFrame(rows, "k int, ts timestamp, e string, i int")
    out = {r["k"]: r["n_matches"]
           for r in sequence_count(df, ["k"], "ts", F.col("e") == "A",
                                   F.col("e") == "B",
                                   tiebreak=["i"]).collect()}
    assert out == {1: 2, 2: 1}
    # keys whose events never match either condition still appear with 0
    df2 = spark.createDataFrame([(3, t0, "C", 0)], "k int, ts timestamp, e string, i int")
    out2 = sequence_count(df2, ["k"], "ts", F.col("e") == "A",
                          F.col("e") == "B", tiebreak=["i"]).collect()
    assert out2[0]["n_matches"] == 0


def test_sequence_next_node_head(spark):
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, "view", 0), (1, t0 + dt.timedelta(minutes=1), "click", 1),
            (1, t0 + dt.timedelta(minutes=2), "view", 2),
            (2, t0, "click", 0), (2, t0 + dt.timedelta(minutes=1), "view", 1)]
    from pyspark.sql import functions as F
    from clickhouse_core_spark.operators import sequence_next_node
    df = spark.createDataFrame(rows, "k int, ts timestamp, e string, i int")
    out = {r["k"]: r["next_node"]
           for r in sequence_next_node(df, ["k"], "ts", "e",
                                       F.col("e") == "view",
                                       tiebreak=["i"]).collect()}
    assert out == {1: "click", 2: None}  # user 2's first view is last event


def test_running_concurrency(spark):
    from clickhouse_core_spark.operators import running_concurrency
    df = spark.createDataFrame(
        [("k", 1, 5), ("k", 2, 3), ("k", 3, 8), ("k", 5, 6),
         ("k", 10, 11), ("z", 1, 2)],
        "g string, b int, e int")
    rows = sorted((r.g, r.b, r.concurrency)
                  for r in running_concurrency(df, ["g"], "b", "e")
                  .collect())
    # [begin, end): an interval ending at t does not overlap a begin at t
    assert rows == [("k", 1, 1), ("k", 2, 2), ("k", 3, 2), ("k", 5, 2),
                    ("k", 10, 1), ("z", 1, 1)]
