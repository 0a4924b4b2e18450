"""timeSeries*ToGrid family vs a direct Python transcription of the
reference's per-grid-point logic
(AggregateFunctionTimeseriesExtrapolatedValue.h / InstantValue.h /
ToGridSparse.h)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_core_spark.operators.timeseries import time_series_to_grid  # noqa: E402

ROWS = [("a", 2.0, 1.0), ("a", 12.0, 5.0), ("a", 22.0, 9.0),
        ("a", 32.0, 2.0), ("a", 42.0, 6.0),     # counter reset at t=32
        ("b", 5.0, 10.0), ("b", 45.0, 20.0),    # sparse series
        ("c", 7.0, 3.0)]                        # single sample
START, END, STEP, WIN = 10.0, 50.0, 10.0, 25.0


def _reference(kind):
    from collections import defaultdict
    series = defaultdict(list)
    for s, t, v in ROWS:
        series[s].append((t, v))
    out = {}
    for s, ss in series.items():
        ss.sort()
        i = 0
        while START + i * STEP <= END:
            t = START + i * STEP
            win = [(ts, v) for ts, v in ss if t - WIN <= ts <= t]
            key = (s, t)
            if kind == "resample":
                out[key] = win[-1][1] if win else None
            elif kind in ("instant_rate", "instant_delta"):
                upto = [(ts, v) for ts, v in ss if ts <= t]
                if (len(upto) >= 2 and upto[-2][0] + WIN >= t
                        and upto[-1][0] != upto[-2][0]):
                    (t1, v1), (t2, v2) = upto[-2], upto[-1]
                    out[key] = (v2 - v1 if kind == "instant_delta"
                                else (v2 if v2 < v1 else v2 - v1) / (t2 - t1))
                else:
                    out[key] = None
            else:
                if len(win) < 2 or win[-1][0] == win[0][0]:
                    out[key] = None
                else:
                    ti = win[-1][0] - win[0][0]
                    resets = sum(win[k][1] for k in range(len(win) - 1)
                                 if win[k + 1][1] < win[k][1])
                    vd = win[-1][1] - win[0][1] + (resets if kind == "rate" else 0.0)
                    avg = ti / (len(win) - 1)
                    thr = avg * 1.1
                    dts = win[0][0] - (t - WIN)
                    dte = t - win[-1][0]
                    if dts >= thr:
                        dts = avg / 2
                    if kind == "rate" and vd > 0 and win[0][1] >= 0:
                        dts = min(ti * (win[0][1] / vd), dts)
                    if dte >= thr:
                        dte = avg / 2
                    factor = (ti + dts + dte) / ti
                    if kind == "rate":
                        factor /= WIN
                    out[key] = vd * factor
            i += 1
    return out


@pytest.mark.parametrize("kind", ["rate", "delta", "instant_rate",
                                  "instant_delta", "resample"])
def test_matches_reference_transcription(spark, kind):
    df = spark.createDataFrame(ROWS, "s string, ts double, v double")
    got = {(r.s, r.grid_ts): r.result
           for r in time_series_to_grid(df, ["s"], "ts", "v", START, END,
                                        STEP, WIN, kind).collect()}
    want = _reference(kind)
    assert set(got) == set(want)
    for k, w in want.items():
        if w is None:
            assert got[k] is None, (kind, k, got[k])
        else:
            assert got[k] == pytest.approx(w), (kind, k)


def test_last_two_and_duplicate_ts_max(spark):
    # duplicate timestamps keep the max value (Bucket::add)
    df = spark.createDataFrame(
        [("a", 10.0, 1.0), ("a", 10.0, 7.0), ("a", 20.0, 3.0)],
        "s string, ts double, v double")
    out = {r.grid_ts: r for r in time_series_to_grid(
        df, ["s"], "ts", "v", 20.0, 30.0, 10.0, 25.0, "last_two").collect()}
    assert (out[20.0].ts1, out[20.0].v1) == (20.0, 3.0)
    assert (out[20.0].ts2, out[20.0].v2) == (10.0, 7.0)
    # t=30: both samples still within window 25
    assert (out[30.0].ts1, out[30.0].ts2) == (20.0, 10.0)


def test_timestamp_typed_input(spark):
    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:10", 1.0), ("a", "2024-01-01 00:00:20", 5.0)],
        "s string, ts string, v double").withColumn(
        "ts", __import__("pyspark.sql.functions", fromlist=["F"]).to_timestamp("ts"))
    base = 1704067200.0  # 2024-01-01 UTC
    out = {r.grid_ts: r.result for r in time_series_to_grid(
        df, ["s"], "ts", "v", base + 20, base + 20, 10.0, 30.0,
        "instant_delta").collect()}
    assert out[base + 20] == pytest.approx(4.0)
