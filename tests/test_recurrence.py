"""Sequential recurrence operators (operators/recurrence.py): EWMA and
CUSUM, pinned against plain-Python replays of the same recurrences.

The replays intentionally use the SAME fold the kernel contracts to
(y = 0.75*y + 0.25*x step-by-step in Python floats == IEEE float64)
rather than numpy vector forms — the parity rule is "identical op
order", never "mathematically equivalent".
"""

import pytest
from pyspark.sql import functions as F

from speech_data_pipeline_spark.operators.recurrence import (
    cusum_alarms,
    ewma_smooth,
)


def _frame(spark, series):
    rows = []
    for uid, vals in series.items():
        for i, v in enumerate(vals):
            rows.append((uid, i, i * 1_000_000, v))
    return spark.createDataFrame(
        rows, "user_id long, event_id long, t_us long, mv long"
    )


def test_ewma_matches_sequential_replay(spark):
    series = {1: [1000, 2000, 4000, 4000, 0], 2: [500], 3: [0, 0, 1 << 40]}
    df = _frame(spark, series)
    got = {
        (r["user_id"], r["event_id"]): r["ewma"]
        for r in ewma_smooth(
            df, "user_id", ["t_us", "event_id"], "mv"
        ).collect()
    }
    for uid, vals in series.items():
        y = None
        for i, x in enumerate(vals):
            y = float(x) if y is None else 0.75 * y + 0.25 * float(x)
            assert got[(uid, i)] == y  # bit-exact, not approx


def test_ewma_rejects_non_dyadic_alpha(spark):
    df = _frame(spark, {1: [1]})
    with pytest.raises(ValueError):
        ewma_smooth(df, "user_id", ["event_id"], "mv", 1, 3)


def test_ewma_state_resets_between_keys(spark):
    # Key 2's first row must seed fresh, not blend key 1's tail.
    df = _frame(spark, {1: [1_000_000] * 5, 2: [8]})
    got = ewma_smooth(df, "user_id", ["t_us", "event_id"], "mv")
    row = got.where(F.col("user_id") == 2).collect()
    assert len(row) == 1 and row[0]["ewma"] == 8.0


def _cusum_replay(vals, target, slack, h):
    s = t = 0
    n_hi = n_lo = 0
    out = []
    for i, x in enumerate(vals):
        s = max(0, s + (x - target - slack))
        t = max(0, t + (target - x - slack))
        if s > h:
            n_hi += 1
            out.append((i, "high", s, n_hi))
            s = 0
        if t > h:
            n_lo += 1
            out.append((i, "low", t, n_lo))
            t = 0
    return out


def test_cusum_matches_sequential_replay(spark):
    series = {
        # slow drift above target: alarms only via accumulation
        1: [130] * 20,
        # one huge spike: immediate alarm, then reset
        2: [100, 100, 900, 100, 100, 900],
        # persistent low shift
        3: [10] * 15,
        # dead-band noise: never alarms
        4: [95, 105, 100, 98, 102],
    }
    df = _frame(spark, series)
    got = sorted(
        (r["user_id"], r["event_id"], r["side"], r["stat"], r["alarm_no"])
        for r in cusum_alarms(
            df, "user_id", ["t_us", "event_id"], "mv",
            target=100, slack=10, threshold=300,
        ).collect()
    )
    want = sorted(
        (uid, i, side, stat, no)
        for uid, vals in series.items()
        for (i, side, stat, no) in _cusum_replay(vals, 100, 10, 300)
    )
    assert got == want
    assert not any(u == 4 for (u, *_rest) in got)
    assert any(side == "low" for (_u, _i, side, *_r) in got)


def test_registered_queries_run_on_fixture(spark):
    from speech_data_pipeline_spark.queries.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    ew = QUERIES["ts_ewma_smooth"](spark, sf)
    n_events = ew.count()
    assert n_events > 0
    # one smoothed row per input event
    from speech_data_pipeline_spark.sources.catalog import load_table

    assert n_events == load_table(spark, sf, "events").count()
    QUERIES["ts_cusum_alarms"](spark, sf).count()  # runs clean
