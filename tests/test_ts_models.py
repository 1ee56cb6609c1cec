"""Holt smoothing, seasonal profile, and Zipf fit: replay tests with
the kernels' exact fold (never numpy vector forms — the parity rule is
identical op order, not mathematical equivalence)."""

import math

from pyspark.sql import functions as F

from speech_data_pipeline_spark.operators.recurrence import holt_linear
from speech_data_pipeline_spark.queries.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_holt_matches_sequential_replay(spark):
    series = {1: [1000, 1200, 1400, 1600, 1800], 2: [500, 400, 600]}
    rows = [
        (uid, i, i * 1_000_000, v)
        for uid, vals in series.items()
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, t_us long, mv long"
    )
    got = {
        (r["user_id"], r["event_id"]): (r["level"], r["trend"], r["fc"])
        for r in holt_linear(
            df, "user_id", ["t_us", "event_id"], "mv"
        ).collect()
    }
    for uid, vals in series.items():
        l = b = None
        for i, x in enumerate(vals):
            if l is None:
                l, b = float(x), 0.0
            else:
                lp = l
                l = 0.25 * float(x) + 0.75 * (lp + b)
                b = 0.125 * (l - lp) + 0.875 * b
            assert got[(uid, i)] == (l, b, l + b)  # bit-exact


def test_holt_tracks_linear_ramp(spark):
    # On a pure linear ramp the trend estimate converges toward the
    # true slope; forecasts converge toward the next value.
    vals = [1000 * (i + 1) for i in range(60)]
    df = spark.createDataFrame(
        [(1, i, i, v) for i, v in enumerate(vals)],
        "user_id long, event_id long, t_us long, mv long",
    )
    out = (
        holt_linear(df, "user_id", ["t_us", "event_id"], "mv")
        .orderBy("event_id")
        .collect()
    )
    assert abs(out[-1]["trend"] - 1000.0) / 1000.0 < 0.15
    assert abs(out[-1]["fc"] - (vals[-1] + 1000)) / vals[-1] < 0.05


def test_seasonal_profile_sums_and_recovery(spark):
    # Deviations weighted by bucket counts must sum to ~0 per type
    # (additive decomposition identity), on the registered query.
    rows = QUERIES["ts_seasonal_profile"](spark, SF).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert by_type
    for t, rs in by_type.items():
        total_dev = sum(r["seasonal_milli"] * r["n_buckets"] for r in rs)
        n_all = sum(r["n_buckets"] for r in rs)
        assert abs(total_dev / n_all) < 0.01  # trunc6 dust only


def test_zipf_slope_is_negative_and_r2_bounded(spark):
    r = QUERIES["text_zipf_slope"](spark, SF).collect()[0]
    assert r["n_terms"] > 10
    assert r["slope"] < 0.0  # frequency falls with rank, always
    assert 0.0 <= r["r2"] <= 1.0


def test_zipf_moments_match_python_ols(spark):
    from speech_data_pipeline_spark.sources.catalog import load_table
    import re
    from collections import Counter

    docs = load_table(spark, SF, "documents").select("text").collect()
    cnt = Counter()
    for r in docs:
        cnt.update(re.findall(r"[a-z]+", r["text"].lower()))
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    xs = [math.floor(math.log(i + 1) * 1e6) for i in range(len(top))]
    ys = [math.floor(math.log(c) * 1e6) for _t, c in top]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    want = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    got = QUERIES["text_zipf_slope"](spark, SF).collect()[0]["slope"]
    assert abs(got - want) < 2e-6


class TestAcfLags:
    def test_acf_matches_numpy_on_crafted_series(self, spark):
        # Single dense daily series; compare against the direct
        # definition with global mean (statsmodels' acf with
        # adjusted=False numerator convention restricted to n-k terms).
        import numpy as np
        import pandas as pd
        import tempfile, os

        from speech_data_pipeline_spark.queries.registry import QUERIES

        xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9]
        base_ns = 1_700_000_000_000_000_000
        day_ns = 86_400_000_000_000
        rows = [
            (i, base_ns + i * day_ns, 1, "view", float(x), "{}")
            for i, x in enumerate(xs)
        ]
        df = pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value",
                     "props"],
        )
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "events.parquet"))
            got = {
                r["lag"]: r["acf"]
                for r in QUERIES["ts_acf_lags"](spark, d).collect()
            }
        x = np.array(xs, dtype=float) * 1000  # milli grid
        xc = x - x.mean()
        den = (xc * xc).sum()
        for k in range(1, 6):
            want = (xc[:-k] * xc[k:]).sum() / den
            assert abs(got[k] - want) < 1e-5, (k, got[k], want)

    def test_acf_bounded_on_fixture(self, spark):
        from speech_data_pipeline_spark.queries.registry import QUERIES

        rows = QUERIES["ts_acf_lags"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert rows
        for r in rows:
            assert -1.0 - 1e-6 <= r["acf"] <= 1.0 + 1e-6


class TestAr1Forecast:
    def test_ar1_matches_brute_yule_walker(self, spark):
        from collections import defaultdict

        from speech_data_pipeline_spark.queries.registry import QUERIES
        from speech_data_pipeline_spark.sources.catalog import load_table

        sf = "/root/testdata/sf0.001"
        rows = {r["h"]: r
                for r in QUERIES["ts_ar1_forecast"](spark, sf).collect()}
        daily = defaultdict(int)
        for r in load_table(spark, sf, "events").collect():
            if r["event_type"] == "purchase":
                daily[(r["ts"] // 1000) // 86_400_000_000] += round(
                    r["value"] * 1000
                )
        days = range(min(daily), max(daily) + 1)
        x = [daily.get(d, 0) for d in days]
        n = len(x)
        mean = sum(x) / n
        num = sum((x[t] - mean) * (x[t + 1] - mean) for t in range(n - 1))
        den = sum((v - mean) ** 2 for v in x)
        phi = num / den
        assert rows[1]["n_days"] == n
        assert abs(rows[1]["phi"] - phi) < 2e-6
        for h in range(1, 8):
            fc = (mean + phi**h * (x[-1] - mean)) / 1000.0
            assert abs(rows[h]["forecast"] - fc) < max(
                2e-6, abs(fc) * 1e-9
            )

    def test_ar1_pure_geometric_on_crafted_series(self, spark):
        # AR(1) with x_t = mean + c*phi^t reproduces phi ~ the true
        # decay and forecasts continue the geometric path.
        import os, tempfile
        import pandas as pd

        from speech_data_pipeline_spark.queries.registry import QUERIES

        base_ns = 1_700_000_000_000_000_000
        day_ns = 86_400_000_000_000
        rows = []
        eid = 0
        for t in range(60):
            val = 100.0 + 50.0 * (0.5 ** t)
            rows.append((eid, base_ns + t * day_ns, 1, "purchase", val,
                         "{}"))
            eid += 1
        df = pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value",
                     "props"],
        )
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "events.parquet"))
            out = {r["h"]: r
                   for r in QUERIES["ts_ar1_forecast"](spark, d).collect()}
        assert out[1]["n_days"] == 60
        # The tail is ~constant at 100, so phi is pulled below the
        # head's 0.5 decay; it must stay in (0, 1) and forecasts must
        # converge monotonically toward the SERIES MEAN (the AR(1)
        # fixed point) from the last value.
        assert 0.0 < out[1]["phi"] < 1.0
        mean = sum(
            round((100.0 + 50.0 * 0.5**t) * 1000) for t in range(60)
        ) / 60_000.0
        diffs = [abs(out[h]["forecast"] - mean) for h in range(1, 8)]
        assert all(diffs[i + 1] <= diffs[i] + 1e-9 for i in range(6))


class TestBurstIntervals:
    def test_kernel_matches_exhaustive_dp(self, spark):
        import itertools

        from speech_data_pipeline_spark.operators.recurrence import (
            viterbi_burst,
        )

        xs = [1, 1, 2, 1, 9, 10, 11, 9, 1, 2, 1, 1, 10, 1, 1]
        lo, hi, g = 1, 10, 6
        df = spark.createDataFrame(
            [("a", t, x, lo, hi, g) for t, x in enumerate(xs)],
            "k string, t long, x long, lo long, hi long, g long",
        )
        got = [
            s for _, s in sorted(
                (r["t"], r["state"])
                for r in viterbi_burst(
                    df, "k", "t", "x", "lo", "hi", "g"
                ).collect()
            )
        ]

        def cost(comb):
            c = g if comb[0] == 1 else 0
            for t, s in enumerate(comb):
                c += abs(xs[t] - (hi if s else lo))
                if t and s != comb[t - 1]:
                    c += g
            return c

        best = min(
            itertools.product([0, 1], repeat=len(xs)), key=cost
        )
        assert cost(tuple(got)) == cost(best)
        # the sustained block is a burst; the lone spike is not
        assert got[4:8] == [1, 1, 1, 1]
        assert got[12] == 0

    def test_planted_burst_interval_recovered(self, spark):
        import os, tempfile

        import pandas as pd

        from speech_data_pipeline_spark.queries.registry import QUERIES

        base_ns = 1_700_000_000_000_000_000
        day_ns = 86_400_000_000_000
        rows = []
        eid = 0
        for d in range(60):
            n = 20 if 25 <= d < 33 else 5  # burst days 25..32
            for i in range(n):
                rows.append(
                    (eid, base_ns + d * day_ns + i * 1000, 1,
                     "purchase", 1.0, "{}")
                )
                eid += 1
        df = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type",
                           "value", "props"])
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "events.parquet"))
            out = QUERIES["ts_burst_intervals"](spark, d).collect()
        assert len(out) == 1
        r = out[0]
        day0 = base_ns // 1000 // 86_400_000_000
        assert r["event_type"] == "purchase"
        assert r["start_day"] == day0 + 25
        assert r["end_day"] == day0 + 32
        assert r["n_days"] == 8 and r["peak"] == 20 and r["total"] == 160
