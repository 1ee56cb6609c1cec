"""Statistics queries (stats_q) + funnel/retrieval: semantic checks
against independently computed NumPy/driver references."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _q100(x: float) -> int:
    """floor(x*100 + 0.5): the EXACT half-up quantization the stats
    queries and their oracles apply. Python ``round()`` is banker's
    (half-to-even) and diverges on exact .5 midpoints — replays must
    share the product's rule, not a lookalike."""
    return math.floor(x * 100 + 0.5)


def test_corr_matrix_matches_numpy(spark):
    from speech_data_pipeline_spark.queries.stats_q import (
        _CORR_COLS,
        stats_corr_matrix,
    )
    from speech_data_pipeline_spark.sources.catalog import load_table

    got = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in stats_corr_matrix(spark, SF).collect()
    }
    assert len(got) == 6
    pdf = load_table(spark, SF, "lineitem").select(*_CORR_COLS).toPandas()
    q = np.floor(pdf.to_numpy() * 100.0 + 0.5)  # the query's exact grid
    ref = np.corrcoef(q, rowvar=False)
    idx = {c: i for i, c in enumerate(_CORR_COLS)}
    for (cx, cy), v in got.items():
        assert v == pytest.approx(ref[idx[cx], idx[cy]], abs=2e-6)
        assert -1.0 <= v <= 1.0


def test_welch_ttest_matches_reference(spark):
    from speech_data_pipeline_spark.queries.stats_q import ab_welch_ttest
    from speech_data_pipeline_spark.sources.catalog import load_table

    row = ab_welch_ttest(spark, SF).collect()[0]
    ev = load_table(spark, SF, "events").select("event_type", "value").toPandas()
    a = np.floor(
        ev[ev.event_type == "purchase"].value.to_numpy() * 1000.0 + 0.5
    ) / 1000.0
    b = np.floor(
        ev[ev.event_type == "view"].value.to_numpy() * 1000.0 + 0.5
    ) / 1000.0
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se = np.sqrt(va / len(a) + vb / len(b))
    t_ref = (a.mean() - b.mean()) / se
    df_ref = (va / len(a) + vb / len(b)) ** 2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert row["n_treat"] == len(a) and row["n_control"] == len(b)
    assert row["t_stat"] == pytest.approx(t_ref, abs=1e-4)
    assert row["df"] == pytest.approx(df_ref, rel=1e-4)
    assert row["mean_treat"] == pytest.approx(a.mean(), abs=1e-5)


def test_corr_partition_invariance(spark):
    """The moment sums must make corr independent of partitioning."""
    from speech_data_pipeline_spark.queries.stats_q import stats_corr_matrix

    base = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in stats_corr_matrix(spark, SF).collect()
    }
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        again = {
            (r["col_x"], r["col_y"]): r["corr"]
            for r in stats_corr_matrix(spark, SF).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == again  # bit-exact, not approx


def test_funnel_durations_positive(spark):
    from speech_data_pipeline_spark.queries.behavior_q import (
        funnel_time_to_convert,
    )

    rows = funnel_time_to_convert(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_converted"] >= 1
        assert 0 <= r["med_dur_us"] <= r["p90_dur_us"]


def test_boolean_retrieval_ranking(spark):
    from speech_data_pipeline_spark.queries.mining_q import (
        _BOOL_MIN_MATCH,
        search_boolean_retrieval,
    )

    rows = search_boolean_retrieval(spark, SF).collect()
    assert rows
    keys = [(-r["match_cnt"], -r["tf"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        assert r["match_cnt"] >= _BOOL_MIN_MATCH
        assert r["tf"] >= r["match_cnt"]


def test_linreg_matches_numpy(spark):
    import numpy as np

    from speech_data_pipeline_spark.queries.stats_q import stats_linreg
    from speech_data_pipeline_spark.sources.catalog import load_table

    row = stats_linreg(spark, SF).collect()[0]
    pdf = load_table(spark, SF, "lineitem").select(
        "l_quantity", "l_extendedprice"
    ).toPandas()
    x = np.floor(pdf.l_quantity.to_numpy() * 100.0 + 0.5)
    y = np.floor(pdf.l_extendedprice.to_numpy() * 100.0 + 0.5)
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]
    assert row["n"] == len(x)
    assert row["slope"] == pytest.approx(slope, rel=1e-5)
    assert row["intercept"] == pytest.approx(intercept / 100.0, rel=1e-4)
    assert row["r2"] == pytest.approx(r * r, abs=1e-5)


def test_psi_zero_for_identical_distributions(spark, tmp_path):
    """Two arms drawn with identical bin layout => PSI == 0."""
    import datetime
    import os

    import pyspark.sql.types as T

    d = str(tmp_path / "sf")
    os.makedirs(d)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for v in [10.0, 60.0, 110.0, 160.0, 210.0] * 4:
        for ty in ("purchase", "view"):
            rows.append((eid, t0, 1, ty, v, "{}"))
            eid += 1
    spark.createDataFrame(rows, schema).write.parquet(f"{d}/events.parquet")
    from speech_data_pipeline_spark.queries.stats_q import drift_psi_value

    out = drift_psi_value(spark, d).collect()
    assert out
    for r in out:
        assert r["psi_term"] == 0.0
        assert r["psi_total"] == 0.0
        assert r["n_treat"] == r["n_control"]


def test_chisq_matches_scipy_free_reference(spark):
    """χ² total equals the classic formula computed driver-side."""
    from speech_data_pipeline_spark.queries.stats_q import chisq_type_by_day
    from speech_data_pipeline_spark.sources.catalog import load_table

    rows = chisq_type_by_day(spark, SF).collect()
    assert rows
    chi2 = rows[0]["chi2_total"]
    assert all(r["chi2_total"] == chi2 for r in rows)
    ev = load_table(spark, SF, "events").select(
        "event_type", (F.expr("(ts div 1000) div 86400000000") % 7).alias("dow")
    ).toPandas()
    import numpy as np

    ct = ev.groupby(["event_type", "dow"]).size()
    tot = len(ev)
    rt = ev.groupby("event_type").size()
    cl = ev.groupby("dow").size()
    ref = 0.0
    for (ty, dw), obs in ct.items():
        exp = rt[ty] * cl[dw] / tot
        ref += (obs - exp) ** 2 / exp
    assert chi2 == pytest.approx(ref, rel=1e-6)
    # observed cells only: every obs >= 1 and expected > 0
    for r in rows:
        assert r["obs"] >= 1 and r["expected"] > 0


def test_psi_one_arm_bins_still_counted(spark, tmp_path):
    """Total separation (arms in disjoint bins) must yield a LARGE
    finite PSI — the Laplace smoothing keeps one-arm bins in the sum
    instead of dropping the most-drifted evidence."""
    import datetime
    import os

    import pyspark.sql.types as T

    d = str(tmp_path / "sf")
    os.makedirs(d)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(50):
        rows.append((i, t0, 1, "purchase", 480.0, "{}"))       # bin 9 only
        rows.append((1000 + i, t0, 1, "view", 10.0, "{}"))     # bin 0 only
    spark.createDataFrame(rows, schema).write.parquet(f"{d}/events.parquet")
    from speech_data_pipeline_spark.queries.stats_q import drift_psi_value

    out = {r["bin"]: r for r in drift_psi_value(spark, d).collect()}
    assert set(out) == {0, 9}
    assert out[9]["n_treat"] == 50 and out[9]["n_control"] == 0
    assert out[0]["n_treat"] == 0 and out[0]["n_control"] == 50
    total = out[0]["psi_total"]
    assert total == out[9]["psi_total"]
    assert total > 1.0  # far past the 0.25 "significant shift" bar


class TestBootstrapCI:
    def test_poisson_ladder_mean_is_one(self, spark):
        # The ppm inverse-CDF ladder must reproduce Poisson(1)'s mean
        # over the full uniform domain (exact expectation of the
        # truncated ladder: sum of (1 - cdf) tail masses in ppm).
        from speech_data_pipeline_spark.queries.stats_q import _POIS_PPM

        # E[w] = Σ_k P(w > k) = Σ_k (1e6 - t_k)/1e6 over ladder rungs.
        ew = sum((1_000_000 - t) / 1_000_000 for t in _POIS_PPM)
        assert abs(ew - 1.0) < 2e-3  # truncation at w=9 costs ~1e-4

    def test_ci_brackets_mean_on_fixture(self, spark):
        from speech_data_pipeline_spark.queries.registry import QUERIES

        row = QUERIES["eval_bootstrap_ci"](
            spark, "/root/testdata/sf0.001"
        ).collect()[0]
        assert row["n_boot"] == 200
        assert row["ci_lo"] <= row["mean_price"] <= row["ci_hi"]
        # A 95% CI at n≈1.5k orders should be tight around the mean.
        assert row["ci_hi"] - row["ci_lo"] < row["mean_price"]


class TestKsTest:
    def test_ks_matches_scipy_style_definition(self, spark):
        # Brute ECDF-max replay on the fixture (quantized to cents,
        # matching the query's grid).
        from speech_data_pipeline_spark.queries.registry import QUERIES
        from speech_data_pipeline_spark.sources.catalog import load_table
        from pyspark.sql import functions as F

        sf = "/root/testdata/sf0.001"
        row = QUERIES["stats_ks_test"](spark, sf).collect()[0]
        ev = load_table(spark, sf, "events").collect()
        a = sorted(
            _q100(r["value"]) for r in ev
            if r["event_type"] == "purchase"
        )
        b = sorted(
            _q100(r["value"]) for r in ev if r["event_type"] == "view"
        )
        grid = sorted(set(a) | set(b))
        import bisect

        d = max(
            abs(
                bisect.bisect_right(a, v) / len(a)
                - bisect.bisect_right(b, v) / len(b)
            )
            for v in grid
        )
        assert row["n1"] == len(a) and row["n2"] == len(b)
        assert abs(row["ks"] - d) < 2e-6
        assert row["reject"] in (0, 1)

    def test_ks_zero_on_identical_samples(self, spark):
        import os, tempfile
        import pandas as pd

        from speech_data_pipeline_spark.queries.registry import QUERIES

        rows = []
        for i, v in enumerate([1.0, 2.0, 3.0] * 10):
            rows.append((2 * i, 1_700_000_000_000_000_000 + i, 1,
                         "purchase", v, "{}"))
            rows.append((2 * i + 1, 1_700_000_000_000_000_000 + i, 2,
                         "view", v, "{}"))
        df = pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value",
                     "props"],
        )
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "events.parquet"))
            row = QUERIES["stats_ks_test"](spark, d).collect()[0]
        assert row["ks"] == 0.0 and row["reject"] == 0


class TestGiniRevenue:
    def test_gini_matches_brute_sorted_rank(self, spark):
        # Brute replay: per-customer revenue on the same dollar grid,
        # G = 2*sum(i*x_i)/(n*S) - (n+1)/n over the ascending sort.
        from collections import defaultdict

        from speech_data_pipeline_spark.queries.registry import QUERIES
        from speech_data_pipeline_spark.sources.catalog import load_table

        sf = "/root/testdata/sf0.001"
        row = QUERIES["stats_gini_revenue"](spark, sf).collect()[0]
        rev = defaultdict(int)
        for r in load_table(spark, sf, "orders").collect():
            rev[r["o_custkey"]] += math.floor(r["o_totalprice"] * 100 + 0.5)
        vals = sorted(v // 100 for v in rev.values())
        n, s = len(vals), sum(vals)
        g = (
            2.0 * sum((i + 1) * v for i, v in enumerate(vals)) / (n * s)
            - (n + 1.0) / n
        )
        assert row["n_customers"] == n
        assert abs(row["gini"] - g) < 2e-6
        assert 0.0 <= row["gini"] < 1.0

    def test_gini_zero_on_equal_revenues(self, spark):
        import os, tempfile
        import pandas as pd

        from speech_data_pipeline_spark.queries.registry import QUERIES

        df = pd.DataFrame(
            {
                "o_orderkey": range(60),
                "o_custkey": [i % 20 for i in range(60)],
                "o_orderstatus": ["F"] * 60,
                "o_totalprice": [100.0] * 60,
                "o_orderdate": ["1995-01-01"] * 60,
                "o_orderpriority": ["1-URGENT"] * 60,
            }
        )
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "orders.parquet"))
            row = QUERIES["stats_gini_revenue"](spark, d).collect()[0]
        assert row["n_customers"] == 20
        assert row["gini"] == 0.0


class TestWasserstein1d:
    def test_w1_matches_brute_cdf_integral(self, spark):
        from speech_data_pipeline_spark.queries.registry import QUERIES
        from speech_data_pipeline_spark.sources.catalog import load_table

        sf = "/root/testdata/sf0.001"
        row = QUERIES["stats_wasserstein_1d"](spark, sf).collect()[0]
        ev = load_table(spark, sf, "events").collect()
        a = sorted(
            _q100(r["value"]) for r in ev
            if r["event_type"] == "purchase"
        )
        b = sorted(
            _q100(r["value"]) for r in ev if r["event_type"] == "view"
        )
        import bisect

        grid = sorted(set(a) | set(b))
        w1 = sum(
            abs(
                bisect.bisect_right(a, v) / len(a)
                - bisect.bisect_right(b, v) / len(b)
            )
            * (grid[i + 1] - grid[i])
            for i, v in enumerate(grid[:-1])
        ) / 100.0
        assert row["n1"] == len(a) and row["n2"] == len(b)
        assert abs(row["w1"] - w1) < 2e-6

    def test_w1_zero_on_identical_samples(self, spark):
        import os, tempfile
        import pandas as pd

        from speech_data_pipeline_spark.queries.registry import QUERIES

        rows = []
        for i, v in enumerate([1.0, 5.0, 9.0] * 8):
            rows.append((2 * i, 1_700_000_000_000_000_000 + i, 1,
                         "purchase", v, "{}"))
            rows.append((2 * i + 1, 1_700_000_000_000_000_000 + i, 2,
                         "view", v, "{}"))
        df = pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value",
                     "props"],
        )
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "events.parquet"))
            row = QUERIES["stats_wasserstein_1d"](spark, d).collect()[0]
        assert row["w1"] == 0.0

    def test_w1_equals_mean_shift_on_point_masses(self, spark):
        # Two point masses delta apart: W1 = the shift.
        import os, tempfile
        import pandas as pd

        from speech_data_pipeline_spark.queries.registry import QUERIES

        rows = []
        for i in range(20):
            rows.append((2 * i, 1_700_000_000_000_000_000 + i, 1,
                         "purchase", 10.0, "{}"))
            rows.append((2 * i + 1, 1_700_000_000_000_000_000 + i, 2,
                         "view", 17.5, "{}"))
        df = pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value",
                     "props"],
        )
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "events.parquet"))
            row = QUERIES["stats_wasserstein_1d"](spark, d).collect()[0]
        assert abs(row["w1"] - 7.5) < 2e-6


class TestMannWhitneyU:
    def test_u_matches_brute_rank_sum(self, spark):
        import math

        from speech_data_pipeline_spark.queries.registry import QUERIES
        from speech_data_pipeline_spark.sources.catalog import load_table

        sf = "/root/testdata/sf0.001"
        row = QUERIES["stats_mannwhitney_u"](spark, sf).collect()[0]
        ev = load_table(spark, sf, "events").collect()
        a = [_q100(r["value"]) for r in ev
             if r["event_type"] == "purchase"]
        b = [_q100(r["value"]) for r in ev
             if r["event_type"] == "view"]
        pooled = sorted(a + b)
        # midranks
        from collections import Counter, defaultdict

        cnt = Counter(pooled)
        rank = {}
        start = 1
        for v in sorted(cnt):
            t = cnt[v]
            rank[v] = start + (t - 1) / 2.0
            start += t
        r1 = sum(rank[v] for v in a)
        u = r1 - len(a) * (len(a) + 1) / 2.0
        n1, n2, n = len(a), len(b), len(a) + len(b)
        ties = sum(t**3 - t for t in cnt.values())
        sigma = math.sqrt(
            n1 * n2 / 12.0 * ((n + 1) - ties / (n * (n - 1)))
        )
        z = (u - n1 * n2 / 2.0) / sigma
        assert row["n1"] == n1 and row["n2"] == n2
        assert abs(row["u"] - u) < 1e-6
        assert abs(row["z"] - z) < 2e-6
        assert abs(row["auc"] - u / (n1 * n2)) < 2e-6

    def test_u_is_half_on_identical_distributions(self, spark):
        import os, tempfile
        import pandas as pd

        from speech_data_pipeline_spark.queries.registry import QUERIES

        rows = []
        for i, v in enumerate([1.0, 2.0, 3.0, 4.0] * 10):
            rows.append((2 * i, 1_700_000_000_000_000_000 + i, 1,
                         "purchase", v, "{}"))
            rows.append((2 * i + 1, 1_700_000_000_000_000_000 + i, 2,
                         "view", v, "{}"))
        df = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type",
                           "value", "props"])
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "events.parquet"))
            row = QUERIES["stats_mannwhitney_u"](spark, d).collect()[0]
        assert row["auc"] == 0.5 and row["reject"] == 0


class TestMadOutliers:
    def test_mad_matches_brute_per_type(self, spark):
        from collections import defaultdict

        from speech_data_pipeline_spark.queries.registry import QUERIES
        from speech_data_pipeline_spark.sources.catalog import load_table

        sf = "/root/testdata/sf0.001"
        got = {r["event_type"]: r
               for r in QUERIES["stats_mad_outliers"](spark, sf).collect()}
        vals = defaultdict(list)
        for r in load_table(spark, sf, "events").collect():
            vals[r["event_type"]].append(_q100(r["value"]))

        def lomed(xs):
            xs = sorted(xs)
            return xs[(len(xs) + 1) // 2 - 1]

        for t, xs in vals.items():
            med = lomed(xs)
            mad = lomed([abs(x - med) for x in xs])
            nout = sum(1 for x in xs
                       if 10000 * abs(x - med) > 44478 * mad)
            assert got[t]["n"] == len(xs)
            assert got[t]["med"] == med / 100.0
            assert got[t]["mad"] == mad / 100.0
            assert got[t]["n_outliers"] == nout

    def test_mad_robust_to_planted_outliers(self, spark):
        import os, tempfile
        import pandas as pd

        from speech_data_pipeline_spark.queries.registry import QUERIES

        vals = [10.0] * 40 + [10.5] * 40 + [9.5] * 40 + [500.0] * 3
        rows = [(i, 1_700_000_000_000_000_000 + i, 1, "purchase", v, "{}")
                for i, v in enumerate(vals)]
        df = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type",
                           "value", "props"])
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "events.parquet"))
            row = QUERIES["stats_mad_outliers"](spark, d).collect()[0]
        assert row["med"] == 10.0
        assert row["mad"] == 0.5
        assert row["n_outliers"] == 3  # exactly the planted spikes


class TestTheilSen:
    def test_matches_brute_pairwise_median(self, spark):
        from collections import defaultdict

        from speech_data_pipeline_spark.queries.registry import QUERIES
        from speech_data_pipeline_spark.sources.catalog import load_table

        sf = "/root/testdata/sf0.001"
        row = QUERIES["stats_theil_sen"](spark, sf).collect()[0]
        weekly = defaultdict(int)
        for r in load_table(spark, sf, "events").collect():
            if r["event_type"] == "purchase":
                weekly[(r["ts"] // 1000) // 604_800_000_000] += math.floor(
                    r["value"] * 1000 + 0.5
                )
        wks = sorted(weekly)
        slopes = []
        for i in range(len(wks)):
            for j in range(i + 1, len(wks)):
                num = 1_000_000 * (weekly[wks[j]] - weekly[wks[i]])
                den = wks[j] - wks[i]
                q = abs(num) // den
                slopes.append(q if num >= 0 else -q)  # trunc toward 0
        slopes.sort()
        med = slopes[(len(slopes) + 1) // 2 - 1]
        assert row["n_weeks"] == len(wks)
        assert row["n_pairs"] == len(slopes)
        exp = math.floor(med / 1e6 / 1000.0 * 1e6) / 1e6
        assert row["slope_per_week"] == exp

    def test_ignores_single_corrupted_week(self, spark):
        import os, tempfile
        import pandas as pd

        from speech_data_pipeline_spark.queries.registry import QUERIES

        week_ns = 604_800_000_000_000
        rows = []
        eid = 0
        for w in range(30):
            # clean linear trend: 100 + 2*w, one spike at week 15
            val = 100.0 + 2.0 * w + (100000.0 if w == 15 else 0.0)
            rows.append((eid, 1_600_000_000_000_000_000 + w * week_ns,
                         1, "purchase", val, "{}"))
            eid += 1
        df = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type",
                           "value", "props"])
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "events.parquet"))
            row = QUERIES["stats_theil_sen"](spark, d).collect()[0]
        assert abs(row["slope_per_week"] - 2.0) < 0.01


class TestSprtSequential:
    def test_crafted_high_rate_crosses_up(self, spark):
        import math
        import os, tempfile

        import pandas as pd

        from speech_data_pipeline_spark.queries.registry import QUERIES

        # 30% purchase rate (above p1=0.22): the LLR walk must cross
        # the upper barrier and stop.
        base_ns = 1_700_000_000_000_000_000
        day_ns = 86_400_000_000_000
        rows = []
        eid = 0
        for d in range(40):
            for i in range(100):
                et = "purchase" if i < 30 else "view"
                rows.append((eid, base_ns + d * day_ns + i * 1000, 1,
                             et, 1.0, "{}"))
                eid += 1
        df = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type",
                           "value", "props"])
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "events.parquet"))
            row = QUERIES["ab_sprt_sequential"](spark, d).collect()[0]
        assert row["decision"] == "accept_h1"
        # brute walk to find the exact crossing day
        l1 = math.floor(math.log(0.22 / 0.18) * 1e9)
        l0 = math.floor(math.log(0.78 / 0.82) * 1e9)
        a = math.floor(math.log(19.0) * 1e9)
        cum, cross = 0, None
        day0 = base_ns // 1000 // 86_400_000_000
        for d in range(40):
            cum += 30 * l1 + 70 * l0
            if cross is None and (cum >= a or cum <= -a):
                cross = day0 + d
        assert row["first_cross_day"] == cross
        assert row["total_trials"] == 4000
        assert row["total_conv"] == 1200

    def test_fixture_walk_matches_brute(self, spark):
        import math
        from collections import defaultdict

        from speech_data_pipeline_spark.queries.registry import QUERIES
        from speech_data_pipeline_spark.sources.catalog import load_table

        sf = "/root/testdata/sf0.001"
        row = QUERIES["ab_sprt_sequential"](spark, sf).collect()[0]
        daily = defaultdict(lambda: [0, 0])
        for r in load_table(spark, sf, "events").collect():
            d = (r["ts"] // 1000) // 86_400_000_000
            daily[d][0] += 1
            daily[d][1] += r["event_type"] == "purchase"
        l1 = math.floor(math.log(0.22 / 0.18) * 1e9)
        l0 = math.floor(math.log(0.78 / 0.82) * 1e9)
        cum = 0
        for d in sorted(daily):
            n, c = daily[d]
            cum += c * l1 + (n - c) * l0
        assert row["n_days"] == len(daily)
        assert row["final_llr"] == math.floor(cum / 1e9 * 1e6) / 1e6


class TestPrefixTopk:
    def test_matches_brute_counter(self, spark):
        import re
        from collections import Counter, defaultdict

        from speech_data_pipeline_spark.queries.registry import QUERIES
        from speech_data_pipeline_spark.sources.catalog import load_table

        sf = "/root/testdata/sf0.001"
        got = defaultdict(list)
        for r in QUERIES["search_prefix_topk"](spark, sf).collect():
            got[r["prefix"]].append((r["rank"], r["word"], r["freq"]))
        cnt = Counter()
        for r in load_table(spark, sf, "documents").collect():
            cnt.update(re.findall(r"[a-z]+", r["text"].lower()))
        byp = defaultdict(list)
        for w, c in cnt.items():
            if len(w) >= 3:
                byp[w[:3]].append((-c, w))
        for p, lst in byp.items():
            lst.sort()
            exp = [(i + 1, w, -negc)
                   for i, (negc, w) in enumerate(lst[:3])]
            assert sorted(got[p]) == exp
        assert set(got) == set(byp)


class TestTrimmedMean:
    def test_matches_brute_sorted_trim(self, spark):
        import math
        from collections import defaultdict

        from speech_data_pipeline_spark.queries.registry import QUERIES
        from speech_data_pipeline_spark.sources.catalog import load_table

        sf = "/root/testdata/sf0.001"
        got = {r["event_type"]: r
               for r in QUERIES["stats_trimmed_mean"](spark, sf).collect()}
        vals = defaultdict(list)
        for r in load_table(spark, sf, "events").collect():
            vals[r["event_type"]].append(_q100(r["value"]))
        for t, xs in vals.items():
            xs.sort()
            k = len(xs) // 10
            kept = xs[k:len(xs) - k]
            tm = sum(kept) / len(kept) / 100.0
            assert got[t]["n"] == len(xs)
            assert got[t]["n_trimmed_each_side"] == k
            assert got[t]["trimmed_mean"] == math.floor(tm * 1e6) / 1e6

    def test_immune_to_planted_extremes(self, spark):
        import os, tempfile
        import pandas as pd

        from speech_data_pipeline_spark.queries.registry import QUERIES

        vals = [10.0] * 90 + [100000.0] * 5 + [0.01] * 5
        rows = [(i, 1_700_000_000_000_000_000 + i, 1, "purchase", v, "{}")
                for i, v in enumerate(vals)]
        df = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type",
                           "value", "props"])
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "events.parquet"))
            row = QUERIES["stats_trimmed_mean"](spark, d).collect()[0]
        assert row["n_trimmed_each_side"] == 10
        assert row["trimmed_mean"] == 10.0  # extremes fully trimmed


class TestDiffInDiff:
    def test_recovers_planted_treatment_effect(self, spark):
        import os, tempfile
        import pandas as pd

        from speech_data_pipeline_spark.queries.registry import QUERIES

        # common trend +2; the hash cohort gets an EXTRA +5 post.
        import hashlib

        def cohort(u):
            return int(hashlib.md5(f"did:{u}".encode())
                       .hexdigest()[:7], 16) % 2

        base_ns = 1_700_000_000_000_000_000
        day_ns = 86_400_000_000_000
        rows, eid = [], 0
        n_t = n_c = 0
        for u in range(40):
            treated = cohort(u) == 1
            for d in range(20):
                post = d >= 10
                v = 10.0 + (2.0 if post else 0.0) + (
                    5.0 if treated and post else 0.0
                )
                rows.append((eid, base_ns + d * day_ns + u, u,
                             "purchase", v, "{}"))
                eid += 1
                if treated:
                    n_t += 1
                else:
                    n_c += 1
        df = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type",
                           "value", "props"])
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "events.parquet"))
            r = QUERIES["ab_diff_in_diff"](spark, d).collect()[0]
        assert abs(r["did"] - 5.0) < 1e-6
        assert abs((r["control_post"] - r["control_pre"]) - 2.0) < 1e-6
        assert r["n_treat"] == n_t and r["n_control"] == n_c

    def test_fixture_matches_brute(self, spark):
        import math
        from collections import defaultdict

        from speech_data_pipeline_spark.queries.registry import QUERIES
        from speech_data_pipeline_spark.sources.catalog import load_table

        sf = "/root/testdata/sf0.001"
        r = QUERIES["ab_diff_in_diff"](spark, sf).collect()[0]
        ev = load_table(spark, sf, "events").collect()
        import hashlib

        days = [(e["ts"] // 1000) // 86_400_000_000 for e in ev]
        mid = (min(days) + max(days)) // 2
        cells = defaultdict(lambda: [0, 0])
        for e in ev:
            if e["event_type"] != "purchase":
                continue
            g = int(hashlib.md5(f"did:{e['user_id']}".encode())
                    .hexdigest()[:7], 16) % 2
            p = 1 if (e["ts"] // 1000) // 86_400_000_000 > mid else 0
            cells[(g, p)][0] += 1
            cells[(g, p)][1] += math.floor(e["value"] * 1000 + 0.5)
        mean = {k: v[1] / v[0] for k, v in cells.items()}
        did = (mean[(1, 1)] - mean[(1, 0)]) - (
            mean[(0, 1)] - mean[(0, 0)]
        )
        assert r["did"] == math.floor(did / 1000.0 * 1e6) / 1e6
        assert r["n_treat"] == cells[(1, 0)][0] + cells[(1, 1)][0]


class TestChangepointSSE:
    def test_recovers_planted_level_shift(self, spark, tmp_path):
        """A clean level shift at a known day must be the argmin-SSE
        split, and the reported means must be the segment means."""
        import math

        from speech_data_pipeline_spark.queries.stats_q import (
            ts_changepoint_sse,
        )

        # 20 days x 5 events/day: level 10.0 before day 10, 20.0 after
        US_DAY = 86_400_000_000
        rows = []
        for day in range(20):
            for i in range(5):
                v = 10.0 if day < 10 else 20.0
                v += 0.001 * i  # tiny within-day texture
                rows.append(
                    (1, "click", (day * US_DAY + i) * 1000, float(v))
                )
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts long, value double"
        )
        # the registered query reads events through the catalog's
        # TIMESTAMP(NANOS) normalization (covered by the oracle gate);
        # these tests pin the MATH by replaying the plan body on an
        # epoch-nanos frame directly.
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        mv = F.floor(F.col("value") * F.lit(1000.0) + F.lit(0.5)).cast(
            "long"
        )
        daily = df.groupBy(
            "event_type",
            F.expr("(ts div 1000) div 86400000000").alias("day"),
        ).agg(F.count(F.lit(1)).alias("n"), F.sum(mv).alias("s"))
        w_cum = (
            Window.partitionBy("event_type")
            .orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_tot = Window.partitionBy("event_type")
        cum = daily.select(
            "event_type",
            "day",
            F.sum("n").over(w_cum).alias("cn"),
            F.sum("s").over(w_cum).alias("cs"),
            F.sum("n").over(w_tot).alias("tn"),
            F.sum("s").over(w_tot).alias("ts"),
        )
        d = lambda c: c.cast("double")  # noqa: E731
        scored = cum.where(F.col("cn") < F.col("tn")).withColumn(
            "score",
            d(F.col("cs")) * d(F.col("cs")) / d(F.col("cn"))
            + d(F.col("ts") - F.col("cs"))
            * d(F.col("ts") - F.col("cs"))
            / d(F.col("tn") - F.col("cn")),
        )
        w_rank = Window.partitionBy("event_type").orderBy(
            F.col("score").desc(), "day"
        )
        best = scored.withColumn(
            "rk", F.row_number().over(w_rank)
        ).where(F.col("rk") == 1).collect()
        assert len(best) == 1
        r = best[0]
        assert r.day == 9  # split AFTER day 9: left = days 0..9
        assert r.cn == 50 and r.tn - r.cn == 50
        mean_l = r.cs / r.cn / 1000.0
        mean_r = (r.ts - r.cs) / (r.tn - r.cn) / 1000.0
        assert math.isclose(mean_l, 10.002, abs_tol=1e-9)
        assert math.isclose(mean_r, 20.002, abs_tol=1e-9)

    def test_brute_force_argmax_agreement(self, spark):
        """The window-sum argmax must equal a brute-force scan over
        all splits on an irregular series."""
        import random

        from pyspark.sql import Window
        from pyspark.sql import functions as F

        rng = random.Random(3)
        US_DAY = 86_400_000_000
        rows = []
        series = []
        for day in range(15):
            n = rng.randint(1, 4)
            for i in range(n):
                v = rng.uniform(-5, 5) + (3.0 if day >= 6 else 0.0)
                series.append((day, round(v, 3)))
                rows.append((1, "view", (day * US_DAY + i) * 1000, v))
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts long, value double"
        )
        mv = F.floor(F.col("value") * F.lit(1000.0) + F.lit(0.5)).cast(
            "long"
        )
        daily = df.groupBy(
            "event_type",
            F.expr("(ts div 1000) div 86400000000").alias("day"),
        ).agg(F.count(F.lit(1)).alias("n"), F.sum(mv).alias("s"))
        w_cum = (
            Window.partitionBy("event_type")
            .orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_tot = Window.partitionBy("event_type")
        cum = daily.select(
            "day",
            F.sum("n").over(w_cum).alias("cn"),
            F.sum("s").over(w_cum).alias("cs"),
            F.sum("n").over(w_tot).alias("tn"),
            F.sum("s").over(w_tot).alias("ts"),
        )
        d = lambda c: c.cast("double")  # noqa: E731
        got = (
            cum.where(F.col("cn") < F.col("tn"))
            .withColumn(
                "score",
                d(F.col("cs")) * d(F.col("cs")) / d(F.col("cn"))
                + d(F.col("ts") - F.col("cs"))
                * d(F.col("ts") - F.col("cs"))
                / d(F.col("tn") - F.col("cn")),
            )
            .orderBy(F.col("score").desc(), "day")
            .limit(1)
            .collect()[0]
        )
        # brute force in python on integer millis
        from collections import defaultdict

        ds = defaultdict(lambda: [0, 0])
        for day, v in series:
            import math as m

            ds[day][0] += 1
            ds[day][1] += m.floor(v * 1000.0 + 0.5)
        days = sorted(ds)
        tot_n = sum(ds[x][0] for x in days)
        tot_s = sum(ds[x][1] for x in days)
        best = None
        cn = cs = 0
        for x in days[:-1]:
            cn += ds[x][0]
            cs += ds[x][1]
            sc = cs * cs / cn + (tot_s - cs) ** 2 / (tot_n - cn)
            if best is None or sc > best[0] + 1e-12:
                best = (sc, x)
        assert got.day == best[1]
