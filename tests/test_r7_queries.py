"""Round-7 additions: Bradley–Terry preference fit, per-language
token-distribution entropy, and the LSH blocking precision audit —
fixture replays of the quantized trajectories plus sanity properties
on the test corpus."""

import math

from pyspark.sql import functions as F

from speech_data_pipeline_spark.queries.behavior_q import (
    _BT_ROUNDS,
    bradley_terry_fit,
    pref_bradley_terry,
)
from speech_data_pipeline_spark.queries.text_q import (
    sim_blocked_precision,
    text_unigram_entropy,
)

SF = "/root/testdata/sf0.001"


def _bt_numpy_replay(wl, rounds):
    """Exact integer-trajectory replay of bradley_terry_fit on a
    directed win-count list [(win, lose, cnt)]."""
    pairs: dict = {}
    wins: dict = {}
    for w, l, c in wl:
        pairs[(w, l)] = pairs.get((w, l), 0) + c
        pairs[(l, w)] = pairs.get((l, w), 0) + c
        wins[w] = wins.get(w, 0) + c
    items = sorted({i for i, _ in pairs})
    pi = {i: 1_000_000 for i in items}
    for _ in range(rounds):
        dn = {i: 0 for i in items}
        for (i, j), n in pairs.items():
            term = float(n) * 1_000_000.0 / float(max(pi[i] + pi[j], 1))
            dn[i] += math.floor(term * 1_000_000_000.0)
        raw = {
            i: (wins.get(i, 0) * 10**15) // max(dn[i], 1) for i in items
        }
        s = max(sum(raw.values()), 1)
        m = len(items)
        pi = {i: (raw[i] * m * 1_000_000) // s for i in items}
    return pi


class TestBradleyTerry:
    def test_fit_matches_integer_replay(self, spark):
        wl = [("a", "b", 9), ("b", "a", 1), ("b", "c", 9),
              ("c", "b", 1), ("a", "c", 9), ("c", "a", 1)]
        df = spark.createDataFrame(wl, "win string, lose string, cnt long")
        got = {
            r["i"]: r["pi"]
            for r in bradley_terry_fit(df, _BT_ROUNDS).collect()
        }
        want = _bt_numpy_replay(wl, _BT_ROUNDS)
        assert got == want

    def test_transitive_design_orders_strengths(self, spark):
        # a > b > c by a wide margin must come out monotone.
        wl = [("a", "b", 9), ("b", "a", 1), ("b", "c", 9),
              ("c", "b", 1), ("a", "c", 9), ("c", "a", 1)]
        df = spark.createDataFrame(wl, "win string, lose string, cnt long")
        pi = {r["i"]: r["pi"] for r in bradley_terry_fit(df).collect()}
        assert pi["a"] > pi["b"] > pi["c"] > 0

    def test_never_winner_converges_to_zero(self, spark):
        wl = [("a", "z", 5), ("b", "z", 5), ("a", "b", 3), ("b", "a", 3)]
        df = spark.createDataFrame(wl, "win string, lose string, cnt long")
        pi = {r["i"]: r["pi"] for r in bradley_terry_fit(df).collect()}
        assert pi["z"] == 0
        assert pi["a"] == pi["b"] > 0  # symmetric record -> equal strength

    def test_registered_query_properties(self, spark):
        out = pref_bradley_terry(spark, SF).collect()
        assert len(out) > 0
        total = sum(r["strength"] for r in out)
        assert abs(total - 1.0) < 1e-3  # trunc6 per item
        for r in out:
            assert 0.0 <= r["strength"] <= 1.0
            assert r["n_wins"] <= r["n_comparisons"]


class TestUnigramEntropy:
    def test_two_lang_fixture_matches_direct_formula(self, spark):
        docs = [
            (0, "x x x x", "aa", "s", 7),
            (1, "x y y z", "aa", "s", 7),
            (2, "p q", "bb", "s", 3),
        ]
        df = spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string,"
            " n_chars long"
        )
        import os
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            df.coalesce(1).write.parquet(os.path.join(d, "tmp"))
            part = [
                f
                for f in os.listdir(os.path.join(d, "tmp"))
                if f.endswith(".parquet")
            ][0]
            os.replace(
                os.path.join(d, "tmp", part),
                os.path.join(d, "documents.parquet"),
            )
            out = {
                r["lang"]: r
                for r in text_unigram_entropy(spark, d).collect()
            }
        # lang aa: counts x=5, y=2, z=1 over n=8
        n = 8
        terms = [
            math.floor(c / n * math.log(n / c) * 1e9) for c in (5, 2, 1)
        ]
        want_ent = (sum(terms) // 1000) / 1e6
        want_simpson = math.floor((25 + 4 + 1) / 64 * 1e6) / 1e6
        aa = out["aa"]
        assert aa["n_tokens"] == 8 and aa["vocab_size"] == 3
        assert aa["entropy_nats"] == want_ent
        assert aa["simpson"] == want_simpson
        # lang bb: uniform over 2 -> entropy ln 2 (quantized), simpson 0.5
        bb = out["bb"]
        assert abs(bb["entropy_nats"] - math.log(2)) < 1e-6
        assert bb["simpson"] == 0.5

    def test_corpus_bounds(self, spark):
        out = text_unigram_entropy(spark, SF).collect()
        assert len(out) > 0
        for r in out:
            # 0 <= H <= ln(vocab); 1/vocab <= simpson <= 1
            assert 0.0 <= r["entropy_nats"] <= math.log(r["vocab_size"]) + 1e-9
            assert 1.0 / r["vocab_size"] - 1e-9 <= r["simpson"] <= 1.0


class TestBlockedPrecision:
    def test_counts_are_consistent(self, spark):
        r = sim_blocked_precision(spark, SF).collect()[0]
        assert 0 <= r["n_qualifying"] <= r["n_cands"]
        if r["n_cands"]:
            assert abs(
                r["precision"]
                - math.floor(r["n_qualifying"] / r["n_cands"] * 1e6) / 1e6
            ) < 1e-9

    def test_qualifying_matches_blocked_allpairs(self, spark):
        from speech_data_pipeline_spark.operators import dedup as dd
        from speech_data_pipeline_spark.sources.catalog import load_table

        d = load_table(spark, SF, "documents")
        reps = dd.exact_collapse_reps(d)
        n_blocked = dd.allpairs_blocked_cosine(
            reps, t2_num=1, t2_den=2, ngram_n=3, k=16, shingle_len=5, bands=4
        ).count()
        r = sim_blocked_precision(spark, SF).collect()[0]
        assert r["n_qualifying"] == n_blocked


# ---------------------------------------------------------------------------
# Rank correlations + Heaps' law (round-7 batch 2)
# ---------------------------------------------------------------------------


def _midrank(a):
    import numpy as np

    order = np.argsort(a, kind="stable")
    r = np.empty(len(a), float)
    sa = a[order]
    i = 0
    while i < len(a):
        j = i
        while j + 1 < len(a) and sa[j + 1] == sa[i]:
            j += 1
        r[order[i : j + 1]] = (i + j) / 2 + 1
        i = j + 1
    return r


def test_spearman_matches_numpy_midranks(spark):
    import numpy as np

    from speech_data_pipeline_spark.queries.stats_q import stats_spearman
    from speech_data_pipeline_spark.sources.catalog import load_table

    row = stats_spearman(spark, SF).collect()[0]
    pdf = (
        load_table(spark, SF, "lineitem")
        .select("l_quantity", "l_extendedprice")
        .toPandas()
    )
    qx = pdf.l_quantity.to_numpy().astype(np.int64)
    qy = np.floor(pdf.l_extendedprice.to_numpy() * 100.0 + 0.5).astype(
        np.int64
    )
    ref = np.corrcoef(_midrank(qx), _midrank(qy))[0, 1]
    assert row["n"] == len(qx)
    assert abs(row["rho"] - ref) < 2e-6
    assert -1.0 <= row["rho"] <= 1.0


def test_kendall_tau_matches_brute_pairs(spark):
    import collections

    import numpy as np

    from speech_data_pipeline_spark.queries.stats_q import stats_kendall_tau
    from speech_data_pipeline_spark.sources.catalog import load_table

    row = stats_kendall_tau(spark, SF).collect()[0]
    pdf = (
        load_table(spark, SF, "lineitem")
        .select("l_quantity", "l_extendedprice")
        .toPandas()
    )
    x = pdf.l_quantity.to_numpy().astype(np.int64)
    y = np.floor(pdf.l_extendedprice.to_numpy() / 1000.0).astype(np.int64)
    dx = np.sign(x[:, None] - x[None, :]).astype(np.int8)
    dy = np.sign(y[:, None] - y[None, :]).astype(np.int8)
    prod = dx.astype(np.int16) * dy
    conc = int((prod > 0).sum() // 2)
    disc = int((prod < 0).sum() // 2)
    assert row["concordant"] == conc
    assert row["discordant"] == disc
    n = len(x)
    n0 = n * (n - 1) // 2
    n1 = sum(t * (t - 1) // 2 for t in collections.Counter(x).values())
    n2 = sum(t * (t - 1) // 2 for t in collections.Counter(y).values())
    ref = (conc - disc) / math.sqrt(float(n0 - n1) * float(n0 - n2))
    assert abs(row["tau_b"] - ref) < 2e-6


def test_heaps_law_fit_matches_numpy_ols(spark):
    import numpy as np

    from speech_data_pipeline_spark.queries.text_q import text_heaps_law
    from speech_data_pipeline_spark.sources.catalog import load_table

    row = text_heaps_law(spark, SF).collect()[0]

    # Driver replay of the bucket construction (document order = id).
    pdf = load_table(spark, SF, "documents").select("doc_id", "text").toPandas()
    max_id = int(pdf.doc_id.max())
    cum_t: dict = {}
    for _, r in pdf.iterrows():
        b = min(9, int(r.doc_id) * 10 // (max_id + 1))
        toks = [t for t in r.text.split() if t]
        cum_t[b] = cum_t.get(b, 0) + max(len(toks) - 1, 0)
    # first-seen bucket during an id-ascending scan == min bucket
    firstb: dict = {}
    for _, r in pdf.sort_values("doc_id").iterrows():
        b = min(9, int(r.doc_id) * 10 // (max_id + 1))
        toks = [t for t in r.text.split() if t]
        for w1, w2 in zip(toks, toks[1:]):
            k = f"{w1} {w2}"
            if k not in firstb:
                firstb[k] = b
    xs, ys = [], []
    ct = cv = 0
    for b in sorted(cum_t):
        ct += cum_t[b]
        cv += sum(1 for v in firstb.values() if v == b)
        if ct > 0 and cv > 0:
            # the query's per-point ppb quantization
            xs.append(math.floor(math.log(ct) * 1e9) / 1e9)
            ys.append(math.floor(math.log(cv) * 1e9) / 1e9)
    k = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    sxy = sum(a * b for a, b in zip(xs, ys))
    beta = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    ln_k = (sy - beta * sx) / k
    assert row["n_points"] == k
    assert row["tokens_total"] == ct
    assert row["vocab_total"] == cv
    assert abs(row["beta"] - beta) < 2e-6
    assert abs(row["ln_k"] - ln_k) < 2e-6
    assert 0.0 <= row["r2"] <= 1.0
    # vocabulary growth is monotone; with a closed 31-word synthetic
    # vocab the bigram curve saturates, so beta is small but >= 0
    assert row["beta"] >= 0.0


def test_cramers_v_matches_numpy(spark):
    import numpy as np

    from speech_data_pipeline_spark.queries.stats_q import stats_cramers_v
    from speech_data_pipeline_spark.sources.catalog import load_table

    row = stats_cramers_v(spark, SF).collect()[0]
    pdf = (
        load_table(spark, SF, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .toPandas()
    )
    tab = pdf.groupby(["l_returnflag", "l_linestatus"]).size().unstack(
        fill_value=0
    )
    M = tab.to_numpy().astype(float)
    n = M.sum()
    E = np.outer(M.sum(1), M.sum(0)) / n
    chi2 = ((M - E) ** 2 / E)[E > 0].sum()
    v = math.sqrt(chi2 / (n * min(M.shape[0] - 1, M.shape[1] - 1)))
    assert row["n"] == int(n)
    assert abs(row["chi2"] - chi2) < 1e-5
    assert abs(row["cramers_v"] - v) < 2e-6
    assert 0.0 <= row["cramers_v"] <= 1.0


def test_assortativity_matches_numpy(spark):
    import collections

    import numpy as np

    from speech_data_pipeline_spark.queries.corpus_q import (
        graph_assortativity,
    )
    from speech_data_pipeline_spark.sources.catalog import load_table

    row = graph_assortativity(spark, SF).collect()[0]
    pdf = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .toPandas()
    )
    edges = set()
    for _, grp in pdf.groupby("l_orderkey"):
        ps = sorted(set(grp.l_partkey))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    deg = collections.Counter()
    for x, y in edges:
        deg[x] += 1
        deg[y] += 1
    pts = []
    for x, y in edges:
        pts.append((deg[x], deg[y]))
        pts.append((deg[y], deg[x]))
    a = np.array(pts, dtype=float)
    ref = np.corrcoef(a[:, 0], a[:, 1])[0, 1]
    assert row["n_edges"] == len(edges)
    assert row["n_vertices"] == len(deg)
    assert abs(row["assortativity"] - ref) < 2e-6


def test_ece_consistent_with_calibration_bins(spark):
    from speech_data_pipeline_spark.queries.text_q import (
        eval_calibration_bins,
        eval_ece,
    )

    bins = eval_calibration_bins(spark, SF).collect()
    row = eval_ece(spark, SF).collect()[0]
    n = sum(b["n_docs"] for b in bins)
    ece = sum(b["n_docs"] * b["gap_ppm"] for b in bins) / n / 1e6
    mce = max(b["gap_ppm"] for b in bins) / 1e6
    assert row["n"] == n
    assert row["n_bins"] == len(bins)
    assert abs(row["ece"] - ece) < 2e-6
    assert abs(row["mce"] - mce) < 2e-6


def test_brier_score_matches_direct_mean(spark):
    from speech_data_pipeline_spark.operators import text as tx
    from speech_data_pipeline_spark.queries.text_q import eval_brier_score
    from speech_data_pipeline_spark.sources.catalog import load_table

    row = eval_brier_score(spark, SF).collect()[0]
    d = load_table(spark, SF, "documents")
    pdf = tx.quality_score(d).select(
        F.round(F.col("quality") * 1e6).cast("long").alias("q_ppm"),
        F.when(F.length("text") >= 200, 1).otherwise(0).alias("pos"),
    ).toPandas()
    ref = (
        ((pdf.q_ppm - 1_000_000 * pdf.pos) ** 2).sum() / len(pdf) / 1e12
    )
    assert row["n"] == len(pdf)
    assert abs(row["brier"] - ref) < 2e-6
    assert 0.0 <= row["brier"] <= 1.0
    # sanity: a proper score is bounded below by the calibration-free
    # variance floor base_rate*(1-base_rate) only for the BEST
    # predictor; here just check internal consistency of the anchors
    assert 0.0 <= row["base_rate"] <= 1.0
    assert 0.0 <= row["mean_pred"] <= 1.0


def test_ljung_box_composes_acf_outputs(spark):
    from speech_data_pipeline_spark.queries.behavior_q import (
        _LB_CRIT_PPM,
        ts_acf_lags,
        ts_ljung_box,
    )

    acf = ts_acf_lags(spark, SF).collect()
    got = {r["event_type"]: r for r in ts_ljung_box(spark, SF).collect()}
    by_type: dict = {}
    for r in acf:
        by_type.setdefault(r["event_type"], []).append(r)
    assert set(got) == set(by_type)
    for t, rows in by_type.items():
        n = rows[0]["n"]
        pico = sum(
            math.floor(r["acf"] * r["acf"] / (n - r["lag"]) * 1e12)
            for r in rows
        )
        q_ppm = math.floor(n * (n + 2.0) * pico / 1e12 * 1e6)
        assert got[t]["n"] == n
        assert got[t]["df"] == len(rows)
        assert got[t]["q_stat"] == q_ppm / 1e6
        assert got[t]["reject_white_noise"] == int(
            q_ppm > _LB_CRIT_PPM[len(rows) - 1]
        )
        assert got[t]["q_stat"] >= 0.0
