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
