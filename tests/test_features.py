"""Feature-encoding queries (feature_q) and BM25 retrieval: semantic
properties beyond the oracle's value equality."""

import math

from pyspark.sql import functions as F

from speech_data_pipeline_spark.queries.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_target_encode_oof_excludes_own_fold(spark):
    """Brute-force the OOF mean on the fixture and compare."""
    from speech_data_pipeline_spark.sources.catalog import load_table

    rows = (
        load_table(spark, SF, "orders")
        .select(
            F.col("o_orderpriority").alias("cat"),
            (F.col("o_orderkey") % 5).alias("fold"),
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        .collect()
    )
    tot_s = sum(r["cents"] for r in rows)
    tot_n = len(rows)
    prior = tot_s / tot_n
    got = {
        (r["category"], r["fold"]): r
        for r in QUERIES["feat_target_encode_oof"](spark, SF).collect()
    }
    cells = {(r["cat"], r["fold"]) for r in rows}
    assert set(got) == cells
    for (cat, fold), g in got.items():
        oof = [
            r["cents"] for r in rows if r["cat"] == cat and r["fold"] != fold
        ]
        assert g["n_oof"] == len(oof)
        want = (sum(oof) + 10.0 * prior) / (len(oof) + 10.0)
        assert abs(g["enc_cents"] - want) < 2e-6


def test_woe_signs_and_marginals(spark):
    rows = QUERIES["feat_woe_iv"](spark, SF).collect()
    from speech_data_pipeline_spark.sources.catalog import load_table

    n_cust = load_table(spark, SF, "customer").count()
    assert sum(r["n_good"] + r["n_bad"] for r in rows) == n_cust
    for r in rows:
        # iv_term = (pg - pb) * woe: both factors share sign → iv >= 0
        # (up to trunc6 on each factor's product)
        assert r["iv_term"] >= -1e-6
        # woe sign must follow the smoothed odds direction
        pg = (r["n_good"] + 0.5)
        pb = (r["n_bad"] + 0.5)
        g_tot = sum(x["n_good"] for x in rows) + 5.0
        b_tot = sum(x["n_bad"] for x in rows) + 5.0
        want = math.log((pg / g_tot) / (pb / b_tot))
        assert abs(r["woe"] - want) < 2e-6


def test_bm25_scores_against_bruteforce(spark):
    """Replay BM25 in Python over the fixture corpus (same tokenizer,
    same k1/b) and check the returned top-k set and scores."""
    import re

    from speech_data_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    terms = ("hash", "window", "spark")
    toks = {r["doc_id"]: re.findall(r"[a-z]+", r["text"].lower()) for r in docs}
    n = len(docs)
    dls = {d: len(t) for d, t in toks.items()}
    avgdl = sum(dls.values()) / n
    dfs = {t: sum(1 for w in toks.values() if t in w) for t in terms}

    def score(d):
        s = 0.0
        for t in terms:
            tf = toks[d].count(t)
            if tf == 0:
                continue
            idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
            s += idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dls[d] / avgdl))
        return s

    want = sorted(
        ((score(d), d) for d in toks if score(d) > 0),
        key=lambda p: (-p[0], p[1]),
    )[:10]
    got = QUERIES["search_bm25_topk"](spark, SF).collect()
    assert [r["doc_id"] for r in got] == [d for _s, d in want]
    for r, (s, _d) in zip(got, want):
        assert abs(r["score"] - s) < 2e-6


def test_bm25_rewards_rarer_terms(spark):
    # A doc matching only the rarest term should outrank one matching
    # only the commonest term at equal tf/dl — idf monotonicity.
    got = QUERIES["search_bm25_topk"](spark, SF)
    assert got.count() <= 10
