"""Gopher quality rules and DSIR importance selection: semantic
properties beyond the oracle's value equality."""

import pytest

SF = "/root/testdata/sf0.001"


def test_gopher_keep_is_conjunction_of_flags(spark):
    from speech_data_pipeline_spark.queries.selection_q import text_gopher_rules

    out = text_gopher_rules(spark, SF).collect()
    assert out
    for r in out:
        assert r["keep"] == (
            r["ok_word_count"]
            and r["ok_mean_word_len"]
            and r["ok_symbol_ratio"]
            and r["ok_stopwords"]
        )
        assert r["n_words"] >= 0 and r["n_stop"] >= 0
        assert 0.0 <= r["symbol_ratio"]


def test_gopher_rules_on_crafted_documents(spark):
    """Each rule must fire on a document built to violate exactly it."""
    import os
    import tempfile

    from speech_data_pipeline_spark.queries import selection_q

    good = "the cat and the dog have fun with some long words here " * 3
    docs = [
        (0, good, "en", "s", 1),  # passes everything
        (1, "the of and to", "en", "s", 1),  # too few words
        (2, "a b c d " * 10 + "the of", "en", "s", 1),  # mean word len < 3
        (3, good + " ##########" * 20, "en", "s", 1),  # symbol ratio
        (4, "zebra quagga wombat numbat " * 10, "en", "s", 1),  # no stopwords
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as td:
        df.coalesce(1).write.parquet(os.path.join(td, "documents.parquet"))
        out = {
            r["doc_id"]: r for r in selection_q.text_gopher_rules(spark, td).collect()
        }
    assert out[0]["keep"]
    assert not out[1]["ok_word_count"] and not out[1]["keep"]
    assert not out[2]["ok_mean_word_len"] and not out[2]["keep"]
    assert not out[3]["ok_symbol_ratio"] and not out[3]["keep"]
    assert not out[4]["ok_stopwords"] and not out[4]["keep"]


def test_dsir_ranks_target_domain_docs_first(spark):
    """Importance weights must rank documents written in the target
    domain's vocabulary above out-of-domain ones."""
    import os
    import tempfile

    from speech_data_pipeline_spark.queries import selection_q

    # target (lang=en) shares vocabulary A; others use vocabulary B;
    # two held docs (lang=xx) written in vocabulary A must outrank the
    # vocabulary-B crowd.
    va = "alpha beta gamma delta epsilon"
    vb = "zork grum thok blarg wuzzle"
    docs = (
        [(i, va, "en", "s", 1) for i in range(20)]
        + [(100 + i, vb, "de", "s", 1) for i in range(20)]
        + [(900, va + " " + va, "xx", "s", 1), (901, vb, "xx", "s", 1)]
    )
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as td:
        df.coalesce(1).write.parquet(os.path.join(td, "documents.parquet"))
        top = selection_q.select_dsir_importance(spark, td).collect()
    scores = {r["doc_id"]: r["score_q"] for r in top}
    assert scores[900] > scores[901]
    # every vocabulary-A doc outranks every vocabulary-B doc
    a_min = min(s for d, s in scores.items() if d < 20 or d == 900)
    b_max = max(s for d, s in scores.items() if 100 <= d < 120 or d == 901)
    assert a_min > b_max


def test_dsir_deterministic_across_partitioning(spark):
    from tests.conftest import rows

    from speech_data_pipeline_spark.queries.selection_q import (
        select_dsir_importance,
    )

    a = rows(select_dsir_importance(spark, SF))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = rows(select_dsir_importance(spark, SF))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def test_pareto_front_matches_bruteforce(spark):
    """O(n²) dominance replay over (n_chars, distinct_ppm)."""
    import re

    from speech_data_pipeline_spark.queries.selection_q import (
        select_pareto_front,
    )
    from speech_data_pipeline_spark.sources.catalog import load_table

    pts = []
    for r in (
        load_table(spark, SF, "documents")
        .select("doc_id", "n_chars", "text")
        .collect()
    ):
        w = re.findall(r"[a-z]+", r["text"].lower())
        ppm = (1_000_000 * len(set(w))) // len(w) if w else 0
        pts.append((r["doc_id"], r["n_chars"], ppm))
    exp = sorted(
        (
            (d, x, y)
            for d, x, y in pts
            if not any(
                bx >= x and by >= y and (bx > x or by > y)
                for _, bx, by in pts
            )
        ),
        key=lambda p: (-p[1], p[0]),
    )
    got = [
        (r["doc_id"], r["n_chars"], r["distinct_ppm"])
        for r in select_pareto_front(spark, SF).collect()
    ]
    assert got == exp
    # Front is a proper anti-chain: strictly decreasing y along
    # decreasing x groups.
    seen_x = {}
    for _, x, y in got:
        seen_x.setdefault(x, y)
        assert seen_x[x] == y  # same-x survivors share the group max


def test_quantile_normalize_matches_bruteforce(spark):
    from speech_data_pipeline_spark.queries.selection_q import (
        score_quantile_normalize,
    )
    from speech_data_pipeline_spark.sources.catalog import load_table

    rows_in = [
        (r["doc_id"], r["source"], r["n_chars"])
        for r in load_table(spark, SF, "documents")
        .select("doc_id", "source", "n_chars")
        .collect()
    ]
    n = len(rows_in)
    # pooled CDF in ppm over distinct values
    from collections import Counter

    vc = Counter(s for _, _, s in rows_in)
    vals = sorted(vc)
    cum, cdf = 0, {}
    for v in vals:
        cum += vc[v]
        cdf[v] = (1_000_000 * cum) // n
    # within-source percent ranks
    from collections import defaultdict

    by_src = defaultdict(list)
    for d, src, s in rows_in:
        by_src[src].append((s, d))
    exp = {}
    for src, lst in by_src.items():
        lst.sort()
        c = len(lst)
        for i, (s, d) in enumerate(lst):
            pr = (1_000_000 * i) // (c - 1) if c > 1 else 0
            norm = next(v for v in vals if cdf[v] >= pr)
            exp[d] = (src, s, pr, norm)
    got = {
        r["doc_id"]: (r["source"], r["score"], r["pr_ppm"], r["norm_score"])
        for r in score_quantile_normalize(spark, SF).collect()
    }
    assert got == exp
    # Monotone within source: higher rank never maps lower.
    for src, lst in by_src.items():
        lst.sort()
        norms = [exp[d][3] for _, d in lst]
        assert norms == sorted(norms)
