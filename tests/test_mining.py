"""Semantics tests for the round-3 mining operators: substring-span
dedup, feature-hashed embeddings, temperature mixing, matrix-free PCA.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from speech_data_pipeline_spark.operators.dedup import duplicated_span_stats
from speech_data_pipeline_spark.operators.similarity import pca_power_topk
from speech_data_pipeline_spark.operators.text import (
    hash_embed_sparse,
    hash_embed_vector,
)


@pytest.fixture(scope="module")
def spark():
    from speech_data_pipeline_spark.session import get_spark

    return get_spark("test-mining")


def test_duplicated_spans_planted(spark):
    # doc 1 and doc 2 share an exact 6-word run; doc 3 is clean.
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, f"one two {shared} three four"),
        (2, f"{shared} five six seven eight nine ten"),
        (3, "unique words only here nothing repeats ever really"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in duplicated_span_stats(df, n=5, min_count=2).collect()
    }
    # a shared 6-word run holds two duplicated 5-gram starts that fuse
    # into ONE span of 6 covered tokens
    assert out[1]["n_dup_grams"] == 2
    assert out[1]["n_dup_spans"] == 1
    assert out[1]["dup_tok_frac"] == pytest.approx(6 / 10, abs=1e-6)
    assert out[2]["n_dup_grams"] == 2
    assert out[2]["n_dup_spans"] == 1
    assert out[3]["n_dup_grams"] == 0
    assert out[3]["n_dup_spans"] == 0
    assert out[3]["dup_tok_frac"] == 0.0


def test_duplicated_spans_in_doc_repeat(spark):
    # the SAME doc repeating a 5-gram twice counts as duplication too
    run = "red orange yellow green blue"
    df = spark.createDataFrame(
        [(1, f"{run} filler filler2 filler3 filler4 fillerfive {run}")],
        "doc_id long, text string",
    )
    row = duplicated_span_stats(df, n=5, min_count=2).collect()[0]
    assert row["n_dup_grams"] == 2
    assert row["n_dup_spans"] == 2  # far apart -> two separate spans


def test_duplicated_spans_short_doc_empty(spark):
    df = spark.createDataFrame(
        [(1, "too short"), (2, "")], "doc_id long, text string"
    )
    rows = duplicated_span_stats(df, n=5, min_count=2).collect()
    assert {r["n_dup_grams"] for r in rows} == {0}


def test_span_clean_excises_planted_span(spark):
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, f"one two {shared} three four"),
        (2, f"{shared} five six seven eight nine ten"),
        (3, "unique words only here nothing repeats ever really"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from speech_data_pipeline_spark.operators.dedup import duplicated_span_clean

    out = {
        r["doc_id"]: r for r in duplicated_span_clean(df, n=5, min_count=2).collect()
    }
    # the shared 6-word run is cut from BOTH docs; surrounding text stays
    assert out[1]["clean_text"] == "one two three four"
    assert out[1]["n_removed"] == 6
    assert out[2]["clean_text"] == "five six seven eight nine ten"
    assert out[3]["clean_text"] == rows[2][1]
    assert out[3]["n_removed"] == 0


def test_span_clean_invariants_and_rerun_dry(spark):
    """Cleaned length == n_toks - n_removed for every doc, and
    re-running the span detector on the cleaned corpus finds (almost)
    nothing — the dedup actually dedups (VERDICT r3 #4)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from speech_data_pipeline_spark.operators.dedup import duplicated_span_clean

    c = duplicated_span_clean(docs, n=5, min_count=2).cache()
    try:
        bad = (
            c.select(
                "n_toks",
                "n_removed",
                F.size(
                    F.expr("filter(split(clean_text, ' '), x -> x != '')")
                ).alias("k"),
            )
            .where(F.col("k") != F.col("n_toks") - F.col("n_removed"))
            .count()
        )
        assert bad == 0
        before = (
            duplicated_span_stats(docs, n=5, min_count=2)
            .agg(F.sum("n_dup_grams"))
            .first()[0]
        )
        after = (
            duplicated_span_stats(
                c.select("doc_id", F.col("clean_text").alias("text")),
                n=5,
                min_count=2,
            )
            .agg(F.sum("n_dup_grams"))
            .first()[0]
        )
        # excision can juxtapose formerly-distant tokens into new grams,
        # so "~zero", not exactly zero (measured 2530 -> 0 at sf0.001)
        assert before > 1000
        assert after <= before * 0.05
    finally:
        c.unpersist()


def test_hash_embed_driver_mirror_matches_spark(spark):
    text = "spark shuffles hash joins and sorts rows"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {
        (r["bucket"], r["dv"])
        for r in hash_embed_sparse(df, dim=64).collect()
    }
    want = {(b, v) for b, v in hash_embed_vector(text, 64).items()}
    assert got == want


def test_hash_embed_self_similarity_is_top(spark):
    # a doc equal to the query string must score cos == 1
    docs = [
        (1, "fast hash join over sorted columns"),
        (2, "completely different words about cats and dogs"),
        (3, "fast hash join over unsorted heaps"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sp = hash_embed_sparse(df, dim=64)
    qv = hash_embed_vector("fast hash join over sorted columns", 64)
    qn = math.sqrt(sum(v * v for v in qv.values()))
    qdf = spark.createDataFrame(sorted(qv.items()), "bucket long, qv long")
    agg = (
        sp.join(F.broadcast(qdf), "bucket", "left")
        .groupBy("id")
        .agg(
            F.sum(F.col("dv") * F.coalesce("qv", F.lit(0))).alias("num"),
            F.sum(F.col("dv") * F.col("dv")).alias("nrm2"),
        )
        .select(
            "id",
            (F.col("num") / (F.sqrt("nrm2") * F.lit(qn))).alias("cos"),
        )
    )
    scores = {r["id"]: r["cos"] for r in agg.collect()}
    assert scores[1] == pytest.approx(1.0, abs=1e-12)
    assert scores[1] > scores[3] > scores[2]


def test_hash_embed_rejects_non_power_of_two(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        hash_embed_sparse(df, dim=48)


def test_pca_power_matches_numpy(spark):
    # planted dominant direction: x = s*w + noise, PC1 ≈ w
    rng = np.random.default_rng(7)
    d, n = 8, 400
    w = rng.standard_normal(d)
    w /= np.linalg.norm(w)
    s = rng.standard_normal(n)[:, None] * 3.0
    X = s * w[None, :] + rng.standard_normal((n, d)) * 0.1
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = pca_power_topk(df, dim=d, iters=6, k=n).collect()

    Xc = X.astype(np.float32).astype(np.float64)
    Xc = Xc - Xc.mean(axis=0)
    _, _, vt = np.linalg.svd(Xc, full_matrices=False)
    pc = vt[0]
    proj = Xc @ pc
    # align sign with the engine's all-positive init
    got_map = {r["vec_id"]: r["pc1"] for r in got}
    some = max(got_map, key=lambda i: abs(got_map[i]))
    if np.sign(proj[some]) != np.sign(got_map[some]):
        proj = -proj
    errs = [abs(got_map[i] - proj[i]) for i in range(n)]
    # quantized grids + finite iterations: loose-but-meaningful bound
    assert max(errs) < 5e-2
    # and the top-magnitude ordering agrees at the head
    top_np = sorted(range(n), key=lambda i: -proj[i])[:5]
    top_sp = [r["vec_id"] for r in sorted(got, key=lambda r: -r["pc1"])[:5]]
    assert set(top_np) == set(top_sp)


def test_mix_temperature_flattens(spark, tmp_path):
    # big source vs small source: temperature alpha=0.5 must raise the
    # small source's share and lower the big one's, preserving order
    from speech_data_pipeline_spark.queries.mining_q import (
        mix_temperature_domains,
    )

    rows = [(i, "word " * (50 if i % 10 else 5), "big" if i % 10 else "small")
            for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["source"]: r for r in
           mix_temperature_domains(spark, str(tmp_path)).collect()}
    big, small = out["big"], out["small"]
    assert big["share_natural"] > big["share_temp"]
    assert small["share_natural"] < small["share_temp"]
    # shares stay ordered and allocations stay within budget
    assert big["share_temp"] > small["share_temp"]
    assert big["target_docs"] + small["target_docs"] <= 10_000
    # tempering UP-samples the small domain relative to its natural
    # share (per-doc epochs depend on doc lengths, so compare shares)
    assert small["share_temp"] / small["share_natural"] > 1.5
    assert big["share_temp"] / big["share_natural"] < 1.0
    assert big["epochs"] > 0 and small["epochs"] > 0


def test_gapfill_linear_exact(spark, tmp_path):
    # two observations 4 days apart: interior daily grid points must be
    # the exact lerp; grid points outside [min, max] must not exist
    from speech_data_pipeline_spark.queries.mining_q import (
        _GF_STEP,
        ts_gapfill_interpolate,
    )
    import datetime as dt

    day = 86_400_000_000
    base = dt.datetime(2024, 1, 10, 12, 0, 0)  # off-grid (noon)
    rows = [
        (1, base, 7, "view", 10.0, "{}"),
        (2, base + dt.timedelta(days=4), 7, "view", 30.0, "{}"),
        (3, base + dt.timedelta(days=2), 7, "click", 99.0, "{}"),  # ignored
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = ts_gapfill_interpolate(spark, str(tmp_path)).collect()
    assert _GF_STEP == day
    got = {r["grid_us"]: r["value_interp"] for r in out}
    t0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    # grid days: 11..14 Jan midnight; lerp slope = 20 units / 4 days
    expect = {}
    import math

    for g in range(4):
        gt = (t0 // day + 1 + g) * day
        expect[gt] = math.floor(
            (10.0 + 20.0 * ((gt - t0) / (4 * day))) * 1e6
        ) / 1e6
    assert got == expect


def test_mining_ops_on_degenerate_input(spark):
    # empty corpora must yield empty (not crash) across the new ops
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert duplicated_span_stats(empty_docs, n=5).count() == 0
    assert hash_embed_sparse(empty_docs).count() == 0
    one_vec = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    # single-row PCA: centered data is all-zero, projections are 0
    rows = pca_power_topk(one_vec, dim=2, iters=2, k=5).collect()
    assert [(r["vec_id"], r["pc1"]) for r in rows] == [(1, 0.0)]


def test_pca_cache_handle_allows_unpersist(spark):
    """pca_power_topk exposes its one retained cache through
    cache_handle so long-lived sessions can release it (VERDICT r3
    nit #3)."""
    df = spark.createDataFrame(
        [(i, [float(i), float(i % 3), 1.0, 0.5]) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    handle: list = []
    out = pca_power_topk(
        df, dim=4, iters=2, k=5, cache_handle=handle
    ).collect()
    assert len(out) == 5
    assert len(handle) == 1
    assert handle[0].is_cached
    handle[0].unpersist(blocking=True)
    assert not handle[0].is_cached


def test_phrase_search_matches_bruteforce(spark):
    """Python replay: top bigram by (count desc, bigram asc), then
    adjacent-pair occurrence counts, top-20 by (n desc, doc_id)."""
    import re

    SF = "/root/testdata/sf0.001"
    from collections import Counter

    from speech_data_pipeline_spark.queries.mining_q import (
        search_phrase_positions,
    )
    from speech_data_pipeline_spark.sources.catalog import load_table

    docs = {
        r["doc_id"]: re.findall(r"[a-z]+", r["text"].lower())
        for r in load_table(spark, SF, "documents")
        .select("doc_id", "text")
        .collect()
    }
    cnt = Counter()
    for w in docs.values():
        cnt.update(f"{a} {b}" for a, b in zip(w, w[1:]))
    top = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    occ = {
        d: sum(1 for a, b in zip(w, w[1:]) if f"{a} {b}" == top)
        for d, w in docs.items()
    }
    exp = sorted(
        ((d, top, n) for d, n in occ.items() if n > 0),
        key=lambda x: (-x[2], x[0]),
    )[:20]
    got = [
        (r["doc_id"], r["phrase"], r["n_occ"])
        for r in search_phrase_positions(spark, SF).collect()
    ]
    assert got == exp


class TestFuzzySymdelete:
    def test_crafted_pairs_and_kinds(self, spark):
        import os, tempfile
        import pandas as pd

        from speech_data_pipeline_spark.queries.registry import QUERIES

        # hello~helo (deletion), hello~hellp (substitution at 5),
        # world distinct from all; every word repeated to clear the
        # min-freq floor.
        text = " ".join(["hello"] * 3 + ["helo"] * 2 + ["hellp"] * 2
                        + ["world"] * 2)
        df = pd.DataFrame(
            {"doc_id": [1], "text": [text], "lang": ["en"],
             "source": ["t"], "n_chars": [len(text)]}
        )
        with tempfile.TemporaryDirectory() as d:
            df.to_parquet(os.path.join(d, "documents.parquet"))
            rows = QUERIES["search_fuzzy_symdelete"](spark, d).collect()
        got = {(r["w1"], r["w2"]): r["kind"] for r in rows}
        assert got[("hello", "helo")] == "ins"
        assert got[("hello", "hellp")] == "sub"
        assert not any("world" in p for p in got)

    def test_all_pairs_are_distance_one(self, spark):
        from speech_data_pipeline_spark.queries.registry import QUERIES

        def lev(a, b):
            prev = list(range(len(b) + 1))
            for i, ca in enumerate(a, 1):
                cur = [i]
                for j, cb in enumerate(b, 1):
                    cur.append(min(prev[j] + 1, cur[-1] + 1,
                                   prev[j - 1] + (ca != cb)))
                prev = cur
            return prev[-1]

        rows = QUERIES["search_fuzzy_symdelete"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        for r in rows:
            assert lev(r["w1"], r["w2"]) == 1, (r["w1"], r["w2"])
