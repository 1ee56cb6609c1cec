"""Round-3 corpus-governance operators: Bloom membership, n-gram
decontamination, PII redaction, deterministic shuffle sharding,
quantile filtering, context-window chunking.

Each test pins the operator contract on a crafted fixture; the
cross-engine value checks live in the query registry
(queries/corpus_q.py) and run through the driver gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import rows


# ---------------------------------------------------------------- bloom


def test_bloom_no_false_negatives(spark):
    """Every built key must probe as a member — the Bloom contract."""
    from speech_data_pipeline_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    keys = spark.range(0, 500).withColumnRenamed("id", "k")
    bits = bloom_build(keys, "k", m=1024, k=3)
    probed = bloom_probe(keys, bits, "k", m=1024, k=3)
    assert probed.where(~F.col("bloom_member")).count() == 0


def test_bloom_false_positive_rate_bounded(spark):
    """Non-members probe mostly negative; FP rate near the analytic
    (1-e^{-kn/m})^k ≈ 0.092 for n=500, m=4096, k=3 — assert < 0.2."""
    from speech_data_pipeline_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    build = spark.range(0, 500).withColumnRenamed("id", "k")
    probe = spark.range(10_000, 12_000).withColumnRenamed("id", "k")
    bits = bloom_build(build, "k", m=4096, k=3)
    probed = bloom_probe(probe, bits, "k", m=4096, k=3)
    fp = probed.where(F.col("bloom_member")).count()
    assert fp / 2000 < 0.2


def test_bloom_deterministic_across_layouts(spark):
    """The same key set in any partition layout builds the identical
    filter (positions are content hashes, the set is deduped)."""
    from speech_data_pipeline_spark.operators.sketches import bloom_build

    a = spark.range(0, 300).withColumnRenamed("id", "k")
    b = a.repartition(7)
    bits_a = a.transform(lambda d: bloom_build(d, "k")).collect()[0]["bits"]
    bits_b = b.transform(lambda d: bloom_build(d, "k")).collect()[0]["bits"]
    assert bits_a == bits_b


# ------------------------------------------------------- decontamination


def _docs(spark, rows_):
    return spark.createDataFrame(rows_, "doc_id long, text string")


def test_decontamination_finds_planted_overlap(spark):
    from speech_data_pipeline_spark.operators.text import ngram_contamination

    bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    corpus = _docs(
        spark,
        [
            (1, "totally unrelated clean text about spark plans"),
            (2, "he said the quick brown fox appeared at dawn"),  # 4-gram hit
            (3, "short"),  # fewer than n tokens -> 0 grams
        ],
    )
    out = {r["doc_id"]: r for r in ngram_contamination(corpus, bench, n=4).collect()}
    assert not out[1]["contaminated"]
    assert out[2]["contaminated"] and out[2]["n_hits"] >= 1
    assert out[3]["n_grams"] == 0 and not out[3]["contaminated"]


def test_decontamination_hit_count_is_distinct_grams(spark):
    """A repeated shared gram counts once (distinct-per-doc streams)."""
    from speech_data_pipeline_spark.operators.text import ngram_contamination

    bench = _docs(spark, [(9, "a b c d")])
    corpus = _docs(spark, [(1, "a b c d x a b c d")])
    (r,) = ngram_contamination(corpus, bench, n=4).collect()
    assert r["n_hits"] == 1


# ------------------------------------------------------------ PII redact


def test_redact_pii_scrubs_and_counts(spark):
    from speech_data_pipeline_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "from 192.168.0.1 to 10.0.0.255 end"),
            (3, "call 555-123-4567 or 555-987-6543"),
            (4, "clean text, no identifiers here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[1]["n_email"] == 1 and "<EMAIL>" in out[1]["redacted"]
    assert "@" not in out[1]["redacted"].replace("<EMAIL>", "")
    assert out[2]["n_ip"] == 2 and out[2]["redacted"].count("<IP>") == 2
    assert out[3]["n_phone"] == 2 and out[3]["redacted"].count("<PHONE>") == 2
    assert out[4]["redacted"] == "clean text, no identifiers here"


def test_redact_pii_idempotent(spark):
    """Redacting already-redacted text changes nothing."""
    from speech_data_pipeline_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [(1, "x user@example.com 10.0.0.1 555-123-4567 y")],
        "doc_id long, text string",
    )
    once = redact_pii(df).select("doc_id", F.col("redacted").alias("text"))
    twice = redact_pii(once).collect()[0]
    assert twice["redacted"] == twice["text"]
    assert twice["n_email"] == twice["n_ip"] == twice["n_phone"] == 0


# ------------------------------------------------- shuffle shard manifest


def test_shuffle_shard_is_partition_invariant_permutation(spark):
    """The sharded-shuffle query assigns every doc exactly once and its
    manifest is identical under input repartitioning (the determinism
    random() shuffles lack)."""
    from speech_data_pipeline_spark.queries.corpus_q import (
        shuffle_shard_manifest,
    )

    sf = "/root/testdata/sf0.001"
    base = shuffle_shard_manifest(spark, sf)
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    got = rows(base)
    assert sum(r[1] for r in got) == n_docs
    # perturb the session's shuffle width; manifest must not move
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        assert rows(shuffle_shard_manifest(spark, sf)) == got
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


# ------------------------------------------------------- quantile filter


def test_quantile_filter_bounds_and_counts(spark):
    from speech_data_pipeline_spark.queries.corpus_q import (
        quality_quantile_filter,
    )

    sf = "/root/testdata/sf0.001"
    out = quality_quantile_filter(spark, sf).collect()
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    for r in out:
        assert 0 < r["n_kept"] <= r["n_total"]
        # kept fraction of an 80% band is ~0.8 (exact percentiles)
        assert 0.6 <= r["n_kept"] / r["n_total"] <= 1.0
        lo, hi = r["p10"], r["p90"]
        n_in = docs.where(
            (F.col("source") == r["source"])
            & (F.col("n_chars") >= lo)
            & (F.col("n_chars") <= hi + 1e-6)
        ).count()
        assert n_in == r["n_kept"]


# -------------------------------------------------- context-window chunks


def test_chunk_windows_cover_and_overlap(spark):
    """Windows tile the token stream: every token is in ≥1 chunk,
    interior chunks are exactly W tokens, consecutive chunks overlap by
    W-S tokens."""
    from speech_data_pipeline_spark.queries.corpus_q import _CW_S, _CW_W

    text = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    df.createOrReplaceTempView("tmp_docs")
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit("([a-z0-9]+)"), 1)
    # reuse the query's slicing algebra directly on the fixture
    from speech_data_pipeline_spark.queries import corpus_q

    spec = df.select("doc_id", toks.alias("t")).withColumn(
        "k_max",
        F.when(
            F.size("t") > _CW_W,
            F.floor(
                (F.size("t") - F.lit(_CW_W) + F.lit(_CW_S - 1)) / F.lit(_CW_S)
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    chunks = (
        spec.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("k_max"))).alias("k"),
            "t",
        )
        .select(
            F.col("k"),
            F.slice(F.col("t"), (F.col("k") * _CW_S + 1).cast("int"), _CW_W).alias(
                "c"
            ),
        )
        .collect()
    )
    seen = set()
    by_k = {}
    for r in chunks:
        by_k[r["k"]] = r["c"]
        seen.update(r["c"])
    assert seen == {f"w{i}" for i in range(100)}  # full coverage
    ks = sorted(by_k)
    for k in ks[:-1]:
        assert len(by_k[k]) == _CW_W  # interior chunks full
        assert by_k[k][-(_CW_W - _CW_S):] == by_k[k + 1][: _CW_W - _CW_S]


def test_chunk_windows_short_doc_single_chunk(spark):
    from speech_data_pipeline_spark.queries.corpus_q import chunk_context_windows

    # whole-table query on the fixture dir; short docs must emit exactly
    # one chunk with all their tokens
    sf = "/root/testdata/sf0.001"
    out = chunk_context_windows(spark, sf)
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("([a-z]+)"), 1)
        ).alias("n"),
    )
    joined = (
        out.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_chunks"), F.max("n_tok").alias("max_tok"))
        .join(docs, "doc_id")
    )
    short = joined.where(F.col("n") <= 32)
    bad = short.where(
        (F.col("n_chunks") != 1) | (F.col("max_tok") != F.col("n"))
    ).count()
    assert bad == 0


# ---------------------------------------------------------- isotonic PAVA


def _minimax_fit(hits, ns):
    """Brute-force minimax reference: fit(i)=max_{j<=i} min_{k>=i} avg."""
    b = len(hits)
    H = [0] * (b + 1)
    N = [0] * (b + 1)
    for i in range(b):
        H[i + 1] = H[i] + hits[i]
        N[i + 1] = N[i] + ns[i]
    out = []
    for i in range(b):
        best = None
        for j in range(i + 1):
            worst = None
            for k in range(i, b):
                v = (H[k + 1] - H[j]) / (N[k + 1] - N[j])
                worst = v if worst is None else min(worst, v)
            best = worst if best is None else max(best, worst)
        out.append(best)
    return out


def test_pava_matches_minimax_and_is_monotone():
    import random

    from speech_data_pipeline_spark.operators.calibration import pava_fit

    random.seed(7)
    for _ in range(50):
        b = random.randint(1, 12)
        ns = [random.randint(1, 30) for _ in range(b)]
        hits = [random.randint(0, n) for n in ns]
        pools = pava_fit(hits, ns)
        fitted = [h / n for h, n in pools]
        assert all(a <= b2 + 1e-15 for a, b2 in zip(fitted, fitted[1:]))
        assert fitted == _minimax_fit(hits, ns)  # exact double equality
        # mean preservation: total fitted mass equals total hits
        assert sum(h * (nn / n) for (h, n), nn in zip(pools, ns)) == pytest.approx(
            sum(hits)
        )


def test_pava_known_cases():
    from speech_data_pipeline_spark.operators.calibration import pava_fit

    # already monotone: untouched
    assert pava_fit([1, 2, 3], [10, 10, 10]) == [(1, 10), (2, 10), (3, 10)]
    # single violation merges into one pool
    assert pava_fit([3, 1], [10, 10]) == [(4, 20), (4, 20)]
    # cascade: strictly decreasing collapses to the global mean
    assert pava_fit([5, 3, 1], [10, 10, 10]) == [(9, 30)] * 3


def test_isotonic_calibrate_groups_independent(spark):
    from speech_data_pipeline_spark.operators.calibration import (
        isotonic_calibrate,
    )

    df = spark.createDataFrame(
        [("a", 0, 10, 8), ("a", 1, 10, 2), ("b", 0, 5, 1), ("b", 1, 5, 4)],
        "source string, bucket long, n long, hits long",
    )
    out = {(r.source, r.bucket): r.fitted for r in isotonic_calibrate(df).collect()}
    assert out[("a", 0)] == out[("a", 1)] == pytest.approx(0.5)  # merged
    assert out[("b", 0)] == pytest.approx(0.2)  # monotone, untouched
    assert out[("b", 1)] == pytest.approx(0.8)


# ------------------------------------------------------ weighted sampling


def test_pps_sample_exact_k_per_stratum(spark):
    """Systematic PPS: Σ multiplicity is exactly k in every stratum,
    and the draw is invariant to shuffle-width perturbation."""
    from speech_data_pipeline_spark.queries.corpus_q import (
        _PPS_K,
        sample_weighted_pps,
    )

    sf = "/root/testdata/sf0.001"
    out = sample_weighted_pps(spark, sf)
    per = {
        r["source"]: r["s"]
        for r in out.groupBy("source").agg(F.sum("mult").alias("s")).collect()
    }
    n_sources = (
        spark.read.parquet(f"{sf}/documents.parquet").select("source").distinct()
    ).count()
    assert len(per) == n_sources
    assert all(v == _PPS_K for v in per.values())
    got = rows(out)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        assert rows(sample_weighted_pps(spark, sf)) == got
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_pps_sample_weight_bias():
    """A document with half the total weight must be drawn ≥ floor(k/2)
    times (systematic sampling guarantee: mult ∈ {floor(k·w/W),
    ceil(k·w/W)})."""
    from speech_data_pipeline_spark.operators.calibration import pava_fit  # noqa: F401
    # pure-python check of the multiplicity arithmetic
    k = 5

    def mult(hi, lo, tot):
        def c(x):
            return (2 * k * x - tot) // (2 * tot) + 1 if 2 * k * x >= tot else 0

        return c(hi) - c(lo)

    # weights: one heavy doc (50) among ten light (5 each): tot=100
    ws = [50] + [5] * 10
    tot = sum(ws)
    cum = 0
    ms = []
    for w in ws:
        cum += w
        ms.append(mult(cum, cum - w, tot))
    assert sum(ms) == k
    assert ms[0] in (2, 3)  # k*w/W = 2.5 -> floor/ceil
    assert all(m <= 1 for m in ms[1:])


# ------------------------------------------------------------- BPE merges


def test_bpe_merges_classic_example(spark):
    """The textbook BPE corpus: 'low' x5, 'lowest' x2 -> first merges
    build 'lo', then 'low' (frequency-greedy, deterministic ties)."""
    from speech_data_pipeline_spark.operators.text import bpe_train_merges

    text = " ".join(["low"] * 5 + ["lowest"] * 2)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = [
        (r["round"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train_merges(df, n_merges=2).orderBy("round").collect()
    ]
    # round 1: pairs l-o (7), o-w (7), w-e (2), e-s (2), s-t (2);
    # tie l-o vs o-w broken by (left, right) asc -> ('l','o')
    assert got[0] == (1, "l", "o", 7)
    # round 2: 'lo'-w now 7, wins
    assert got[1] == (2, "lo", "w", 7)


def test_bpe_merge_handles_adjacent_disjoint_pairs(spark):
    """'abab' must become 'ab ab' after merging (a,b) once — the
    double-boundary encoding merges symbol-disjoint adjacent
    occurrences in one round (single-boundary string replace would
    leave 'ab a b')."""
    from speech_data_pipeline_spark.operators.text import bpe_train_merges

    df = spark.createDataFrame(
        [(1, "abab abab abab")], "doc_id long, text string"
    )
    got = [
        (r["round"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train_merges(df, n_merges=2).orderBy("round").collect()
    ]
    # round 1: a-b count 6 (2 per word), b-a count 3
    assert got[0] == (1, "a", "b", 6)
    # round 2: if both (a,b) merged per word, the pair stream is
    # ab-ab (3); un-merged leftovers would surface (ab,a)/(a,b) instead
    assert got[1] == (2, "ab", "ab", 3)


def test_bpe_overlapping_same_symbol_pairs(spark):
    """'aaa' with pair (a,a): greedy leftmost non-overlapping -> one
    merge per word ('aa a'), count 1 per word not 2."""
    from speech_data_pipeline_spark.operators.text import bpe_train_merges

    df = spark.createDataFrame([(1, "aaa aaa")], "doc_id long, text string")
    got = [
        (r["round"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train_merges(df, n_merges=2).orderBy("round").collect()
    ]
    assert got[0] == (1, "a", "a", 4)  # 2 adjacent pairs x 2 words
    # after 'aaa' -> 'aa a': pairs are (aa, a) x2
    assert got[1] == (2, "aa", "a", 2)


def _bpe_reference(word_freqs, n_merges):
    """Pure-Python greedy BPE on a word-frequency dict — independent
    replay of the trained trajectory (count desc, left asc, right asc
    ties; greedy leftmost non-overlapping merge within a word)."""
    from collections import Counter

    vocab = {w: list(w) for w in word_freqs}
    merges = []
    for rnd in range(1, n_merges + 1):
        counts = Counter()
        for w, syms in vocab.items():
            f = word_freqs[w]
            i = 0
            while i < len(syms) - 1:
                counts[(syms[i], syms[i + 1])] += f
                i += 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), c = best
        merges.append((rnd, a, b, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_bpe_counts_match_reference_deep_trajectory(spark):
    """8-round trajectory on the real sf0.001 documents table ==
    an independent pure-Python greedy BPE on the same word counts —
    a merge depth where a single wrong count would diverge the
    greedy choice (also exercises the per-round localCheckpoint
    lineage truncation past the oracle's 5 rounds)."""
    import re as _re

    from speech_data_pipeline_spark.operators.text import bpe_train_merges
    from speech_data_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = [
        (r["round"], r["left"], r["right"], r["pair_count"])
        for r in bpe_train_merges(docs, n_merges=8).orderBy("round").collect()
    ]
    freqs = {}
    for (text,) in docs.select("text").collect():
        for w in _re.findall(r"[a-z]+", text.lower()):
            freqs[w] = freqs.get(w, 0) + 1
    assert got == _bpe_reference(freqs, 8)


def test_shard_permutation_stable_across_shard_counts(spark):
    """The training-shuffle contract behind shuffle_shard_manifest
    (VERDICT r3 #9): within-shard order is the GLOBAL (posk, doc_id)
    order restricted to the shard, at ANY shard count — so growing the
    shard count with the cluster re-shards without changing any
    co-sharded pair's relative order."""
    from speech_data_pipeline_spark.queries.corpus_q import shard_permutation
    from speech_data_pipeline_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    # global reference order, independent of sharding
    ref = [
        r["doc_id"]
        for r in docs.select(
            "doc_id",
            F.md5(F.concat(F.lit("pos:"), F.col("doc_id").cast("string"))).alias(
                "posk"
            ),
        )
        .orderBy("posk", "doc_id")
        .collect()
    ]
    rank = {d: i for i, d in enumerate(ref)}
    orders = {}
    for n_shards in (8, 32):
        rows = shard_permutation(docs, n_shards).collect()
        by_shard: dict = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append((r["pos"], r["doc_id"]))
        assert len(by_shard) == n_shards
        for shard, lst in by_shard.items():
            seq = [d for _, d in sorted(lst)]
            # per-shard order == global order restricted to the shard
            assert seq == sorted(seq, key=rank.__getitem__)
        orders[n_shards] = {
            r["doc_id"]: (r["shard"], r["pos"]) for r in rows
        }
    # co-sharded pairs keep relative order across the two counts
    o8, o32 = orders[8], orders[32]
    checked = 0
    for a in ref[:200]:
        for b in ref[:200]:
            if a >= b:
                continue
            if o8[a][0] == o8[b][0] and o32[a][0] == o32[b][0]:
                assert (o8[a][1] < o8[b][1]) == (o32[a][1] < o32[b][1])
                checked += 1
    assert checked > 100
