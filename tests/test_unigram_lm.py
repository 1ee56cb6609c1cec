"""Unigram-LM (SentencePiece-style) tokenizer training — independent
pure-Python EM replay vs the Spark higher-order-function implementation
(operators/text.py unigram_lm_train).

The replay shares NO code with the operator: substring counting, seed
selection, integer log-cost grid, Viterbi forward DP, longest-piece
tie-break backtrack, and the usage-pruned M-step are all re-derived
from the documented protocol.
"""

import math
import re
from collections import Counter

import pytest

from speech_data_pipeline_spark.operators.text import (
    UNIGRAM_Q,
    unigram_lm_train,
)
from tests.conftest import rows


def _replay(texts, n_rounds=2, ml=4, seed_multi=150):
    """Reference EM: returns (trajectory dict round->piece->(cnt,cost),
    word_seg dict word->(freq, n_pieces, word_cost))."""
    words = Counter()
    for t in texts:
        words.update(re.findall(r"[a-z]+", t.lower()))

    def costs_of(cnts):
        total = float(sum(cnts.values()))
        return {
            p: -math.floor(math.log(c / total) * UNIGRAM_Q)
            for p, c in cnts.items()
        }

    seed = Counter()
    for w, f in words.items():
        for j in range(len(w)):
            for L in range(1, min(ml, len(w) - j) + 1):
                seed[w[j : j + L]] += f
    singles = {p: c for p, c in seed.items() if len(p) == 1}
    multis = sorted(
        ((p, c) for p, c in seed.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )[:seed_multi]
    cnts = dict(singles)
    cnts.update(dict(multis))

    def viterbi(w, cost):
        n = len(w)
        best = [0] * (n + 1)
        for i in range(1, n + 1):
            best[i] = min(
                best[j] + cost[w[j:i]]
                for j in range(max(0, i - ml), i)
                if w[j:i] in cost
            )
        pieces = []
        cur = n
        while cur > 0:
            j = min(
                j
                for j in range(max(0, cur - ml), cur)
                if w[j:cur] in cost
                and best[j] + cost[w[j:cur]] == best[cur]
            )
            pieces.append(w[j:cur])
            cur = j
        return pieces, best[n]

    traj = {0: {p: (c, costs_of(cnts)[p]) for p, c in cnts.items()}}
    for r in range(1, n_rounds + 1):
        cost = costs_of(cnts)
        usage = Counter()
        for w, f in words.items():
            pieces, _ = viterbi(w, cost)
            for p in pieces:
                usage[p] += f
        cnts = {p: usage.get(p, 0) + 1 for p in singles}
        cnts.update({p: u for p, u in usage.items() if len(p) > 1})
        cost = costs_of(cnts)
        traj[r] = {p: (c, cost[p]) for p, c in cnts.items()}
    cost = costs_of(cnts)
    seg = {}
    for w, f in words.items():
        pieces, wc = viterbi(w, cost)
        seg[w] = (f, len(pieces), wc)
    return traj, seg


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "banana bandana band ban banana",
    "abab abab ababab ba",
    "internationalization and nationalization nations",
    "the the the cat sat on the mat",
]


def test_unigram_trajectory_matches_replay(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    traj, _, seg = unigram_lm_train(
        df, n_rounds=2, max_piece_len=4, seed_multi=30
    )
    want_traj, want_seg = _replay(TEXTS, n_rounds=2, ml=4, seed_multi=30)
    got = rows(traj)
    want = sorted(
        (r, p, c, k)
        for r, m in want_traj.items()
        for p, (c, k) in m.items()
    )
    assert got == want
    got_seg = rows(seg)
    want_rows = sorted(
        (w, f, n, wc) for w, (f, n, wc) in want_seg.items()
    )
    assert got_seg == want_rows


def test_unigram_prunes_unused_multis(spark):
    # 'xy' never wins a segmentation when 'xyz' is cheaper and whole
    # words dominate: unused multi-char seeds must vanish by round 1.
    df = spark.createDataFrame(
        [("xyz xyz xyz xyz qq",)], "text string"
    )
    traj, _, _ = unigram_lm_train(
        df, n_rounds=1, max_piece_len=3, seed_multi=10
    )
    t = {(r.round, r.piece): r.cnt for r in traj.collect()}
    assert (0, "xy") in t  # seeded
    assert (1, "xyz") in t  # survives (used by every 'xyz')
    assert (1, "xy") not in t  # pruned: never used
    # singles always survive with the Laplace floor
    assert t[(1, "q")] >= 1 and t[(1, "z")] >= 1


def test_unigram_tiebreak_prefers_longest_piece(spark):
    # one word, all pieces equal count at seed: 'aaaa' segmentations
    # tie on cost; the min-j backtrack must pick the longest piece
    # first, exactly as the replay does.
    df = spark.createDataFrame([("aaaa",)], "text string")
    _, _, seg = unigram_lm_train(
        df, n_rounds=1, max_piece_len=3, seed_multi=5
    )
    _, want_seg = _replay(["aaaa"], n_rounds=1, ml=3, seed_multi=5)
    assert rows(seg) == sorted(
        (w, f, n, wc) for w, (f, n, wc) in want_seg.items()
    )


def test_unigram_encode_counts_are_consistent(spark):
    # n_pieces from the final segmentation must cover each word: sum
    # of piece lengths == word length (segmentation is a partition).
    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    _, vocab, seg = unigram_lm_train(
        df, n_rounds=2, max_piece_len=4, seed_multi=30
    )
    vmap = {r.piece: r.cost for r in vocab.collect()}
    for r in seg.collect():
        assert 1 <= r.n_pieces <= len(r.word)
        # cost is achievable: at most the all-singles cost
        assert r.word_cost <= sum(vmap[c] for c in r.word)
