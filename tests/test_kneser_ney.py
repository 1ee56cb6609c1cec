"""Kneser-Ney bigram LM — independent pure-Python replay of the
train/held-out split, the interpolated-KN probability (D = 3/4,
continuation back-off, epsilon floor), and the integer 2^-20-nat cost
grid vs the registered query (queries/corpus_q.py lm_kneser_ney_xent).
"""

import hashlib
import math
import re
from collections import Counter

from speech_data_pipeline_spark.queries.corpus_q import _KN_Q


def _half(doc_id: int) -> int:
    h = hashlib.md5(f"kn:{doc_id}".encode()).hexdigest()[:7]
    return int(h, 16) % 2


def _replay(docs):
    """docs: list of (doc_id, source, text) → {source: (n, total, xent)}"""
    kb = []
    for doc_id, source, text in docs:
        ws = re.findall(r"[a-z]+", text.lower())
        for a, b in zip(ws, ws[1:]):
            kb.append((doc_id, source, _half(doc_id), a, b))
    cab = Counter((a, b) for _, _, h, a, b in kb if h == 0)
    ca = Counter()
    n1l = Counter()
    n1r = Counter()
    for (a, b), c in cab.items():
        ca[a] += c
        n1l[a] += 1
        n1r[b] += 1
    nb = len(cab)
    out = {}
    agg = {}
    for _, source, h, a, b in kb:
        if h != 1:
            continue
        if ca[a] > 0:
            p = (
                max(4 * cab[(a, b)] - 3, 0) / (4 * ca[a])
                + (3 * n1l[a]) / (4 * ca[a]) * (n1r[b] / nb)
            )
        else:
            p = n1r[b] / nb
        p = max(p, 1.0 / (4 * nb))
        cost = -math.floor(math.log(p) * _KN_Q)
        s, n = agg.get(source, (0, 0))
        agg[source] = (s + cost, n + 1)
    for source, (s, n) in agg.items():
        out[source] = (
            n,
            s,
            math.floor(s / n / _KN_Q * 1_000_000) / 1_000_000,
        )
    return out


DOCS = [
    (1, "web", "the cat sat on the mat and the cat ran"),
    (2, "web", "the dog sat on the rug and the dog barked"),
    (3, "books", "a cat and a dog met on the mat"),
    (4, "books", "the mat was new and the rug was old"),
    (5, "web", "cats and dogs and mats and rugs"),
    (6, "books", "the quick brown fox jumps over the lazy dog"),
    (7, "web", "completely unseen tokens zyx wvu tsr"),
    (8, "books", "the cat sat on the dog and ran"),
]


def test_kn_xent_matches_replay(spark, tmp_path):
    from speech_data_pipeline_spark.queries.corpus_q import lm_kneser_ney_xent

    # the registered query reads {sf_dir}/documents.parquet — point it
    # at a temp dir holding the controlled corpus
    d = spark.createDataFrame(DOCS, "doc_id long, source string, text string")
    d.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "_tmp"))
    import os
    import shutil

    part = next(
        f for f in os.listdir(tmp_path / "_tmp") if f.endswith(".parquet")
    )
    shutil.move(
        str(tmp_path / "_tmp" / part), str(tmp_path / "documents.parquet")
    )
    got = {
        r.source: (r.n_bigrams, r.total_cost, r.xent_nats)
        for r in lm_kneser_ney_xent(spark, str(tmp_path)).collect()
    }
    want = _replay(DOCS)
    assert got == want
    assert all(n > 0 for n, _, _ in got.values())


def test_kn_probabilities_sum_close_to_one(spark):
    """For a seen context a, sum_b P_KN(b|a) over the TRAIN vocab must
    be ~1 (interpolated KN is a proper distribution up to the epsilon
    floor) — checked in pure Python on the replayed counts."""
    kb = []
    for doc_id, source, text in DOCS:
        ws = re.findall(r"[a-z]+", text.lower())
        for a, b in zip(ws, ws[1:]):
            if _half(doc_id) == 0:
                kb.append((a, b))
    cab = Counter(kb)
    ca = Counter()
    n1l = Counter()
    n1r = Counter()
    for (a, b), c in cab.items():
        ca[a] += c
        n1l[a] += 1
        n1r[b] += 1
    nb = len(cab)
    vocab_b = sorted(n1r)
    # continuation mass itself sums to 1 over train vocab
    assert abs(sum(n1r[b] / nb for b in vocab_b) - 1.0) < 1e-9
    for a in list(ca)[:10]:
        tot = sum(
            max(4 * cab[(a, b)] - 3, 0) / (4 * ca[a])
            + (3 * n1l[a]) / (4 * ca[a]) * (n1r[b] / nb)
            for b in vocab_b
        )
        # discount mass is exactly redistributed: sums to 1 when every
        # seen continuation count >= 1 (4c-3 >= 1 -> max() inactive)
        assert abs(tot - 1.0) < 1e-9
