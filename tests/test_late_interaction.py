"""Late-interaction (MaxSim) retrieval — NumPy brute-force replay vs
operators/similarity.py late_interaction_topk.
"""

import math

import numpy as np

from speech_data_pipeline_spark.operators.similarity import (
    late_interaction_topk,
)


def _brute(vecs, q, n_sub=8):
    sub = len(q) // n_sub
    out = {}
    for vid, v in vecs:
        score = 0.0
        for i in range(n_sub):
            qi = q[i * sub : (i + 1) * sub]
            nq = math.sqrt(sum(x * x for x in qi))
            best = None
            for j in range(n_sub):
                dj = v[j * sub : (j + 1) * sub]
                nd2 = sum(x * x for x in dj)
                c = (
                    0.0
                    if nd2 == 0
                    else sum(a * b for a, b in zip(dj, qi))
                    / (nq * math.sqrt(nd2))
                )
                best = c if best is None else max(best, c)
            score += best
        out[vid] = math.floor(score * 1_000_000) / 1_000_000
    return out


def test_li_topk_matches_bruteforce(spark):
    rng = np.random.default_rng(7)
    vecs = [
        (int(i), [float(np.float32(x)) for x in rng.normal(size=64)])
        for i in range(40)
    ]
    # one vector with an all-zero sub-vector exercises the guard
    z = list(vecs[5][1])
    z[8:16] = [0.0] * 8
    vecs[5] = (5, z)
    q = vecs[0][1]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = [
        (r.vec_id, r.li_score)
        for r in late_interaction_topk(df, q, n_sub=8, k=10).collect()
    ]
    want_map = _brute(vecs, q)
    want = sorted(
        want_map.items(), key=lambda kv: (-kv[1], kv[0])
    )[:10]
    assert [v for v, _ in got] == [v for v, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert abs(a - b) < 2e-6  # float32 storage + trunc6 boundary
    # the query itself must rank first with score ~= n_sub
    assert got[0][0] == 0 and abs(got[0][1] - 8.0) < 1e-6


def test_li_beats_single_vector_on_partial_match(spark):
    # doc A matches the query in ONE sub-vector exactly but is noise
    # elsewhere; doc B is a weak uniform match. MaxSim must rank A's
    # matched token high: its per-token max is 1.0 for that slot.
    rng = np.random.default_rng(11)
    q = [float(np.float32(x)) for x in rng.normal(size=64)]
    a = [float(np.float32(x)) for x in rng.normal(size=64)]
    a[0:8] = q[0:8]  # exact token match
    b = [x * 0.1 for x in q]  # same direction, uniformly scaled
    df = spark.createDataFrame(
        [(1, a), (2, b)], "vec_id long, embedding array<float>"
    )
    rows = {
        r.vec_id: r.li_score
        for r in late_interaction_topk(df, q, n_sub=8, k=2).collect()
    }
    # B is a perfect cosine match on every token (scale-invariant),
    # A only on one — B wins overall, but A's score must include the
    # full 1.0 contribution of its matched token (> 1 - eps + 7*(-1))
    assert rows[2] > rows[1]
    assert rows[1] > -7.0 + 0.999
