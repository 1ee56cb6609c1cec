"""WordPiece training — independent pure-Python replay vs the Spark
implementation (operators/text.py wordpiece_train): ##-continuation
symbol encoding, likelihood argmax count(ab)/(count(a)*count(b)) with
(score desc, count desc, a, b) tie-break, leftmost non-overlapping
merge with the right side's ## stripped.
"""

import re
from collections import Counter

from speech_data_pipeline_spark.operators.text import wordpiece_train
from tests.conftest import rows


def _replay(texts, n_merges):
    words = Counter()
    for t in texts:
        words.update(re.findall(r"[a-z]+", t.lower()))
    vocab = {}
    for w, f in words.items():
        syms = [w[0]] + ["##" + c for c in w[1:]]
        vocab[w] = (f, "  " + "  ".join(syms) + "  ")
    merges = []
    for rnd in range(1, n_merges + 1):
        symc = Counter()
        pairc = Counter()
        for w, (f, s) in vocab.items():
            syms = [x for x in s.split(" ") if x]
            for x in syms:
                symc[x] += f
            for a, b in zip(syms, syms[1:]):
                pairc[(a, b)] += f
        if not pairc:
            break
        # deterministic total order: score desc, count desc, a asc, b asc
        scored = sorted(
            (
                (-(c / (symc[a] * symc[b])), -c, a, b)
                for (a, b), c in pairc.items()
            )
        )
        _, _, a, b = scored[0]
        c = pairc[(a, b)]
        score = c / (symc[a] * symc[b])
        merges.append((rnd, a, b, c, score))
        pat = " " + a + "  " + b + " "
        rep = " " + a + b[2:] + " "
        vocab = {
            w: (f, s.replace(pat, rep)) for w, (f, s) in vocab.items()
        }
    seg = {
        w: (f, len([x for x in s.split(" ") if x]))
        for w, (f, s) in vocab.items()
    }
    return merges, seg


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "banana bandana band ban banana",
    "thing think thin thin thing",
    "running runner run runs running",
]


def test_wordpiece_merges_match_replay(spark):
    import math

    df = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    merges, vocab = wordpiece_train(df, n_merges=5)
    want, want_seg = _replay(TEXTS, n_merges=5)
    got = rows(merges)
    # replay's trunc6 must match the engine floor-based convention
    want = [
        (r, a, b, c, math.floor(s * 1_000_000) / 1_000_000)
        for (r, a, b, c, s) in want
    ]
    assert got == sorted(want)
    got_seg = rows(
        vocab.selectExpr(
            "word",
            "freq",
            "size(filter(split(w, ' '), x -> x != '')) AS n_sym",
        )
    )
    assert got_seg == sorted((w, f, n) for w, (f, n) in want_seg.items())


def test_wordpiece_first_merge_prefers_rare_pair(spark):
    # 'qz' appears always together (c=2, ca=cb=2 -> 0.5) while 'th'
    # is frequent but th's letters are everywhere; likelihood argmax
    # must pick the exclusive pair over the frequent one.
    df = spark.createDataFrame(
        [("qz qz the the the this that with",)], "text string"
    )
    merges, _ = wordpiece_train(df, n_merges=1)
    r = merges.collect()[0]
    assert (r.left, r.right) == ("q", "##z")


def test_wordpiece_continuation_marker_strips_on_merge(spark):
    df = spark.createDataFrame([("cat cat cat",)], "text string")
    merges, vocab = wordpiece_train(df, n_merges=2)
    got = {(r.round): (r.left, r.right) for r in merges.collect()}
    # two merges collapse the single word fully: (c,##a)->ca then
    # (ca,##t)->cat (or (##a,##t) first depending on scores); final
    # symbol string must be the whole word, no ## residue
    w = vocab.collect()[0].w
    assert w.strip() == "cat"
