"""Semantics tests for the dedup family on synthetic near-duplicates.

The oracle gate proves cross-engine agreement on the generated corpus;
these tests prove the operators actually *find duplicates* — goldens on
corpora with planted exact and near dups.
"""

from conftest import rows

from speech_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash64,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill in the late afternoon sun"
)
NEAR = BASE.replace("lazy", "sleepy")  # one-word edit
OTHER = (
    "completely different content about spark query engines and shuffle "
    "partitioning strategies for large scale analytics workloads"
)


def docs(spark):
    return spark.createDataFrame(
        [
            (1, BASE, "en"),
            (2, BASE, "en"),        # exact dup of 1
            (3, NEAR, "en"),        # near dup of 1
            (4, OTHER, "en"),
            (5, OTHER + "!", "en"),  # near dup of 4
        ],
        ["doc_id", "text", "lang"],
    )


def test_exact_dedup_groups(spark):
    out = {r[1]: r[2] for r in rows(exact_dedup(docs(spark)))}
    # canonical 1 has 2 copies; others singletons
    assert out[1] == 2
    assert out[3] == 1 and out[4] == 1 and out[5] == 1


def test_minhash_finds_exact_and_near(spark):
    pairs = rows(minhash_dedup_pairs(docs(spark), threshold=0.5), "id_a", "id_b")
    assert (1, 2) in pairs           # identical -> all bands collide, est 1.0
    assert (4, 5) in pairs           # one-char suffix edit
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_minhash_est_jaccard_identical_is_one(spark):
    out = rows(minhash_dedup_pairs(docs(spark), threshold=0.5))
    est = {(a, b): j for a, b, j in out}
    assert est[(1, 2)] == 1.0


def test_ngram_jaccard_scores(spark):
    out = rows(
        ngram_jaccard_pairs(docs(spark), block_col="lang", threshold=0.2, max_df=5)
    )
    scores = {(a, b): j for a, b, j in out}
    assert scores[(1, 2)] == 1.0
    assert scores[(4, 5)] > 0.8
    assert 0.2 < scores.get((1, 3), 0) < 1.0 or (1, 3) in scores
    assert (1, 4) not in scores


def test_simhash_identical_docs_equal_and_near_docs_close(spark):
    out = {r[0]: r[1] for r in rows(simhash64(docs(spark)))}
    assert out[1] == out[2]
    ham_near = bin(out[4] ^ out[5]).count("1")
    ham_far = bin(out[1] ^ out[4]).count("1")
    assert ham_near < ham_far


def test_minhash_collapsed_closure_equals_uncollapsed(spark):
    """Exact-collapse + MinHash-on-representatives yields the SAME
    duplicate components as MinHash over every document — the
    closure-equivalence contract that lets dedup_resolve run linear in
    mega-clusters of identical text (stress set: 9781-copy cluster,
    ~48M pairs -> 1 edge per member)."""
    from pyspark.sql import functions as F

    from speech_data_pipeline_spark.operators.dedup import (
        minhash_dedup_pairs,
        minhash_dedup_pairs_collapsed,
    )
    from speech_data_pipeline_spark.operators.graph import connected_components

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base + " extra"
    rows_ = []
    for i in range(30):  # mega exact-dup cluster on one text
        rows_.append((i, base))
    rows_.append((100, near))  # near-dup of the cluster
    rows_.append((200, "totally different words nothing shared here at all"))
    for i in range(300, 306):  # second exact group
        rows_.append((i, "one two three four five six seven eight nine ten"))
    df = spark.createDataFrame(rows_, "doc_id long, text string")
    kw = dict(k=16, shingle_len=5, bands=4, threshold=0.5)

    def comps(pairs):
        return {
            (r["id"], r["component"])
            for r in connected_components(pairs, "id_a", "id_b").collect()
        }

    full = comps(minhash_dedup_pairs(df, **kw).select("id_a", "id_b"))
    collapsed_pairs = minhash_dedup_pairs_collapsed(df, **kw)
    assert comps(collapsed_pairs) == full
    # and the pair list is LINEAR: 29 member links + rep-level pairs,
    # never the 30*29/2 within-cluster quadratic
    n_pairs = collapsed_pairs.count()
    assert n_pairs < 29 + 5 + 10


class TestWinnowFingerprints:
    def _brute(self, i, t, k=8, w=4):
        import hashlib

        n = max(len(t) - k + 1, 1)
        grams = [
            int(hashlib.md5(t[p:p + k].encode()).hexdigest()[:7], 16)
            for p in range(n)
        ]
        out = set()
        for j in range(max(len(grams) - w + 1, 1)):
            sl = grams[j:j + w]
            mn = min(sl)
            off = max(q for q, v in enumerate(sl) if v == mn)
            out.add((i, j + 1 + off, mn))
        return out

    def test_matches_brute_selection(self, spark):
        from speech_data_pipeline_spark.operators.text import (
            winnow_fingerprints,
        )

        texts = [
            "the quick brown fox jumps over the lazy dog",
            "abcdefghijklmnopqrstuvwxyz" * 3,
            "aaaaaaaaaaaaaaaaaaaa",  # all-equal hashes: rightmost rule
            "short",
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        got = {
            (r["id"], r["pos"], r["fp"])
            for r in winnow_fingerprints(df).collect()
        }
        exp = set().union(*[self._brute(i, t) for i, t in enumerate(texts)])
        assert got == exp

    def test_shared_substring_guarantee(self, spark):
        # Winnowing guarantee: a shared substring of length >= w+k-1
        # (= 11 here) always yields a shared fingerprint HASH.
        from speech_data_pipeline_spark.operators.text import (
            winnow_fingerprints,
        )

        shared = "XCOMMONSUBSTRINGX"  # 17 chars >= 11
        df = spark.createDataFrame(
            [
                (1, "left padding aaa " + shared + " right tail bbb"),
                (2, "совсем другой текст " + shared + " and more"),
            ],
            "doc_id long, text string",
        )
        rows = winnow_fingerprints(df).collect()
        fps1 = {r["fp"] for r in rows if r["id"] == 1}
        fps2 = {r["fp"] for r in rows if r["id"] == 2}
        assert fps1 & fps2

    def test_density_near_two_over_w_plus_one(self, spark):
        from speech_data_pipeline_spark.operators.text import (
            winnow_fingerprints,
        )
        from speech_data_pipeline_spark.sources.catalog import load_table

        d = load_table(spark, "/root/testdata/sf0.001", "documents")
        n_docs = d.count()
        n_fp = winnow_fingerprints(d).count()
        n_grams = sum(
            max(len(r["text"]) - 7, 1) for r in d.collect()
        )
        density = n_fp / n_grams
        # expected 2/(w+1) = 0.4; generous band
        assert 0.3 < density < 0.5
        assert n_fp >= n_docs  # every doc fingerprinted


class TestAllPairsPrefix:
    def _brute_pairs(self, texts, t2_num, t2_den, n=3):
        import re

        def feats(t):
            w = re.findall(r"[a-z]+", t.lower())
            return set(
                " ".join(w[i:i + n]) for i in range(len(w) - n + 1)
            )

        sets = {i: feats(t) for i, t in enumerate(texts)}
        out = {}
        ids = sorted(i for i in sets if sets[i])
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a, b = ids[x], ids[y]
                ov = len(sets[a] & sets[b])
                na, nb = len(sets[a]), len(sets[b])
                if ov * ov * t2_den >= t2_num * na * nb:
                    out[(a, b)] = ov
        return out

    def test_complete_vs_brute_on_crafted_corpus(self, spark):
        from speech_data_pipeline_spark.operators.dedup import (
            allpairs_prefix_cosine,
        )

        base = ("the quick brown fox jumps over the lazy dog while "
                "seven wizards brew strange potions at midnight")
        texts = [
            base,
            base + " and then everyone went home",   # near-dup of 0
            base.replace("fox", "cat"),              # near-dup of 0
            "completely unrelated text about spark query planning "
            "and distributed shuffle exchange strategies",
            "completely unrelated text about spark query planning "
            "and distributed shuffle exchange strategies tonight",
            "zz",                                     # no 3-grams
        ]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        got = {
            (r["id_a"], r["id_b"]): r["n_overlap"]
            for r in allpairs_prefix_cosine(
                df, t2_num=1, t2_den=4, ngram_n=3
            ).collect()
        }
        exp = self._brute_pairs(texts, 1, 4)
        assert got == exp
        assert (0, 1) in got and (3, 4) in got
        assert not any(3 in p or 4 in p for p in got if p != (3, 4))

    def test_complete_vs_brute_on_fixture(self, spark):
        from speech_data_pipeline_spark.operators.dedup import (
            allpairs_prefix_cosine,
        )
        from speech_data_pipeline_spark.sources.catalog import load_table

        d = load_table(spark, "/root/testdata/sf0.001", "documents")
        texts = {r["doc_id"]: r["text"] for r in d.collect()}
        ids = sorted(texts)
        got = {
            (r["id_a"], r["id_b"]): r["n_overlap"]
            for r in allpairs_prefix_cosine(
                d, t2_num=1, t2_den=4, ngram_n=3
            ).collect()
        }
        exp_list = self._brute_pairs(
            [texts[i] for i in ids], 1, 4
        )
        exp = {
            (ids[a], ids[b]): ov for (a, b), ov in exp_list.items()
        }
        assert got == exp
        assert len(got) > 0


class TestCanonicalPick:
    def test_survivor_is_best_quality_member(self, spark):
        from speech_data_pipeline_spark.queries.registry import QUERIES

        sf = "/root/testdata/sf0.001"
        picks = QUERIES["dedup_canonical_pick"](spark, sf).collect()
        assert picks
        members = {
            r["doc_id"]: (r["component"], r["is_canonical"])
            for r in QUERIES["dedup_resolve"](spark, sf).collect()
        }
        qual = {
            r["doc_id"]: r["quality"]
            for r in QUERIES["text_quality_score"](spark, sf).collect()
        }
        from collections import defaultdict

        comp_members = defaultdict(list)
        for d, (c, _) in members.items():
            comp_members[c].append(d)
        for p in picks:
            ms = comp_members[p["component"]]
            assert len(ms) == p["n_members"] >= 2
            assert p["survivor_id"] in ms
            best = max(qual[m] for m in ms)
            assert qual[p["survivor_id"]] == best == p["best_quality"]
            # tie-break: min doc_id among best-quality members
            assert p["survivor_id"] == min(
                m for m in ms if qual[m] == best
            )
            assert p["chars_saved"] >= 0


class TestAllpairsBlocked:
    """sim_allpairs_blocked = exact scores on LSH-bounded candidates.

    Two pinned properties: (a) SUBSET-WITH-IDENTICAL-SCORES — every
    blocked pair appears in the global 100%-recall exact join
    (allpairs_prefix_cosine) with bit-identical n_overlap/cosine, since
    both apply the same scoring expression and threshold and the global
    form dominates on recall; (b) identical-text pairs always survive
    the blocking (identical signatures ⇒ every band collides)."""

    def _corpus(self, spark):
        from speech_data_pipeline_spark.sources.catalog import load_table

        return load_table(spark, "/root/testdata/sf0.001", "documents")

    def test_subset_of_global_exact_with_equal_scores(self, spark):
        from speech_data_pipeline_spark.operators.dedup import (
            allpairs_blocked_cosine,
            allpairs_prefix_cosine,
            exact_collapse_reps,
        )

        reps = exact_collapse_reps(self._corpus(spark))
        blocked = {
            (r["id_a"], r["id_b"]): (r["n_overlap"], r["cosine"])
            for r in allpairs_blocked_cosine(
                reps, t2_num=1, t2_den=2, ngram_n=3
            ).collect()
        }
        exact = {
            (r["id_a"], r["id_b"]): (r["n_overlap"], r["cosine"])
            for r in allpairs_prefix_cosine(
                reps, t2_num=1, t2_den=2, ngram_n=3
            ).collect()
        }
        assert blocked, "blocking found no pairs on the sf0.001 corpus"
        for pair, score in blocked.items():
            assert pair in exact
            assert exact[pair] == score
        assert blocked.keys() <= exact.keys()

    def test_schema_drop_in(self, spark):
        from speech_data_pipeline_spark.operators.dedup import (
            allpairs_blocked_cosine,
            allpairs_prefix_cosine,
        )

        d = docs(spark)
        blocked, exact = allpairs_blocked_cosine(d), allpairs_prefix_cosine(d)
        assert [(f.name, f.dataType) for f in blocked.schema] == [
            (f.name, f.dataType) for f in exact.schema
        ]

    def test_near_identical_pair_survives_blocking(self, spark):
        from speech_data_pipeline_spark.operators.dedup import (
            allpairs_blocked_cosine,
        )

        out = rows(allpairs_blocked_cosine(docs(spark)), "id_a", "id_b")
        # 1 and 3 differ by one word: near-identical shingle sets ⇒
        # band collision; word-3-gram cosine well above 1/sqrt(2)
        assert (1, 3) in out
        # unrelated texts never pair
        assert (1, 4) not in out and (3, 4) not in out


class TestBlockedContainment:
    """allpairs_blocked_containment: sub-document duplication over LSH
    candidates — the asymmetric score cosine misses."""

    def test_embedded_paragraph_high_containment_low_cosine(self, spark):
        from speech_data_pipeline_spark.operators.dedup import (
            allpairs_blocked_cosine,
            allpairs_blocked_containment,
        )

        para = (
            "the quick brown fox jumps over the lazy dog while the "
            "cat watches from the warm window sill nearby quietly"
        )
        filler = (
            "unrelated filler sentences about database engines and "
            "columnar storage formats with vectorized execution and "
            "adaptive query planning across many worker nodes in a "
            "cluster that scales elastically under load variations "
        )
        page = para + " " + filler * 6
        d = spark.createDataFrame(
            [(1, para), (2, page), (3, "totally disjoint words here")],
            ["doc_id", "text"],
        )
        cont = {
            (r["id_a"], r["id_b"]): r["containment"]
            for r in allpairs_blocked_containment(d, c_num=4, c_den=5).collect()
        }
        # the paragraph is fully contained in the page -> containment 1.0
        assert cont.get((1, 2)) == 1.0
        # ...but the size gap keeps cosine below the 1/sqrt(2) gate
        cos = {
            (r["id_a"], r["id_b"])
            for r in allpairs_blocked_cosine(d).collect()
        }
        assert (1, 2) not in cos
        assert all(3 not in p for p in cont)

    def test_containment_threshold_excludes_partial(self, spark):
        from speech_data_pipeline_spark.operators.dedup import (
            allpairs_blocked_containment,
            blocked_overlap_pairs,
        )

        a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        b = "alpha beta gamma delta epsilon zeta other words entirely differ"
        d = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "text"])
        # shared 6-token prefix -> rare-gram candidates MUST key the
        # pair; 4 shared 3-grams of 8 each = containment 0.5 < 0.8
        ov = {
            (r["id_a"], r["id_b"]): (r["ov"], r["na"], r["nb"])
            for r in blocked_overlap_pairs(
                d, candidates="rare-grams"
            ).collect()
        }
        o, na, nb = ov[(1, 2)]
        assert (o, na, nb) == (4, 8, 8)
        out = allpairs_blocked_containment(d, c_num=4, c_den=5).collect()
        assert not any(r["id_a"] == 1 and r["id_b"] == 2 for r in out)

    def test_overlap_core_matches_cosine_path(self, spark):
        """blocked_overlap_pairs is the shared core: reconstructing
        cosine from (ov, na, nb) must reproduce allpairs_blocked_cosine
        exactly (same candidates, same counts)."""
        import math

        from speech_data_pipeline_spark.operators.dedup import (
            allpairs_blocked_cosine,
            blocked_overlap_pairs,
            exact_collapse_reps,
        )
        from speech_data_pipeline_spark.sources.catalog import load_table

        d = exact_collapse_reps(
            load_table(spark, "/root/testdata/sf0.001", "documents")
        )
        core = {
            (r["id_a"], r["id_b"]): (r["ov"], r["na"], r["nb"])
            for r in blocked_overlap_pairs(d).collect()
        }
        gated = {
            (r["id_a"], r["id_b"]): (r["n_overlap"], r["cosine"])
            for r in allpairs_blocked_cosine(d).collect()
        }
        rebuilt = {}
        for key, (ov, na, nb) in core.items():
            if ov * ov * 2 >= na * nb:
                c = math.floor(ov / math.sqrt(na * nb) * 1e6) / 1e6
                rebuilt[key] = (ov, c)
        assert rebuilt == gated
