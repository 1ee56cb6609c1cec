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
