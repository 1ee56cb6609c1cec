"""Semantics tests for text analysis and similarity search operators."""

import math

from conftest import rows

from speech_data_pipeline_spark.operators.similarity import (
    cosine_topk,
    embedding_neardup_pairs,
    hyperplanes,
    lsh_topk,
    rp_lsh_bucket,
)
from speech_data_pipeline_spark.operators.text import (
    fingerprint,
    language_id,
    quality_score,
    token_count,
)


def test_token_count(spark):
    df = spark.createDataFrame(
        [(1, "hello world,  foo"), (2, "   "), (3, "one")], ["doc_id", "text"]
    )
    out = {r[0]: (r[1], r[2]) for r in rows(token_count(df), "doc_id", "n_tokens", "n_subwords")}
    assert out[1] == (3, 4)  # 'hello','world',',','foo'
    assert out[2][0] == 0
    assert out[3] == (1, 1)


def test_quality_bounds_and_repetition(spark):
    df = spark.createDataFrame(
        [
            (1, "a varied sentence with many distinct and useful words here."),
            (2, "spam spam spam spam spam spam spam spam spam spam"),
        ],
        ["doc_id", "text"],
    )
    out = {r[0]: r for r in rows(quality_score(df), "doc_id", "uniq_token_ratio", "quality")}
    assert 0.0 <= out[1][2] <= 1.0 and 0.0 <= out[2][2] <= 1.0
    assert out[1][1] > out[2][1]  # repetition tanks uniq ratio


def test_language_id_obvious_sentences(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is on the mat and the dog is here"),
            (2, "der Hund ist nicht da und die Katze ist hier"),
            (3, "xyzzy qwerty plugh"),
        ],
        ["doc_id", "text"],
    )
    out = {r[0]: r[1] for r in rows(language_id(df), "doc_id", "pred_lang")}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "und"


def test_fingerprint_stable_and_discriminative(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abcdefghij"), (3, "zzzzzzzzzz")],
        ["doc_id", "text"],
    )
    out = {r[0]: r[1] for r in rows(fingerprint(df), "doc_id", "fingerprint")}
    assert out[1] == out[2] != out[3]


def vecs(spark):
    data = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),   # close to 0
        (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal
        (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite
        (4, [1.0, 0.01, 0.0, 0.0]),  # closest to 0
    ]
    return spark.createDataFrame(data, ["vec_id", "embedding"])


def test_cosine_topk_ordering(spark):
    out = rows(cosine_topk(vecs(spark), [1.0, 0.0, 0.0, 0.0], k=3), "vec_id")
    got = [r[0] for r in sorted(out)]
    assert set(got) == {0, 1, 4}
    full = cosine_topk(vecs(spark), [1.0, 0.0, 0.0, 0.0], k=5).collect()
    assert [r.vec_id for r in full[:3]] == [0, 4, 1]
    assert math.isclose(full[0].cos_sim, 1.0, abs_tol=1e-6)


def test_lsh_bucket_deterministic_and_topk_subset(spark):
    planes = hyperplanes(4, 3, seed=7)
    b1 = rows(rp_lsh_bucket(vecs(spark), planes), "vec_id", "bucket")
    b2 = rows(rp_lsh_bucket(vecs(spark), planes), "vec_id", "bucket")
    assert b1 == b2
    out = lsh_topk(vecs(spark), [1.0, 0.0, 0.0, 0.0], k=3, n_planes=2, seed=7)
    got = {r.vec_id for r in out.collect()}
    exact = {0, 4, 1}
    assert got <= exact | {2, 3} and 0 in got  # query's own bucket contains it


def test_embedding_neardup_pairs(spark):
    out = rows(embedding_neardup_pairs(vecs(spark), n_planes=2, threshold=0.95))
    pairs = {(a, b) for a, b, _ in out}
    assert (0, 4) in pairs
    assert all(not (a == 2 or b == 2) for a, b in pairs)


def test_neardup_explicit_dim_matches_probed(spark):
    probed = set(rows(embedding_neardup_pairs(vecs(spark), n_planes=2, threshold=0.9)))
    explicit = set(
        rows(embedding_neardup_pairs(vecs(spark), n_planes=2, threshold=0.9, dim=4))
    )
    assert probed and probed == explicit


def clustered_vecs(spark, n_clusters=5, per=60, dim=16, seed=3):
    """Cluster-structured embeddings — the regime ANN is for (real
    model embeddings cluster; uniform-random vectors have near-tied
    orthogonal 'neighbors' no LSH family can rank)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)) * 5
    data = []
    vid = 0
    for c in centers:
        for _ in range(per):
            data.append((vid, (c + rng.standard_normal(dim) * 0.3).tolist()))
            vid += 1
    query = (centers[0] + rng.standard_normal(dim) * 0.3).tolist()
    return spark.createDataFrame(data, ["vec_id", "embedding"]), query


def test_multiprobe_recall(spark):
    """Multi-probe LSH: flipping the low-margin sign bits recovers the
    neighbors single-probe misses — recall@10 >= 0.9 at 5 probes."""
    df, q = clustered_vecs(spark)
    exact = {r.vec_id for r in cosine_topk(df, q, k=10).collect()}
    single = {
        r.vec_id
        for r in lsh_topk(df, q, k=10, n_planes=6, seed=42, n_probes=1).collect()
    }
    multi = {
        r.vec_id
        for r in lsh_topk(df, q, k=10, n_planes=6, seed=42, n_probes=5).collect()
    }
    recall_single = len(exact & single) / 10
    recall_multi = len(exact & multi) / 10
    assert recall_multi >= 0.9
    assert recall_multi >= recall_single


def test_probe_buckets_order_and_determinism():
    from speech_data_pipeline_spark.operators.similarity import (
        hyperplanes,
        probe_buckets,
    )

    planes = hyperplanes(8, 4, seed=11)
    q = [0.3, -1.2, 0.7, 0.05, 0.0, 2.0, -0.4, 1.1]
    probes = probe_buckets(q, planes, 6)
    assert probes == probe_buckets(q, planes, 6)  # deterministic
    assert len(probes) == len(set(probes)) == 6  # distinct buckets
    base = probes[0]
    # first neighbor probe is exactly one bit away from the base bucket
    assert sum(a != b for a, b in zip(base, probes[1])) == 1


def test_ivf_topk_structure_and_recall(spark):
    """IVF: nprobe=n_cells degenerates to exact search; with fewer
    probes the result is a subset of the exact top-k ordering."""
    import numpy as np

    from speech_data_pipeline_spark.operators.similarity import ivf_topk

    rng = np.random.default_rng(11)
    base = rng.standard_normal((40, 8))
    q = base[0] + 0.01 * rng.standard_normal(8)  # id 0 is the true top hit
    df = spark.createDataFrame(
        [(i, base[i].tolist()) for i in range(40)], ["vec_id", "embedding"]
    )
    qv = [float(x) for x in q]

    exact = [r.id for r in cosine_topk(df, qv, k=10, id_col="vec_id")
             .withColumnRenamed("vec_id", "id").collect()]
    # full probe == exact search (every cell scanned)
    full = ivf_topk(df, qv, k=10, n_cells=4, nprobe=4)
    assert [r.id for r in full.collect()] == exact
    # partial probe: results are valid hits ranked consistently, and
    # the overall best match survives (it shares the query's cell
    # almost surely for an epsilon perturbation)
    part = ivf_topk(df, qv, k=10, n_cells=4, nprobe=2).collect()
    assert 0 < len(part) <= 10
    assert part[0].id == exact[0] == 0
    sims = [r.cos_sim for r in part]
    assert sims == sorted(sims, reverse=True)
    # deterministic across partitionings
    again = ivf_topk(df.repartition(7), qv, k=10, n_cells=4, nprobe=2).collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in part]


def test_ivf_recall_contract_on_embeddings_fixture(spark):
    """The IVF nprobe/recall tradeoff on the real embeddings fixture:
    recall@10 vs exact cosine top-10 is monotone non-decreasing in
    nprobe and exact at nprobe == n_cells (every cell scanned), while
    query cost scales with nprobe/n_cells.

    The fixture's embeddings are near-uniform (no cluster structure),
    so the curve is close to the uniform-mass floor recall ≈
    nprobe/n_cells (measured: 0.3/0.3/0.4/0.6/0.8/0.9/0.9/1.0 for
    nprobe 1..8 at n_cells=8) — the coarse quantizer can only beat
    that floor when the data actually clusters, which is the honest
    contract to pin. The deterministic pipeline makes these measured
    floors stable."""
    from speech_data_pipeline_spark.operators.similarity import ivf_topk
    from speech_data_pipeline_spark.queries.text_q import _mp_query_vec
    from speech_data_pipeline_spark.sources.catalog import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qv = _mp_query_vec()
    exact = {r.vec_id for r in cosine_topk(e, qv, k=10).collect()}
    recalls = []
    for nprobe in (2, 5, 8):
        got = {
            r.id for r in ivf_topk(e, qv, k=10, n_cells=8, nprobe=nprobe).collect()
        }
        recalls.append(len(exact & got) / 10)
        if nprobe == 8:
            assert got == exact  # full probe degenerates to exact search
    assert recalls == sorted(recalls), recalls  # monotone in nprobe
    assert recalls[0] >= 0.2 and recalls[1] >= 0.7 and recalls[2] == 1.0, recalls


def test_ann_batch_topk_matches_per_query(spark):
    """Batched ANN == the per-query multi-probe search, and each
    query's ranked list is internally consistent."""
    from speech_data_pipeline_spark.operators.similarity import ann_batch_topk

    df, q0 = clustered_vecs(spark)
    import numpy as np

    rng = np.random.default_rng(99)
    queries = [q0, list(rng.standard_normal(len(q0)))]
    batch = ann_batch_topk(df, queries, k=5, n_planes=6, seed=42, n_probes=3)
    got = {}
    for r in batch.collect():
        got.setdefault(r.query_id, []).append((r.rnk, r.vec_id, r.cos_sim))
    assert set(got) == {0, 1}
    for qid, qv in enumerate(queries):
        solo = lsh_topk(df, qv, k=5, n_planes=6, seed=42, n_probes=3).collect()
        want = [(i + 1, r.vec_id, r.cos_sim) for i, r in enumerate(solo)]
        assert sorted(got[qid]) == want
        rnks = [t[0] for t in sorted(got[qid])]
        assert rnks == list(range(1, len(rnks) + 1))


def test_kmeans_assign_recovers_blobs_deterministically(spark):
    """Two Lloyd iterations separate well-spaced blobs regardless of the
    id-based init, and the trajectory is partitioning-invariant."""
    from speech_data_pipeline_spark.operators.similarity import kmeans_assign

    df, _ = clustered_vecs(spark)  # 5 blobs of 60, ids blob-contiguous
    a = kmeans_assign(df, dim=16, n_cells=5, iters=4)
    got = {r.id: r.cell for r in a.collect()}
    blobs = [set(range(b * 60, (b + 1) * 60)) for b in range(5)]
    pure = sum(1 for blob in blobs if len({got[i] for i in blob}) == 1)
    assert pure >= 4  # k-means from a blind init: most blobs resolve clean
    again = {
        r.id: r.cell
        for r in kmeans_assign(df.repartition(7), dim=16, n_cells=5, iters=4).collect()
    }
    assert again == got  # trajectory is partitioning-invariant


def test_semantic_dedup_reps_and_mapping(spark):
    """SemDeDup contract: exactly one representative per cell, every
    member maps to its cell's rep, the rep attains the cell-minimum
    distance, and the result is partitioning-invariant."""
    from speech_data_pipeline_spark.operators.similarity import semantic_dedup

    df, _ = clustered_vecs(spark)
    out = semantic_dedup(df, dim=16, n_cells=5, iters=3).collect()
    by_cell = {}
    for r in out:
        by_cell.setdefault(r.cell, []).append(r)
    assert sum(len(v) for v in by_cell.values()) == df.count()
    for cell, members in by_cell.items():
        reps = [r for r in members if r.is_rep]
        assert len(reps) == 1
        rep = reps[0]
        assert all(m.rep_id == rep.id for m in members)
        assert all(m.dist >= rep.dist for m in members)
    again = semantic_dedup(df.repartition(9), dim=16, n_cells=5, iters=3).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_pq_topk_matches_numpy_replay(spark):
    """PQ/ADC: codes and distances match an independent NumPy replay of
    the same protocol (quantized one-step codebooks, per-subspace
    argmin with cell-id ties, ADC sum in subspace order)."""
    import numpy as np

    from speech_data_pipeline_spark.operators.similarity import pq_topk
    from speech_data_pipeline_spark.queries.text_q import _mp_query_vec

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = pq_topk(e, _mp_query_vec(), m_sub=4, n_cells=4, k=10).collect()
    assert len(got) == 10

    rows_ = e.collect()
    ids = np.array([r["vec_id"] for r in rows_])
    V = np.array([r["embedding"] for r in rows_], dtype=np.float64)
    q = np.array(_mp_query_vec(), dtype=np.float64)
    scale = float(1 << 20)
    cells = ids % 4
    cent = np.zeros((4, V.shape[1]))
    for c in range(4):
        m = cells == c
        cent[c] = np.floor(V[m] * scale).sum(axis=0) / (m.sum() * scale)
    sub = V.shape[1] // 4
    codes = np.zeros((len(ids), 4), dtype=int)
    adc = np.zeros(len(ids))
    for j in range(4):
        sl = slice(j * sub, (j + 1) * sub)
        d = ((V[:, None, sl] - cent[None, :, sl]) ** 2).sum(axis=2)
        codes[:, j] = d.argmin(axis=1)  # ties: argmin takes lowest index
        qd = ((q[sl] - cent[:, sl]) ** 2).sum(axis=1)
        adc += qd[codes[:, j]]
    order = np.lexsort((ids, adc))[:10]
    expect = {
        int(ids[i]): ("-".join(map(str, codes[i])), adc[i]) for i in order
    }
    for r in got:
        c, d = expect[r["id"]]
        assert r["codes"] == c
        assert abs(r["adc_dist"] - d) < 2e-6


def test_ivfpq_recall_contract_clustered(spark):
    """IVF+PQ composed index (coarse routing + residual codes + ADC +
    exact rerank) on cluster-structured data — the regime the index is
    for: the query's cluster is routed correctly at nprobe=1 and the
    reranked top-10 is EXACT at modest nprobe, because ADC only has to
    land the true neighbors inside the 40-row shortlist, not rank them.
    Also pins determinism across input partitionings (broadcast one-row
    codebooks + quantized-grid training make the whole index
    layout-proof)."""
    from speech_data_pipeline_spark.operators.similarity import ivfpq_topk

    df, q = clustered_vecs(spark)
    exact = [r.vec_id for r in cosine_topk(df, q, k=10).collect()]
    recalls = []
    for nprobe in (1, 2, 5):
        got = {
            r.id
            for r in ivfpq_topk(
                df, q, k=10, n_cells=5, nprobe=nprobe, m_sub=4, n_pq=8,
                rerank_n=40,
            ).collect()
        }
        recalls.append(len(set(exact) & got) / 10)
    # query's own cluster found at nprobe=1; full recall by nprobe=2
    assert recalls[0] >= 0.9, recalls
    assert recalls[1] == 1.0 and recalls[2] == 1.0, recalls
    assert recalls == sorted(recalls), recalls  # monotone in nprobe
    a = ivfpq_topk(df, q, k=10, n_cells=5, nprobe=2, m_sub=4, n_pq=8,
                   rerank_n=40).collect()
    b = ivfpq_topk(df.repartition(7), q, k=10, n_cells=5, nprobe=2,
                   m_sub=4, n_pq=8, rerank_n=40).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_ivfpq_codebook_and_rerank_value(spark):
    """Two structural contracts of the composition: (1) sampled-init
    codebooks beat the degenerate partition-init (residuals are
    zero-mean, so partition-init codewords collapse to ~0 — the reason
    ivfpq trains from sampled residuals); verified indirectly: codes
    are non-constant across the corpus. (2) rerank strictly helps:
    recall@10 with the exact-rerank stage >= recall of the raw ADC
    ranking on the embeddings fixture."""
    from speech_data_pipeline_spark.operators.similarity import ivfpq_topk
    from speech_data_pipeline_spark.queries.text_q import _mp_query_vec
    from speech_data_pipeline_spark.sources.catalog import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qv = _mp_query_vec()
    exact = {r.vec_id for r in cosine_topk(e, qv, k=10).collect()}
    raw = ivfpq_topk(e, qv, k=10, n_cells=8, nprobe=8, m_sub=4, n_pq=8)
    rr = ivfpq_topk(
        e, qv, k=10, n_cells=8, nprobe=8, m_sub=4, n_pq=8, rerank_n=50
    )
    raw_rows = raw.collect()
    rr_rows = rr.collect()
    # codes are informative: more than one distinct code string in top-k
    assert len({r.codes for r in raw_rows}) > 1
    rec_raw = len(exact & {r.id for r in raw_rows}) / 10
    rec_rr = len(exact & {r.id for r in rr_rows}) / 10
    assert rec_rr >= rec_raw
    # rerank output carries both scores and is ordered by exact cosine
    sims = [r.cos_sim for r in rr_rows]
    assert sims == sorted(sims, reverse=True)


# ------------------------------------------- Cavnar–Trenkle language ID

#: Authored multilingual fixture — sentences DISJOINT from the
#: CT_SEEDS training prose, including the CJK path (VERDICT r3 #7).
CT_FIXTURE = [
    (1, "en", "the children walk over the hill and read a book in the sun"),
    (2, "en", "many people jump over the lazy dog every morning with interest"),
    (3, "en", "she asks good questions and listens to the answers with care"),
    (4, "en", "we built a strong house and the roof will not leak this autumn"),
    (5, "en", "learning about the world is the best thing that you can do"),
    (6, "de", "die kinder gehen ueber den huegel und lesen ein buch in der sonne"),
    (7, "de", "viele menschen springen jeden morgen mit interesse ueber den faulen hund"),
    (8, "de", "sie stellt gute fragen und hoert den antworten genau zu"),
    (9, "de", "wir haben ein starkes haus gebaut und das dach wird im herbst nicht undicht"),
    (10, "de", "ueber die welt zu lernen ist das beste was man tun kann"),
    (11, "fr", "les enfants vont sur la colline et lisent un livre sous le soleil"),
    (12, "fr", "beaucoup de gens sautent par dessus le chien tous les matins"),
    (13, "fr", "elle pose de bonnes questions et ecoute les reponses avec soin"),
    (14, "fr", "nous avons construit une maison solide et le toit ne fuira pas cet automne"),
    (15, "fr", "apprendre le monde est la meilleure chose que vous puissiez faire"),
    (16, "es", "los ninos van sobre la colina y leen un libro bajo el sol"),
    (17, "es", "mucha gente salta sobre el perro cada manana con interes"),
    (18, "es", "ella hace buenas preguntas y escucha las respuestas con atencion"),
    (19, "es", "hemos construido una casa fuerte y el techo no goteara este otono"),
    (20, "es", "aprender sobre el mundo es lo mejor que puedes hacer"),
    (21, "zh", "孩子们走过山丘在太阳下读一本书"),
    (22, "zh", "许多人每天早上带着兴趣跳过懒狗"),
    (23, "zh", "她提出好的问题并认真听回答"),
    (24, "zh", "我们建造了坚固的房子屋顶在秋天不会漏水"),
    (25, "zh", "学习世界上的知识是你能做的最好的事情"),
]


def test_ct_language_id_accuracy_at_least_95pct(spark):
    """≥95% on the held-out multilingual fixture (currently 25/25,
    CJK included); empty text abstains to 'und'."""
    from speech_data_pipeline_spark.operators.text import language_id_trigram

    df = spark.createDataFrame(
        CT_FIXTURE + [(26, "und", "")], "doc_id long, lang string, text string"
    )
    out = language_id_trigram(df).select("doc_id", "lang", "pred_lang").collect()
    scored = [r for r in out if r["lang"] != "und"]
    acc = sum(r["lang"] == r["pred_lang"] for r in scored) / len(scored)
    assert acc >= 0.95
    by_lang = {}
    for r in scored:
        by_lang.setdefault(r["lang"], []).append(r["lang"] == r["pred_lang"])
    assert all(any(v) for v in by_lang.values())  # every lang, incl. zh, hit
    (und,) = [r for r in out if r["doc_id"] == 26]
    assert und["pred_lang"] == "und"


def test_ct_profiles_deterministic_and_padded(spark):
    """Profiles are pure functions of the seeds: rank 1..k, unique
    grams, and every gram drawn from the normalized alphabet."""
    import re

    from speech_data_pipeline_spark.operators.text import (
        CT_K_PROF,
        ct_profiles,
    )

    profs = ct_profiles()
    assert set(profs) == {"en", "de", "fr", "es", "zh"}
    for p in profs.values():
        ranks = sorted(p.values())
        assert ranks == list(range(1, len(ranks) + 1))
        assert len(ranks) <= CT_K_PROF
        for g in p:
            assert 1 <= len(g) <= 3
            assert re.fullmatch(r"[a-z一-龥 ]+", g)
    assert ct_profiles() == profs


def _fold_dot(a, b):
    """Strict left-to-right fold — bit-identical to F.aggregate /
    DuckDB list_sum (np.dot/BLAS would reassociate and can flip
    values sitting within an ulp of a tie or a bucket-sign boundary)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def _fold_cos(a, b):
    import math

    return _fold_dot(a, b) / (
        math.sqrt(_fold_dot(a, a)) * math.sqrt(_fold_dot(b, b))
    )


def _emb_rows(spark, sf="/root/testdata/sf0.001"):
    from speech_data_pipeline_spark.sources.catalog import load_table

    return [
        (r["vec_id"], r["label"], [float(x) for x in r["embedding"]])
        for r in load_table(spark, sf, "embeddings").collect()
    ]


def test_hard_negatives_match_bruteforce(spark):
    """Fold-exact replay of bucket → candidate → argmax on sf0.001."""
    from speech_data_pipeline_spark.operators.similarity import hyperplanes
    from speech_data_pipeline_spark.queries.text_q import (
        _HN_DUP_CEIL,
        _HN_PLANES,
        mine_hard_negatives,
    )

    rows = _emb_rows(spark)
    planes = hyperplanes(64, _HN_PLANES, seed=42)
    emb = {i: v for i, l, v in rows}
    lab = {i: l for i, l, v in rows}
    buck = {
        i: "".join(
            "1" if _fold_dot(p, emb[i]) >= 0 else "0" for p in planes
        )
        for i in emb
    }
    exp = {}
    for i in emb:
        best = None
        for j in emb:
            if j == i or lab[j] == lab[i] or buck[j] != buck[i]:
                continue
            c = _fold_cos(emb[i], emb[j])
            if c >= _HN_DUP_CEIL:
                continue
            if best is None or (-c, j) < best:
                best = (-c, j)
        if best is not None:
            exp[i] = best[1]
    got = {
        r["anchor_id"]: r["neg_id"]
        for r in mine_hard_negatives(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert got == exp
    assert exp  # fixture must actually exercise the path


def test_label_centroids_match_bruteforce(spark):
    import math

    import numpy as np

    from speech_data_pipeline_spark.queries.text_q import (
        _CENT_Q,
        embed_label_centroids,
    )

    rows = _emb_rows(spark)
    sums, counts = {}, {}
    for i, l, v in rows:
        q = np.array([math.floor(x * _CENT_Q) for x in v], dtype=np.int64)
        sums[l] = sums.get(l, np.zeros(64, dtype=np.int64)) + q
        counts[l] = counts.get(l, 0) + 1
    out = embed_label_centroids(spark, "/root/testdata/sf0.001").collect()
    labels = sorted(sums)
    assert len(out) == len(labels) * (len(labels) - 1) // 2
    for r in out:
        ca, cb = sums[r["label_a"]].astype(float), sums[r["label_b"]].astype(float)
        exp = float(np.dot(ca, cb) / (np.linalg.norm(ca) * np.linalg.norm(cb)))
        assert abs(r["centroid_cos"] - exp) < 2e-6
        assert r["n_a"] == counts[r["label_a"]]
        assert r["n_b"] == counts[r["label_b"]]


def test_ndcg_matches_bruteforce(spark):
    import numpy as np

    from speech_data_pipeline_spark.queries.text_q import (
        _NDCG_ANCHORS,
        _NDCG_DISC,
        _NDCG_K,
        _NDCG_PREFIX,
        eval_ndcg_at_k,
    )

    import math

    rows = _emb_rows(spark)
    emb = {i: v for i, l, v in rows}
    lab = {i: l for i, l, v in rows}
    out = eval_ndcg_at_k(spark, "/root/testdata/sf0.001").collect()
    got = {
        r["anchor_id"]: (r["n_rel"], r["dcg_ppm"], r["idcg_ppm"], r["ndcg"])
        for r in out
    }
    anchors = [i for i in emb if i < _NDCG_ANCHORS]
    assert sorted(got) == sorted(anchors)  # exactly one row per anchor
    for a in anchors:
        cands = sorted(
            ((-_fold_cos(emb[a], emb[j]), j) for j in emb if j != a),
        )
        rels = [1 if lab[j] == lab[a] else 0 for _, j in cands]
        n_rel = sum(rels)
        dcg = sum(
            r * d for r, d in zip(rels[:_NDCG_K], _NDCG_DISC)
        )
        idcg = _NDCG_PREFIX[min(n_rel, _NDCG_K) - 1] if n_rel else 0
        ndcg = (
            math.floor(dcg / idcg * 1_000_000.0) / 1_000_000.0
            if n_rel
            else 0.0
        )
        assert got[a] == (n_rel, dcg, idcg, ndcg)


def test_calibration_bins_match_bruteforce(spark):
    """Replay bins from the already-gated quality scores."""
    from collections import defaultdict

    from speech_data_pipeline_spark.operators import text as tx
    from speech_data_pipeline_spark.queries.text_q import (
        eval_calibration_bins,
    )
    from speech_data_pipeline_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    d = load_table(spark, sf, "documents")
    rows = (
        tx.quality_score(d)
        .selectExpr(
            "CAST(round(quality * 1000000.0) AS LONG) AS q_ppm",
            "CASE WHEN length(text) >= 200 THEN 1 ELSE 0 END AS pos",
        )
        .collect()
    )
    bins = defaultdict(list)
    for r in rows:
        bins[min(9, r["q_ppm"] // 100000)].append((r["q_ppm"], r["pos"]))
    got = {r["bin"]: r for r in eval_calibration_bins(spark, sf).collect()}
    assert set(got) == set(bins)
    for b, lst in bins.items():
        n = len(lst)
        spm = sum(q for q, _ in lst) // n
        opm = (1_000_000 * sum(p for _, p in lst)) // n
        r = got[b]
        assert (r["n_docs"], r["mean_pred_ppm"], r["obs_ppm"], r["gap_ppm"]) == (
            n, spm, opm, abs(spm - opm),
        )
    # the tiny fixture still has to populate more than one bin
    assert len(bins) >= 2


class TestRandomProjection:
    def test_jl_preserves_pairwise_distances(self, spark):
        # JL lemma sanity: median pairwise-distance distortion of the
        # 16-d projection vs the 64-d original stays well-bounded.
        import numpy as np

        from speech_data_pipeline_spark.operators.similarity import (
            random_projection,
        )
        from speech_data_pipeline_spark.sources.catalog import load_table

        e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        orig = {
            r["vec_id"]: np.array(r["embedding"], dtype=float)
            for r in e.limit(60).collect()
        }
        proj = {
            r["id"]: np.array(r["proj"], dtype=float)
            for r in random_projection(e.limit(60)).collect()
        }
        ids = sorted(orig)
        ratios = []
        for a in range(0, len(ids), 3):
            for b in range(a + 1, len(ids), 7):
                do = np.linalg.norm(orig[ids[a]] - orig[ids[b]])
                dp = np.linalg.norm(proj[ids[a]] - proj[ids[b]])
                if do > 1e-9:
                    ratios.append(dp / do)
        ratios = np.array(ratios)
        assert 0.6 < np.median(ratios) < 1.4
        assert (np.abs(ratios - 1.0) < 0.8).mean() > 0.9

    def test_jl_seed_and_shape_deterministic(self, spark):
        from speech_data_pipeline_spark.operators.similarity import (
            jl_sign_matrix,
            random_projection,
        )
        from speech_data_pipeline_spark.sources.catalog import load_table

        m = jl_sign_matrix(64, 16)
        assert len(m) == 16 and all(len(r) == 64 for r in m)
        assert all(v in (1, -1) for r in m for v in r)
        assert m == jl_sign_matrix(64, 16)  # same seed -> same matrix
        assert m != jl_sign_matrix(64, 16, seed="other")

        e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        r1 = random_projection(e.limit(5)).collect()
        r2 = random_projection(e.limit(5)).collect()
        assert sorted(map(str, r1)) == sorted(map(str, r2))


class TestMmrDiverse:
    def test_mmr_matches_brute_greedy(self, spark):
        import math

        from speech_data_pipeline_spark.queries.registry import QUERIES
        from speech_data_pipeline_spark.sources.catalog import load_table

        sf = "/root/testdata/sf0.001"
        got = sorted(
            (r["rank"], r["vec_id"])
            for r in QUERIES["select_mmr_diverse"](spark, sf).collect()
        )
        rows = {
            r["vec_id"]: list(r["embedding"])
            for r in load_table(spark, sf, "embeddings").collect()
        }

        def cos_ppm(a, b):
            dot = na = nb = 0.0
            for x, y in zip(a, b):
                dot += float(x) * float(y)
            for x in a:
                na += float(x) * float(x)
            for y in b:
                nb += float(y) * float(y)
            return math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6)

        q = rows[0]
        rel = {v: cos_ppm(e, q) for v, e in rows.items()}
        pool = sorted(rows, key=lambda v: (-rel[v], v))[:20]
        chosen = [max(pool, key=lambda v: (rel[v], -v))]
        for _ in range(5):
            rest = [v for v in pool if v not in chosen]
            best = max(
                rest,
                key=lambda v: (
                    7 * rel[v]
                    - 3 * max(cos_ppm(rows[v], rows[s]) for s in chosen),
                    -v,
                ),
            )
            chosen.append(best)
        assert got == sorted((i + 1, v) for i, v in enumerate(chosen))

    def test_mmr_reduces_redundancy_vs_pure_topk(self, spark):
        import math

        from speech_data_pipeline_spark.queries.registry import QUERIES
        from speech_data_pipeline_spark.sources.catalog import load_table

        sf = "/root/testdata/sf0.001"
        sel = [
            r["vec_id"]
            for r in QUERIES["select_mmr_diverse"](spark, sf).collect()
        ]
        rows = {
            r["vec_id"]: list(r["embedding"])
            for r in load_table(spark, sf, "embeddings").collect()
        }

        def cos(a, b):
            dot = na = nb = 0.0
            for x, y in zip(a, b):
                dot += float(x) * float(y)
            for x in a:
                na += float(x) * float(x)
            for y in b:
                nb += float(y) * float(y)
            return dot / (math.sqrt(na) * math.sqrt(nb))

        q = rows[0]
        topk = sorted(
            rows, key=lambda v: (-cos(rows[v], q), v)
        )[:len(sel)]

        def mean_pair_sim(ids):
            s, n = 0.0, 0
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    s += cos(rows[ids[i]], rows[ids[j]])
                    n += 1
            return s / n

        assert mean_pair_sim(sel) <= mean_pair_sim(topk) + 1e-9


class TestKcenterCoreset:
    def test_matches_brute_farthest_first(self, spark):
        import math

        from speech_data_pipeline_spark.queries.registry import QUERIES
        from speech_data_pipeline_spark.sources.catalog import load_table

        sf = "/root/testdata/sf0.001"
        got = sorted(
            (r["rank"], r["vec_id"])
            for r in QUERIES["select_kcenter_coreset"](spark, sf).collect()
        )
        rows = {
            r["vec_id"]: list(r["embedding"])
            for r in load_table(spark, sf, "embeddings").collect()
        }

        def d_ppm(a, b):
            s = 0.0
            for x, y in zip(a, b):
                s += (float(x) - float(y)) * (float(x) - float(y))
            return math.floor(s * 1e6)

        sel = [0]
        for _ in range(4):
            best = max(
                (v for v in rows if v not in sel),
                key=lambda v: (
                    min(d_ppm(rows[v], rows[s]) for s in sel),
                    -v,
                ),
            )
            sel.append(best)
        assert got == sorted((i + 1, v) for i, v in enumerate(sel))

    def test_farthest_first_distances_nonincreasing(self, spark):
        from speech_data_pipeline_spark.queries.registry import QUERIES

        rows = sorted(
            QUERIES["select_kcenter_coreset"](
                spark, "/root/testdata/sf0.001"
            ).collect(),
            key=lambda r: r["rank"],
        )
        ds = [r["sq_dist"] for r in rows[1:]]  # rank 1 is the seed
        assert all(ds[i + 1] <= ds[i] + 1e-9 for i in range(len(ds) - 1))
        assert ds[-1] > 0
