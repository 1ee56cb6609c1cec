"""Connected components (large-star/small-star) vs a union-find oracle."""

import numpy as np
import pytest

from speech_data_pipeline_spark.operators.graph import (
    connected_components,
    resolve_duplicates,
)


def _uf_components(n_ids, edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {x: find(x) for x in parent}


def _check(spark, edges):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        (r.id, r.component)
        for r in connected_components(df).collect()
    }
    want = set(_uf_components(None, edges).items())
    assert got == want


def test_cc_two_triangles_and_bridge(spark):
    _check(spark, [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (3, 10), (20, 21)])


def test_cc_chain_worst_case(spark):
    # path graph = worst case for label propagation; star-contraction
    # must still converge (in O(log^2 n) rounds) to a single component
    edges = [(i, i + 1) for i in range(60)]
    _check(spark, edges)


def test_cc_random_graphs_match_union_find(spark):
    rng = np.random.default_rng(7)
    for trial in range(3):
        n = 120
        m = int(rng.integers(30, 140))
        edges = [
            (int(a), int(b))
            for a, b in rng.integers(0, n, size=(m, 2))
            if a != b
        ]
        if not edges:
            continue
        _check(spark, edges)


def test_cc_duplicate_and_reversed_pairs(spark):
    _check(spark, [(2, 1), (1, 2), (2, 1), (3, 2), (5, 9)])


def test_cc_empty(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_cc_partition_invariance(spark):
    edges = [(i, i + 1) for i in range(0, 40, 2)] + [(0, 39), (7, 21)]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    a = sorted(map(tuple, connected_components(df).collect()))
    b = sorted(map(tuple, connected_components(df.repartition(13)).collect()))
    assert a == b


def test_resolve_duplicates_tags_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"text{i}") for i in range(8)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], ["id_a", "id_b"]
    )
    out = {r.doc_id: r for r in resolve_duplicates(docs, pairs).collect()}
    assert out[0].component == 0 and out[0].is_canonical
    assert out[1].component == 0 and not out[1].is_canonical
    assert out[2].component == 0 and out[2].n_members == 3
    assert out[5].component == 5 and out[5].is_canonical and out[5].n_members == 2
    # untouched singleton: own component, canonical, size 1
    assert out[3].component == 3 and out[3].is_canonical and out[3].n_members == 1
    # exactly one canonical per component
    canon = [r for r in out.values() if r.is_canonical]
    assert len(canon) == len({r.component for r in out.values()})


def test_cc_star_loop_path_matches_fast_path(spark):
    """Force the multi-partition alternating-star loop (tiny
    target_edges_per_part) and check it agrees with the single-task
    union-find fast path on chains, cliques, and random graphs."""
    import random

    random.seed(5)
    edges = [(i, i + 1) for i in range(0, 40)]  # chain (star-loop worst case)
    edges += [(100 + a, 100 + b) for a in range(6) for b in range(a + 1, 6)]
    edges += [
        (random.randrange(200, 260), random.randrange(200, 260))
        for _ in range(80)
    ]
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    fast = sorted(map(tuple, connected_components(df).collect()))
    loop = sorted(
        map(
            tuple,
            connected_components(df, target_edges_per_part=8).collect(),
        )
    )
    assert fast == loop


def test_pagerank_fixed_point_hub_and_determinism(spark):
    """Star graph: the hub out-ranks every leaf; ranks are identical
    under input repartitioning (pure integer arithmetic)."""
    from speech_data_pipeline_spark.operators.graph import (
        PR_FP,
        pagerank_fixed_point,
    )

    # undirected star: hub h <-> leaves l1..l6 (two directed edges each)
    rows_ = []
    for i in range(1, 7):
        rows_.append(("h", f"l{i}", 1))
        rows_.append((f"l{i}", "h", 1))
    e = spark.createDataFrame(rows_, "src string, dst string, w long")
    r = {x["node"]: x["rank_fp"] for x in pagerank_fixed_point(e, iters=3).collect()}
    assert all(r["h"] > r[f"l{i}"] for i in range(1, 7))
    leaf_ranks = {r[f"l{i}"] for i in range(1, 7)}
    assert len(leaf_ranks) == 1  # symmetry preserved exactly
    assert r["h"] > PR_FP  # hub gains mass over the uniform start
    r2 = {
        x["node"]: x["rank_fp"]
        for x in pagerank_fixed_point(e.repartition(5), iters=3).collect()
    }
    assert r2 == r


def test_triangle_count_known_graphs(spark):
    """K4 has 4 triangles; removing one edge leaves 2; a star has 0
    (orientation makes the hub the wedge sink, not source)."""
    from speech_data_pipeline_spark.operators.graph import triangle_count

    def count(edges):
        df = spark.createDataFrame(edges, "u long, v long")
        return triangle_count(df).first()

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    r = count(k4)
    assert (r.n_vertices, r.n_edges, r.n_triangles) == (4, 6, 4)
    r = count(k4[:-1])  # drop (3,4)
    assert r.n_triangles == 2
    star = [(0, i) for i in range(1, 8)]
    r = count(star)
    assert (r.n_vertices, r.n_edges, r.n_triangles) == (8, 7, 0)


def test_bfs_hops_on_path_graph(spark):
    """Path a-b-c-d plus isolated e: hops are exact, unreachable nodes
    absent, max_hops truncates."""
    from speech_data_pipeline_spark.operators.graph import bfs_hops

    e0 = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("e", "e2")],
        "src string, dst string",
    )
    edges = e0.unionByName(
        e0.selectExpr("dst as src", "src as dst")
    )
    got = {r["node"]: r["hop"] for r in bfs_hops(edges, "a", max_hops=4).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}
    trunc = {
        r["node"]: r["hop"] for r in bfs_hops(edges, "a", max_hops=2).collect()
    }
    assert trunc == {"a": 0, "b": 1, "c": 2}


def test_label_propagation_separates_cliques(spark):
    """Two 5-cliques joined by one bridge edge: after 3 rounds each
    clique converges to its own min-id label; the bridge does not
    merge them."""
    from speech_data_pipeline_spark.operators.graph import label_propagation

    c1 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    c2 = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    edges = spark.createDataFrame(c1 + c2 + [(4, 10)], "u long, v long")
    out = {r["node"]: r["lab"] for r in label_propagation(edges, iters=3).collect()}
    assert set(out) == set(range(5)) | set(range(10, 15))
    assert len({out[i] for i in range(5)}) == 1
    assert len({out[i] for i in range(10, 15)}) == 1
    assert out[0] != out[10]


def test_label_propagation_matches_python_replay(spark):
    """Exact 3-round synchronous replay on a small random graph."""
    import random
    from collections import Counter

    from speech_data_pipeline_spark.operators.graph import label_propagation

    rng = random.Random(7)
    raw = {(rng.randrange(30), rng.randrange(30)) for _ in range(60)}
    ed = [(u, v) for u, v in raw if u != v]
    edges = spark.createDataFrame(ed, "u long, v long")
    adj = {}
    for u, v in ed:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    lab = {n: n for n in adj}
    for _ in range(3):
        nxt = {}
        for n, nbrs in adj.items():
            cnt = Counter(lab[m] for m in nbrs)
            nxt[n] = min(cnt, key=lambda l: (-cnt[l], l))
        lab = nxt
    got = {r["node"]: r["lab"] for r in label_propagation(edges, iters=3).collect()}
    assert got == lab


class TestKCore:
    def test_kcore_hand_graph(self, spark):
        from speech_data_pipeline_spark.operators.graph import k_core

        # Triangle {1,2,3} each also tied to 4; plus a tail 5-6-7.
        # 2-core = {1,2,3,4}? deg(4)=3, triangle degs=3; tail peels off.
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (1, 4), (2, 4), (3, 4), (4, 5),
             (5, 6), (6, 7)],
            "u long, v long",
        )
        out = {r["node"]: r["deg"] for r in k_core(edges, k=3, rounds=4).collect()}
        assert set(out) == {1, 2, 3, 4}
        assert all(d >= 3 for d in out.values())

    def test_kcore_fixpoint_on_fixture(self, spark):
        # One extra peel round must not change the registered query's
        # survivor set — the fixed-round contract has converged.
        from speech_data_pipeline_spark.operators.graph import k_core
        from pyspark.sql import functions as F
        from speech_data_pipeline_spark.sources.catalog import load_table

        li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
        op = li.select(
            F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
        ).distinct()
        edges = (
            op.select("o", F.col("p").alias("u"))
            .join(op.select("o", F.col("p").alias("v")), "o")
            .where(F.col("u") < F.col("v"))
            .select("u", "v")
            .distinct()
        )
        r4 = sorted(
            (r["node"], r["deg"]) for r in k_core(edges, 3, 4).collect()
        )
        r5 = sorted(
            (r["node"], r["deg"]) for r in k_core(edges, 3, 5).collect()
        )
        assert r4 == r5


class TestBellmanFordSssp:
    def test_picks_cheaper_multihop_path(self, spark):
        from speech_data_pipeline_spark.operators.graph import (
            bellman_ford_sssp,
        )

        # a->d direct costs 10; a->b->c->d costs 3. 4 rounds must find 3.
        edges = spark.createDataFrame(
            [
                ("a", "d", 10),
                ("a", "b", 1),
                ("b", "c", 1),
                ("c", "d", 1),
                ("d", "e", 1),
                ("x", "y", 1),  # unreachable component
            ],
            "src string, dst string, w long",
        )
        got = {
            r["node"]: r["dist"]
            for r in bellman_ford_sssp(edges, "a", rounds=4).collect()
        }
        assert got == {"a": 0, "b": 1, "c": 2, "d": 3, "e": 4}

    def test_round_bound_limits_path_length(self, spark):
        from speech_data_pipeline_spark.operators.graph import (
            bellman_ford_sssp,
        )

        edges = spark.createDataFrame(
            [("n%d" % i, "n%d" % (i + 1), 1) for i in range(6)],
            "src string, dst string, w long",
        )
        got2 = {
            r["node"]: r["dist"]
            for r in bellman_ford_sssp(edges, "n0", rounds=2).collect()
        }
        assert got2 == {"n0": 0, "n1": 1, "n2": 2}

    def test_matches_dijkstra_on_fixture_graph(self, spark):
        import heapq
        from collections import defaultdict

        from speech_data_pipeline_spark.queries.registry import QUERIES
        from speech_data_pipeline_spark.sources.catalog import load_table

        sf = "/root/testdata/sf0.001"
        got = {
            r["node"]: r["dist"]
            for r in QUERIES["graph_sssp_bellman"](spark, sf).collect()
        }
        cnt = defaultdict(int)
        for r in load_table(spark, sf, "events").collect():
            cnt[(r["user_id"], r["event_type"])] += 1
        adj = defaultdict(list)
        for (u, t), c in cnt.items():
            w = 1 + 100 // c
            a, b = f"u:{u}", f"t:{t}"
            adj[a].append((b, w))
            adj[b].append((a, w))
        # Dijkstra with a <=4-edge hop bound == 4-round Bellman-Ford
        best = {("t:purchase", 0): 0}
        dist4 = {}
        pq = [(0, "t:purchase", 0)]
        while pq:
            d, n, h = heapq.heappop(pq)
            if d > best.get((n, h), 1 << 60):
                continue
            dist4[n] = min(dist4.get(n, 1 << 60), d)
            if h == 4:
                continue
            for m, w in adj[n]:
                nd = d + w
                if nd < best.get((m, h + 1), 1 << 60):
                    best[(m, h + 1)] = nd
                    heapq.heappush(pq, (nd, m, h + 1))
        assert got == dist4


class TestHits:
    def _replay(self, edges, iters=3):
        """Independent integer HITS replay: max-DIV renormalization."""
        FP = 1 << 20
        srcs = sorted({s for s, _, _ in edges})
        dsts = sorted({d for _, d, _ in edges})
        hub = {s: FP for s in srcs}
        auth = {}
        for _ in range(iters):
            raw = {d: 0 for d in dsts}
            for s, d, w in edges:
                raw[d] += hub[s] * w
            sc = max(raw.values()) // FP + 1
            auth = {d: r // sc for d, r in raw.items()}
            raw = {s: 0 for s in srcs}
            for s, d, w in edges:
                raw[s] += auth[d] * w
            sc = max(raw.values()) // FP + 1
            hub = {s: r // sc for s, r in raw.items()}
        return hub, auth

    def test_matches_replay_and_ranks_dense_hub_first(self, spark):
        from speech_data_pipeline_spark.operators.graph import hits_scores

        # u1 points at both popular authorities, u2/u3 at one each,
        # u4 only at a fringe authority (weight kept low: WEIGHTED
        # HITS legitimately amplifies a heavy isolated edge ~w² per
        # round, so a w=9 self-reinforcing pair would out-rank the
        # dual-cite hub — that's the model, not a bug).
        edges = [
            ("u1", "x", 5), ("u1", "y", 5),
            ("u2", "x", 3), ("u3", "y", 3),
            ("u4", "z", 1),
        ]
        df = spark.createDataFrame(edges, "src string, dst string, w long")
        hubs, auths = hits_scores(df, iters=3)
        got_h = {r.node: r.hub_fp for r in hubs.collect()}
        got_a = {r.node: r.auth_fp for r in auths.collect()}
        want_h, want_a = self._replay(edges)
        assert got_h == want_h
        assert got_a == want_a
        assert got_h["u1"] == max(got_h.values())  # the dual-cite hub
        # z's only citer is a hub with no reinforcement: low authority
        assert got_a["z"] < got_a["x"] and got_a["z"] < got_a["y"]

    def test_weight_scaling_invariance_of_ranking(self, spark):
        from speech_data_pipeline_spark.operators.graph import hits_scores

        edges = [("a", "p", 1), ("a", "q", 2), ("b", "q", 4), ("c", "r", 1)]
        big = [(s, d, w * 1000) for s, d, w in edges]
        df1 = spark.createDataFrame(edges, "src string, dst string, w long")
        df2 = spark.createDataFrame(big, "src string, dst string, w long")
        # ranking (not raw values) is preserved under uniform weight scaling
        h1 = {r.node: r.hub_fp for r in hits_scores(df1, 2)[0].collect()}
        h2 = {r.node: r.hub_fp for r in hits_scores(df2, 2)[0].collect()}
        assert sorted(h1, key=h1.get) == sorted(h2, key=h2.get)
