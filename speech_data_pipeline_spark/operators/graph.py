"""Distributed connected components — the dedup *resolution* step.

Near-dup operators (``dedup.py``, ``similarity.py``) emit PAIRS; an
actual deduplication decision needs the transitive closure of those
pairs: duplicate clusters, one canonical survivor per cluster. On a
pair list with chains (A~B, B~C but not A~C — routine for MinHash
near-dups) per-pair resolution under-deletes, so this is a required
component of a training-data pipeline, not a nicety.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", ACM SoCC'14) — the
published MapReduce-native CC algorithm. Each half-round is one window
aggregation + projection (one shuffle); convergence is
O(log² n) rounds *worst case* (a path graph), and 1–2 rounds for the
near-clique clusters dedup actually produces. Versus naive label
propagation (O(diameter) rounds), this is the variant that survives a
pathological chain at 100 TB.

Spark-specific mechanics:

- neighborhood minima via ``min().over(Window.partitionBy(u))`` —
  never ``collect_list`` (a celebrity node's neighbor list must not
  have to fit in one task's memory);
- per-iteration ``localCheckpoint`` truncates lineage —
  without it the plan doubles every round and the driver dies at
  ~iteration 15 planning, long before any executor does work (on a
  real cluster use ``spark.sparkContext.setCheckpointDir`` + durable
  ``checkpoint()`` for fault tolerance; localCheckpoint trades
  executor-loss recovery for zero-setup, the right default in
  local mode). Note the per-round ``unpersist()`` releases only the
  cache-manager entry; the checkpoint RDD blocks themselves are
  reclaimed by the ContextCleaner once the superseded DataFrame is
  unreferenced — rounds are few (O(log n)), so peak block residency
  is a small constant multiple of the contracted edge set;
- convergence test = count + order-insensitive xxhash64 checksum of
  the canonicalized edge set — one tiny job per round, no driver-side
  edge materialization.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _node_state(df: DataFrame) -> DataFrame:
    """Broadcast-hint a NODE-sized iteration-state table (labels,
    frontiers, distance/rank vectors, peel sets).

    Every iterative operator here joins an O(nodes) state table onto
    the O(edges) edge table once per round; without the hint the
    planner (whose size estimates are garbage after a few joins)
    shuffles the edge table every round. Broadcasting the state makes
    the edge side exchange-free per round — the per-round shuffle
    drops from edge-sized to zero (guide §3.1: broadcast the side you
    KNOW is small; §2.4: remove shuffles outright).

    Scale: state is node-sized, not corpus-sized, but node counts can
    still outgrow a broadcast on billion-node graphs —
    ``SPARK_GRAFT_BCAST_NODE_STATE=0`` reverts every such join to the
    shuffle plan (strategy only; values are identical either way).
    """
    if os.environ.get("SPARK_GRAFT_BCAST_NODE_STATE", "1") == "0":
        return df
    return F.broadcast(df)


def _canon(edges: DataFrame) -> DataFrame:
    """Canonical undirected form: (u > v), no self-loops, distinct."""
    return (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(Γ(u) ∪ {u})."""
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = F.least(F.min("v").over(Window.partitionBy("u")), F.col("u"))
    return (
        sym.withColumn("m", m)
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges to the smaller endpoint; connect each smaller
    neighbor of u — and u itself — to min(Γ⁻(u) ∪ {u})."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    m = F.min("v").over(Window.partitionBy("u"))
    return (
        oriented.withColumn("m", m)
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("v").alias("a"), F.col("m").alias("b")),
                    F.struct(F.col("u").alias("a"), F.col("m").alias("b")),
                )
            ).alias("e")
        )
        .select(F.col("e.a").alias("u"), F.col("e.b").alias("v"))
    )


def _contract_partitions(
    edges: DataFrame,
    target_edges_per_part: int = 5_000_000,
    n_edges: int | None = None,
) -> DataFrame:
    """One-pass per-partition union-find contraction.

    Rewrites each partition's edge set to stars ``(member,
    partition-local min root)`` — same transitive closure (every
    original edge (u, v) in a partition becomes u—root and v—root, so
    connectivity is preserved within and across partitions) but all
    *locally visible* structure is collapsed before the global
    alternating-star rounds ever run. This is the standard local-
    contraction prelude to MapReduce CC: the loop then only has to
    merge cross-partition components, which cuts global rounds and
    shuffle volume by the local clustering factor. Memory per task is
    one dict entry per distinct node in that partition — bounded by
    the adaptive repartition below (~``target_edges_per_part`` edges
    per task), not by component size.
    """
    import math

    n = edges.count() if n_edges is None else n_edges
    parts = max(1, math.ceil(n / target_edges_per_part))
    # repartition in BOTH directions: fewer partitions than the target
    # means each task would union-find MORE than target_edges_per_part
    # edges (unbounded per-task dict — the exact OOM this pass exists
    # to prevent), not just more tasks than needed.
    if parts != edges.rdd.getNumPartitions():
        edges = edges.repartition(parts)

    schema = edges.schema

    def contract(batches):
        import pandas as pd

        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for pdf in batches:
            for u, v in zip(pdf["u"], pdf["v"]):
                parent.setdefault(u, u)
                parent.setdefault(v, v)
                ru, rv = find(u), find(v)
                if ru == rv:
                    continue
                if rv < ru:
                    ru, rv = rv, ru
                parent[rv] = ru  # root stays the component-local min

        out_u, out_v = [], []
        for x in list(parent):
            r = find(x)
            if r != x:
                out_u.append(x)
                out_v.append(r)
        yield pd.DataFrame({"u": out_u, "v": out_v})

    return edges.mapInPandas(contract, schema=schema)


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    # decimal(38,0) accumulator: summing 64-bit hashes in a long trips
    # ANSI overflow; decimal sum is exact and order-insensitive
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).first()
    return int(row.n), int(row.h)


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    target_edges_per_part: int = 5_000_000,
) -> DataFrame:
    """Resolve an undirected pair list into components.

    Returns ``(id, component)`` for every id appearing in any pair,
    where ``component`` is the minimum id of the node's component —
    the conventional canonical-survivor key. Isolated nodes (no pairs)
    don't appear; union the vertex table with ``coalesce`` downstream
    if singletons need rows.
    """
    # eager=False: the count/fingerprint aggregation right below
    # materializes the checkpoint, so each round costs ONE job
    raw = _canon(
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    ).localCheckpoint(eager=False)
    n_edges = raw.count()
    target = target_edges_per_part
    if n_edges <= target:
        # The whole edge set fits ONE contraction task: the local
        # union-find IS the exact transitive closure (its output is
        # already stars to the component-min root), so the alternating-
        # star loop and its per-round fingerprint jobs are pure
        # overhead — skip straight to the star->component projection.
        # At cluster scale (n_edges > target) this branch never fires.
        edges = _canon(
            _contract_partitions(raw, target, n_edges=n_edges)
        ).localCheckpoint(eager=False)
        raw.unpersist()
        return (
            edges.select(F.col("u").alias("id"), F.col("v").alias("component"))
            .unionByName(
                edges.select(
                    F.col("v").alias("id"), F.col("v").alias("component")
                )
            )
            .distinct()
        )
    # Local union-find contraction first: the star loop then only
    # merges cross-partition structure (a handful of rounds at cluster
    # scale, since all locally-visible structure is pre-collapsed).
    edges = _canon(
        _contract_partitions(raw, target, n_edges=n_edges)
    ).localCheckpoint(eager=False)
    fp = _fingerprint(edges)
    raw.unpersist()
    for _ in range(max_iter):
        # two alternations per materialization: halves the number of
        # checkpoint + convergence-check jobs (the dominant cost locally
        # — per-round stage overhead, not data volume) at the price of a
        # 2-round lineage, which stays trivially short
        once = _canon(_small_star(_large_star(edges)))
        stepped = _canon(_small_star(_large_star(once))).localCheckpoint(
            eager=False
        )
        new_fp = _fingerprint(stepped)
        edges, prev = stepped, edges
        prev.unpersist()
        if new_fp == fp:
            break
        fp = new_fp
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    # Fixpoint of small-star = stars: every edge is (member, root).
    return (
        edges.select(F.col("u").alias("id"), F.col("v").alias("component"))
        .unionByName(
            edges.select(
                F.col("v").alias("id"), F.col("v").alias("component")
            )
        )
        .distinct()
    )


def resolve_duplicates(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Tag every row of ``df`` with its duplicate-cluster resolution.

    Adds ``component`` (cluster key: min id of the near-dup cluster,
    the row's own id when unpaired), ``is_canonical`` (the one row per
    cluster a dedup keeps), and ``n_members``. One broadcast-friendly
    left join (components ≤ pairs ≪ corpus) + one window count.
    """
    comp = connected_components(pairs, src, dst)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("n_members"))
    out = (
        df.join(comp, df[id_col] == comp["id"], "left")
        .drop(comp["id"])  # by reference: df may carry its own "id" column
        .withColumn("component", F.coalesce("component", F.col(id_col)))
        .join(sizes, "component", "left")
        .withColumn("n_members", F.coalesce("n_members", F.lit(1)))
        .withColumn("is_canonical", F.col(id_col) == F.col("component"))
    )
    return out


#: Fixed-point scale for pagerank ranks (2^30 ≈ 1.0).
PR_FP = 1 << 30


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
) -> DataFrame:
    """Weighted PageRank with EXACT integer (fixed-point) arithmetic —
    the third iterative-algorithm pattern here (beside connected
    components and Lloyd k-means), used in corpus curation as a
    centrality / density signal (rank web hosts, rank near-duplicate
    cluster members, pick diverse representatives).

    Every quantity is a BIGINT: ranks start at ``PR_FP`` (=1.0); an
    edge passes ``floor(rank * w / outdeg)``; a node's next rank is
    ``(15 * PR_FP) div 100 + (85 * inflow) div 100``. No float ever
    appears, so partial-sum order, engine, and partitioning cannot
    change a single bit — the DuckDB oracle replays the trajectory as
    chained CTEs on the same integers.

    Per iteration: one join (ranks onto edges, shuffle on src) + one
    grouped sum (shuffle on dst) — the canonical distributed pagerank
    step; the rank table is nodes-sized, never corpus-sized. Dangling
    nodes (no out-edges) keep contributing nothing; nodes with no
    in-edges settle at the teleport mass, matching the textbook
    non-normalized formulation.

    Returns ``(node, rank_fp)``; ``rank_fp / PR_FP`` is the rank.
    """
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(w_col).cast("long").alias("w"),
    ).where(F.col("w") > 0)  # w=0 edges carry no rank and would make a
    # zero outdeg divide (DIVIDE_BY_ZERO under ANSI); dropping them is
    # the dangling-node semantics the docstring already promises
    outdeg = e.groupBy("src").agg(F.sum("w").alias("outdeg"))
    # Left lazily chained on purpose (round-11 A/B): per-round
    # broadcasts of the rank table were tried and consistently LOST
    # 0.5-1s at sf0.1 on the textrank word graph — six sequential
    # broadcast-build jobs replace pipelined shuffle stages — and
    # persisting e/nodes cost another 0.4s of pure cache-write
    # overhead (exchange reuse already dedupes the shared subtrees in
    # the unrolled single plan).
    e = e.join(outdeg, "src")
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    ranks = nodes.select("node", F.lit(PR_FP).cast("long").alias("rank_fp"))
    teleport = (100 - damping_pct) * PR_FP // 100
    for _ in range(iters):
        inflow = (
            e.join(ranks, e["src"] == ranks["node"])
            .select(
                "dst",
                F.expr("rank_fp * w div outdeg").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(inflow, nodes["node"] == inflow["dst"], "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(f"({damping_pct} * coalesce(s, 0)) div 100")
                ).cast("long").alias("rank_fp"),
            )
        )
    return ranks


def triangle_count(edges: DataFrame, a: str = "u", b: str = "v") -> DataFrame:
    """Global triangle count by degree orientation ("compact-forward").

    Orient every undirected edge from its lower-(degree, id) endpoint
    to the higher one; then each triangle is counted EXACTLY once as a
    wedge (u→v, u→w with k(v) < k(w)) closed by the oriented edge
    v→w. The orientation is the whole scale story: out-degree under it
    is O(√m), so the wedge self-join — the only super-linear step —
    generates Σ outdeg² = O(m^1.5) candidates worst-case instead of
    Σ deg² (unbounded under hub skew). All three steps are plain
    equi-joins + one aggregate; AQE can split any residual hot key.

    Input: undirected edge list, one row per edge, ``a < b`` not
    required (duplicates/self-loops must already be removed).
    Output: one row ``(n_vertices, n_edges, n_triangles)``.
    """
    e, deg, tri = _oriented_triangles(edges, a, b)
    return (
        tri.agg(F.count(F.lit(1)).alias("n_triangles"))
        .crossJoin(F.broadcast(deg.agg(F.count(F.lit(1)).alias("n_vertices"))))
        .crossJoin(F.broadcast(e.agg(F.count(F.lit(1)).alias("n_edges"))))
        .select("n_vertices", "n_edges", "n_triangles")
    )


def _oriented_triangles(edges: DataFrame, a: str = "u", b: str = "v"):
    """Shared degree-oriented triangle enumeration: returns
    ``(e, deg, tri)`` where ``tri`` carries each triangle EXACTLY once
    as ``(su, v1, v2)`` — its three corners. See
    :func:`triangle_count` for the O(m^1.5) orientation argument."""
    # `e` feeds four branches (degree table, the two orientation joins,
    # n_edges) and `oe` two (the out-adjacency collect + closing join);
    # without persistence the upstream edge construction re-evaluates
    # once per branch — measured 9.0s -> 2.3s at sf0.1 on the
    # co-purchase graph, and the same multiplier applies on a cluster.
    e = edges.select(F.col(a).alias("x"), F.col(b).alias("y")).persist()
    deg = (
        e.select(F.col("x").alias("n"))
        .unionAll(e.select(F.col("y").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
        .persist()
    )
    with_deg = (
        e.join(
            _node_state(
                deg.withColumnRenamed("n", "x").withColumnRenamed("d", "dx")
            ),
            "x",
        )
        .join(
            _node_state(
                deg.withColumnRenamed("n", "y").withColumnRenamed("d", "dy")
            ),
            "y",
        )
    )
    lower_first = (F.col("dx") < F.col("dy")) | (
        (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))
    )
    # Hash-partition the oriented edge table by wedge pivot ONCE (round
    # 11, guide §2.4): the wedge self-join below is then co-partitioned
    # (zero exchange on either branch) — previously each branch
    # re-shuffled the cached table by su.
    oe = with_deg.select(
        F.when(lower_first, F.col("x")).otherwise(F.col("y")).alias("su"),
        F.when(lower_first, F.col("y")).otherwise(F.col("x")).alias("sv"),
        F.when(lower_first, F.col("dy")).otherwise(F.col("dx")).alias("dv"),
    ).repartition("su").persist()
    l = oe.select(
        F.col("su"), F.col("sv").alias("v1"), F.col("dv").alias("d1")
    )
    r = oe.select(
        F.col("su"), F.col("sv").alias("v2"), F.col("dv").alias("d2")
    )
    wedges = l.join(r.hint("shuffle_hash"), "su").where(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2")))
    )
    # Closing join: the wedge side is the Σ outdeg² candidate stream
    # (41M rows at sf0.1, measured) — never sort it (guide §3.1;
    # round-10's shuffle_hash hint, 7.9s → 5.2s) and, when the edge
    # list is broadcastable, never SHUFFLE it either (round 11): with
    # the m-row edge side broadcast the 41M candidates stream map-side
    # straight into the count. m is known exactly (the table is
    # persisted; one cheap count materializes it for its 4 consumers),
    # so the choice is size-driven, not local-tuned:
    # SPARK_GRAFT_BCAST_EDGES_MAX rows (default 8M ≈ 130 MB hash
    # relation) — above it, the shuffled-hash plan stands. (An
    # array-collect wedge generation — one exchange instead of the
    # self-join — was ALSO tried and is 1.1-2x SLOWER here: the nested
    # transform/slice/struct lambdas are interpreted per element,
    # which loses at 41M wedges; it wins only on small wedge streams,
    # see graph_adamic_adar.)
    closing = oe.select(F.col("su").alias("v1"), F.col("sv").alias("v2"))
    bcast_max = int(os.environ.get("SPARK_GRAFT_BCAST_EDGES_MAX", "8000000"))
    if e.count() <= bcast_max:
        closing = F.broadcast(closing)
    else:
        closing = closing.hint("shuffle_hash")
    tri = wedges.join(closing, ["v1", "v2"]).select("su", "v1", "v2")
    return e, deg, tri


def clustering_coefficient(
    edges: DataFrame, a: str = "u", b: str = "v"
) -> DataFrame:
    """Per-node local clustering coefficient
    ``c(v) = 2·T(v) / (d(v)·(d(v)−1))`` — the density companion to
    the global :func:`triangle_count`: how close each node's
    neighborhood is to a clique (the community-structure signal
    corpus curation reads per entity rather than per graph).

    Same O(m^1.5) degree-oriented enumeration (shared
    :func:`_oriented_triangles`); per-triangle attribution is a
    3-row explode of the triangle's corners followed by one grouped
    count — triangles ≪ wedge candidates, so the explode adds only
    output-linear work. Nodes with degree < 2 report coefficient 0.

    Output: ``(node, d, n_tri, coeff)`` with ``coeff`` trunc6 of the
    exact integer ratio.
    """
    _, deg, tri = _oriented_triangles(edges, a, b)
    corners = (
        tri.select(F.explode(F.array("su", "v1", "v2")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_tri"))
    )
    from speech_data_pipeline_spark.functions import trunc6

    return (
        deg.withColumnRenamed("n", "node")
        .join(corners, "node", "left")
        .select(
            "node",
            F.col("d").cast("long").alias("d"),
            F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_tri"),
            F.when(F.col("d") < 2, F.lit(0.0))
            .otherwise(
                trunc6(
                    (F.lit(2.0) * F.coalesce("n_tri", F.lit(0)).cast("double"))
                    / (
                        F.col("d").cast("double")
                        * (F.col("d") - 1).cast("double")
                    )
                )
            )
            .alias("coeff"),
        )
    )


def bfs_hops(
    edges: DataFrame,
    source: str,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Breadth-first hop distances from ``source``: ``(node, hop)`` for
    every node reachable within ``max_hops``.

    The frontier-expansion pattern: each round joins the CURRENT
    frontier (not the whole visited set) onto the edge table — one
    shuffle on the edge key per round — then anti-joins the visited
    set to keep only newly discovered nodes. Frontier and visited are
    node-sized, never edge-sized; rounds are a driver-known constant,
    so the loop unrolls into a fixed plan the same way the PageRank
    and k-means iterations do (exactly replayable as chained CTEs —
    the oracle in queries/corpus_q.py is that replay).
    """
    # The edge table feeds every round's expansion join; persisting it
    # stops the whole upstream edge construction re-running once per
    # hop (round 11, guide §5) — and with the frontier/visited sides
    # broadcast (node-sized by construction, _node_state) the edge
    # table is never shuffled at all.
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).persist()
    spark = edges.sparkSession
    visited = spark.createDataFrame([(source, 0)], "node string, hop int").persist()
    frontier = visited.select("node")
    # No per-round emptiness probe: rounds are a fixed constant, an
    # exhausted frontier makes later rounds empty joins (near-free),
    # and probing would force one Spark job per round — lazily built,
    # the whole expansion is ONE job at materialization time. Persists
    # keep each level from recomputing where visited feeds both the
    # anti-join and the union.
    for k in range(1, max_hops + 1):
        nxt = (
            e.join(_node_state(frontier.withColumnRenamed("node", "_s")), "_s")
            .select(F.col("_d").alias("node"))
            .distinct()
            .join(_node_state(visited), "node", "left_anti")
            .withColumn("hop", F.lit(k))
            .persist()
        )
        visited = visited.unionByName(nxt).persist()
        frontier = nxt.select("node")
    return visited


def label_propagation(
    edges: DataFrame,
    iters: int = 3,
    a: str = "u",
    b: str = "v",
    edges_distinct: bool = False,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) for
    community detection, fully deterministic: labels start as node
    ids; each round every node adopts the most frequent label among
    its NEIGHBORS, ties to the smallest label — the argmax is
    ``min(struct(-count, label))`` so no ordering ever depends on
    shuffle layout. A fixed ``iters`` keeps the trajectory replayable
    as chained CTEs (the bit-replayable contract pagerank and k-means
    follow; open-ended convergence would need a driver loop like
    connected_components).

    Beside connected components (dedup resolution — min-label spread,
    finds CONNECTIVITY) this finds DENSITY: communities inside one
    component, the "which near-dup cluster is actually several topics"
    signal.

    Plan shape per round: one (edge ⋈ labels) hash join on the dst key
    + one (node, label) grouped count + one per-node grouped argmin —
    all map-side combinable, state is the n-node label table,
    persisted between rounds (lazy chaining across iterations
    re-evaluates exponentially). Output: (node, label) after
    ``iters`` rounds.
    """
    und = edges.select(F.col(a).alias("src"), F.col(b).alias("dst")).unionByName(
        edges.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    )
    if not edges_distinct:
        # callers providing a DISTINCT u<v self-loop-free edge list skip
        # this shuffle: the reversed copies are disjoint by construction
        # (the k_core `edges_distinct_directed` contract)
        und = und.distinct()
    if iters <= 0:
        # no iteration ever consumes `und` twice here, so persisting it
        # would leak a cache entry pinned by the returned lineage
        nodes = und.select(F.col("src").alias("node")).distinct()
        return nodes.select("node", F.col("node").alias("lab"))
    # The edge table feeds EVERY round's join; without persistence each
    # round re-runs the whole upstream edge construction — at sf0.1 on
    # the co-purchase graph that alone was ~2s × iters of the measured
    # 10s (round-10 profile). One materialization, iters consumers.
    # Hash-partitioned by src (round 11, guide §2.4): the per-round
    # label join broadcasts the node-sized label table (no edge
    # shuffle), and both grouped aggregates cluster on src — hash(src)
    # satisfies (src) and (src, nlab) alike — so every LPA round runs
    # with ZERO exchanges after this one.
    und = und.repartition("src").persist()
    # Round 1 on the identity labeling needs no join and only ONE
    # aggregate: every neighbor label equals the neighbor id and `und`
    # is a set, so each (node, label) count is exactly 1 and the
    # (count desc, label asc) argmax degenerates to min(neighbor) —
    # the identical l1 the generic round computes from l0 = identity
    # (and what the oracle's chained c1/l1 CTEs replay).
    labels = und.groupBy(F.col("src").alias("node")).agg(
        F.min("dst").alias("lab")
    )
    # No per-round persist/count: each round's label table is consumed
    # exactly once (the next round's broadcast build), so the chain is
    # linear — the eager per-round materialization was one Spark job
    # per round of pure overhead (round 11, guide §1.2).
    for _ in range(iters - 1):
        labels = (
            und.join(
                _node_state(
                    labels.select(
                        F.col("node").alias("dst"), F.col("lab").alias("nlab")
                    )
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("node"), F.col("nlab"))
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("node")
            .agg(
                F.min(F.struct((-F.col("c")).alias("nc"), F.col("nlab").alias("l")))[
                    "l"
                ].alias("lab")
            )
        )
    return labels


def k_core(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 4,
    a: str = "u",
    b: str = "v",
    edges_distinct_directed: bool = False,
) -> DataFrame:
    """Fixed-round k-core peeling (Seidman 1983 cores; the synchronous
    peel of Batagelj–Zaveršnik done data-parallel): each round drops
    every node whose CURRENT degree is below ``k`` and the edges
    touching it, simultaneously for all nodes. A fixed ``rounds`` keeps
    the trajectory replayable as chained CTEs (the pagerank / LPA /
    k-means contract); each round can only shrink the edge set, so the
    sequence converges monotonically to the true k-core and on
    moderate-diameter graphs a handful of rounds IS the fixpoint
    (tests assert stability on the fixture graph).

    Plan shape per round: one grouped degree count + two semi-join
    filters of the edge table against the surviving-node set — all
    key-partitioned hash joins, no windows, state persisted between
    rounds (lazy chaining across iterations re-evaluates
    exponentially). A round that peels nothing is the fixpoint — every
    later synchronous round is the identity, so the loop exits early
    with output identical to the full fixed-``rounds`` trajectory.

    ``edges_distinct_directed=True`` skips the union-dedup and
    REQUIRES the input to be canonical single-orientation
    (``u < v``-style), self-loop-free, duplicate-free edges — both
    orientations or a self-loop would double-count degrees and return
    a silently wrong core. Output: ``(node, deg)`` — survivors with
    their post-peel degree.
    """
    und = edges.select(
        F.col(a).alias("src"), F.col(b).alias("dst")
    ).unionByName(
        edges.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    )
    if not edges_distinct_directed:
        # callers providing a DISTINCT u<v edge list skip this: the
        # reversed copies are disjoint by construction
        und = und.distinct()
    # Hash-partition the edge table by src ONCE (round 11, guide §2.4):
    # every round's degree count then needs no exchange (hash(src)
    # satisfies the grouping), and the broadcast anti-joins below
    # preserve the partitioning, so the per-round persist keeps it —
    # the peel loop runs with ZERO edge-sized shuffles after this one.
    und = und.repartition("src").persist()
    n_edges = und.count()
    for _ in range(rounds):
        # Peel by ANTI-joining the DEAD set instead of semi-joining the
        # survivor set (round 11, guide §3.1): both orientations of
        # every edge appear in `und`, so each dst also occurs as a src
        # and alive/dead partition the node set — left_anti(dead) ≡
        # left_semi(alive). The dead set is the handful of nodes a
        # round peels (node-bounded, usually tiny), so it broadcasts
        # where the survivor set (≈ all nodes) could not.
        dead = (
            und.groupBy("src")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") < k)
            .select("src")
        )
        nxt = (
            und.join(_node_state(dead), "src", "left_anti")
            .join(
                _node_state(dead.select(F.col("src").alias("dst"))),
                "dst",
                "left_anti",
            )
            .persist()
        )
        n_nxt = nxt.count()
        und.unpersist()
        und = nxt
        if n_nxt == n_edges:
            # fixpoint: no edge (hence no node) was peeled, so every
            # remaining synchronous round is the identity — the output
            # equals the fixed-`rounds` trajectory the oracle replays
            break
        n_edges = n_nxt
    out = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    return out


def bellman_ford_sssp(
    edges: DataFrame,
    source: str,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
    w: str = "w",
) -> DataFrame:
    """Fixed-round Bellman–Ford single-source shortest paths over
    INTEGER edge weights: after ``rounds`` synchronous relaxations,
    ``(node, dist)`` holds the exact shortest distance among paths of
    ≤ ``rounds`` edges (the full algorithm's k-th round invariant —
    monotone-converging to true SSSP, like the k-core peel and BFS
    contracts).

    Per round: ONE key-partitioned join of the node-sized distance
    table onto the edge table + one grouped min — the synchronous
    Pregel relaxation. Rounds are a driver-known constant so the loop
    unrolls into a fixed plan, exactly replayable as chained CTEs
    (the oracle). Integer weights → integer distances; nothing float
    crosses a shuffle.
    """
    e = edges.select(
        F.col(src).alias("_s"), F.col(dst).alias("_d"), F.col(w).alias("_w")
    )
    spark = edges.sparkSession
    node_type = dict(edges.dtypes)[src]
    dist = spark.createDataFrame(
        [(source, 0)], f"node {node_type}, dist long"
    ).persist()
    for _ in range(rounds):
        relaxed = (
            e.join(dist.withColumnRenamed("node", "_s"), "_s")
            .select(
                F.col("_d").alias("node"),
                (F.col("dist") + F.col("_w")).alias("dist"),
            )
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .persist()
        )
    return dist


#: Fixed-point scale for HITS hub/authority scores (2^20 ≈ 1.0).
HITS_FP = 1 << 20


def hits_scores(
    edges: DataFrame,
    iters: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
):
    """HITS hubs & authorities (Kleinberg 1999) with EXACT integer
    arithmetic — the mutual-reinforcement companion to
    :func:`pagerank_fixed_point` (a node is a good hub if it points at
    good authorities, a good authority if pointed at by good hubs).

    Classic HITS renormalizes by the L2 norm — a float sqrt that no
    two engines round identically. This variant renormalizes by an
    integer DIV instead: after each half-step the raw scores are
    divided by ``scale = max(raw) div FP + 1``, which (a) keeps every
    score in ``[0, ~FP]`` so the next weighted sum cannot overflow
    BIGINT at any corpus size, and (b) is a pure integer function of
    the scores, so the whole trajectory is bit-replayable as chained
    CTEs. Power iteration converges to the same principal direction
    under ANY per-round positive rescaling, so ranking semantics are
    the textbook ones.

    Per half-round: one node-sized join onto the edge table + one
    grouped sum (the same shuffle pair as pagerank) + a 1-row max
    broadcast. The score tables are node-sized, never corpus-sized.

    Returns ``(hubs, auths)``: ``(node, hub_fp)`` over source nodes
    and ``(node, auth_fp)`` over destination nodes; ``/ HITS_FP`` ≈
    the max-normalized score.
    """
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(w_col).cast("long").alias("w"),
    ).where(F.col("w") > 0)
    srcs = e.select(F.col("src").alias("node")).distinct()
    dsts = e.select(F.col("dst").alias("node")).distinct()
    hubs = srcs.select("node", F.lit(HITS_FP).cast("long").alias("hub_fp"))
    auths = None
    for _ in range(iters):
        a_raw = (
            e.join(hubs, e["src"] == hubs["node"])
            .select("dst", F.expr("hub_fp * w").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("raw"))
        )
        a_scale = a_raw.agg(
            F.expr(f"max(raw) div {HITS_FP} + 1").alias("s")
        )
        auths = (
            a_raw.crossJoin(F.broadcast(a_scale))
            .select(
                F.col("dst").alias("node"),
                F.expr("raw div s").alias("auth_fp"),
            )
        )
        h_raw = (
            e.join(auths, e["dst"] == auths["node"])
            .select("src", F.expr("auth_fp * w").alias("c"))
            .groupBy("src")
            .agg(F.sum("c").alias("raw"))
        )
        h_scale = h_raw.agg(
            F.expr(f"max(raw) div {HITS_FP} + 1").alias("s")
        )
        hubs = (
            h_raw.crossJoin(F.broadcast(h_scale))
            .select(
                F.col("src").alias("node"),
                F.expr("raw div s").alias("hub_fp"),
            )
            .localCheckpoint(eager=True)
        )
    # sources that every round left unreached (no out-edge after w>0
    # filtering cannot happen — srcs come from e — but a source whose
    # every authority scored 0 keeps hub_fp 0 via the join above)
    hubs = srcs.join(hubs, "node", "left").select(
        "node", F.coalesce("hub_fp", F.lit(0)).cast("long").alias("hub_fp")
    )
    auths = dsts.join(auths, "node", "left").select(
        "node",
        F.coalesce("auth_fp", F.lit(0)).cast("long").alias("auth_fp"),
    )
    return hubs, auths
