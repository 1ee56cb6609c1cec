"""Similarity search over embedding columns (``array<float>``).

Three tiers:

- **Brute-force cosine top-k** (`cosine_topk`): exact, one scan, the
  dot product as a higher-order-function fold (JVM-side, no Python).
  At 100 TB this is the per-partition rerank primitive, not the global
  search — but it is exact and is the correctness baseline.

- **LSH-bucketed ANN** (`rp_lsh_bucket`, `lsh_topk`): random-hyperplane
  (signed random projection) bucketing. Hyperplanes are generated from
  a fixed seed and inlined as literals, so bucketing is deterministic
  and reproducible across engines. Search cost = one equi-join on the
  bucket key + rerank within bucket; `probe_buckets` adds classic
  multi-probe (lowest-flip-cost neighbor buckets) for recall.

- **IVF ANN** (`ivf_topk`): inverted-file coarse quantizer — centroid
  cells from an exact-integer-grid mean, argmin assignment, nprobe
  nearest cells probed, exact rerank inside. The assignment table is
  the write-once index; a query scans nprobe/n_cells of the data.

The reference's embedding analytics (ECAPA vectors, SURVEY.md M4/M5)
use the same column contract: ``(id, embedding array<float>)``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from speech_data_pipeline_spark.functions import trunc6


def dot(a: Column, b: Column) -> Column:
    """Σ a_i * b_i in double precision, left-to-right (deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.

    ``orderBy(desc(cos)).limit(k)`` compiles to TakeOrderedAndProject —
    a per-partition heap + driver merge of k rows, no full sort, no
    full shuffle. That plan shape is exactly what survives 1000
    executors.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(
            F.col(id_col),
            trunc6(cosine(F.col(vec_col), q)).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic Gaussian hyperplanes for signed random projection."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def rp_lsh_bucket(
    df: DataFrame,
    planes: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "bucket",
) -> DataFrame:
    """Attach the sign-bit bucket key from the given hyperplanes.

    Bucket = string of sign bits of ⟨v, plane_i⟩ — a plain column
    expression per plane; planes are literals baked into the plan, so
    the same rows land in the same buckets on any engine or cluster.
    """
    bits = [
        F.when(dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in p])) >= 0, "1")
        .otherwise("0")
        for p in planes
    ]
    return df.withColumn(out_col, F.concat(*bits))


def rp_lsh_bucket_capped(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    base_planes: int = 6,
    step: int = 5,
    levels: int = 3,
    cap: int = 1024,
    seed: int = 42,
    out_col: str = "bucket",
) -> DataFrame:
    """Population-CAPPED sign-bit bucketing: the scale-safe front end
    for every per-bucket quadratic kernel (:func:`knn_in_buckets`,
    :func:`hard_negatives_in_buckets`, :func:`embedding_neardup_pairs`).

    Fixed-plane bucketing has corpus-LINEAR bucket populations (2^p
    buckets regardless of n), so any O(bucket²) kernel goes quadratic
    with corpus growth — measured 11–12× wall-clock at 10× data for
    the mutual-kNN graph. This operator bounds every bucket:

    1. bucket rows by the first ``base_planes`` sign bits (identical
       geometry — and identical keys — to :func:`rp_lsh_bucket` when
       nothing escalates: ``hyperplanes(dim, total, seed)`` rows are a
       prefix-stable stream, so plane i is the same array for any
       total);
    2. ``levels`` rounds of ESCALATION: any bucket whose population
       exceeds ``cap`` extends its key with ``step`` more sign bits
       (children of one parent re-split; settled buckets never move —
       keys of different lengths cannot collide, and same-length keys
       from different parents differ in the prefix);
    3. a final deterministic SALT for unsplittable piles (duplicate /
       near-identical vectors that no hyperplane separates): a bucket
       still over ``cap`` splits into ``ceil(pop / cap)`` shards by
       ``id % n_shards``. This trades within-pile recall (a shard only
       sees its own members) for a kernel bound — exactly the
       clusters where neighbors are interchangeable anyway, and where
       near-dup consumers re-close transitively downstream. The bound
       is ``cap`` up to the mod-split imbalance: shard sizes are
       multinomial around ``pop/n_shards ≤ cap``, so realistic id sets
       land within a few percent of ``cap`` (sf1skew hot cluster:
       264 vs cap 256, +3%); an adversarial id set sharing a common
       factor with ``n_shards`` is the documented worst case (ids are
       corpus-assigned sequence numbers here, not user input).

    Cost shape at 100 TB: the vector table is NEVER shuffled here and
    is aggregated exactly ONCE — a map-side-combinable count by the
    FULL-depth bit prefix (the "leaf"; at most min(n, 2^total) short
    rows cross that shuffle), after which the whole escalation cascade
    runs as window sums over the tiny leaf-count table (a leaf's
    level-l bucket population = the sum of leaf counts sharing its
    level-l prefix — identical numbers to per-row counting, without
    touching the corpus again). The resulting leaf → (final prefix,
    n_shards) mapping broadcast-joins back in the same pass that
    computes the output column. The single real shuffle stays the
    caller's final ``groupBy(bucket)``; every kernel invocation is
    then O(cap²) flops/memory regardless of corpus size or skew.

    Determinism: counts are exact, escalation is a pure function of
    (planes, data, cap), the salt is ``id % ceil(pop/cap)`` — a DuckDB
    oracle replays the exact assignment with windowed counts (shared
    fragment ``_capped_bucket_ctes`` in queries/text_q.py).
    """
    from pyspark.sql import Window

    total = base_planes + step * levels
    planes = hyperplanes(dim, total, seed)
    b = rp_lsh_bucket(df, planes, vec_col, out_col="_bits")
    leaf = b.groupBy(F.col("_bits").alias("_leaf")).agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    cur = leaf.withColumn("_fp", F.substring("_leaf", 1, base_planes))
    for lvl in range(1, levels + 1):
        pop = F.sum("_cnt").over(Window.partitionBy("_fp"))
        cur = cur.withColumn(
            "_fp",
            F.when(
                pop > cap, F.substring("_leaf", 1, base_planes + step * lvl)
            ).otherwise(F.col("_fp")),
        )
    mapping = cur.withColumn(
        "_pop", F.sum("_cnt").over(Window.partitionBy("_fp"))
    ).select(
        "_leaf",
        "_fp",
        F.when(
            F.col("_pop") > cap,
            F.expr(f"(_pop + {cap} - 1) div {cap}"),
        ).alias("_nsh"),
    )
    return (
        b.join(F.broadcast(mapping), F.col("_bits") == F.col("_leaf"))
        .withColumn(
            out_col,
            F.when(
                F.col("_nsh").isNotNull(),
                F.concat(
                    F.col("_fp"),
                    F.lit("#"),
                    F.pmod(F.col(id_col), F.col("_nsh")).cast("string"),
                ),
            ).otherwise(F.col("_fp")),
        )
        .drop("_bits", "_leaf", "_fp", "_nsh")
    )


def probe_buckets(
    query_vec: list[float], planes: np.ndarray, n_probes: int
) -> list[str]:
    """Multi-probe sequence: buckets in increasing flip-cost order.

    Classic multi-probe LSH (Lv et al., VLDB'07): the query's own
    bucket first, then buckets reached by flipping the sign bits whose
    projection margin |⟨q, plane⟩| is smallest — those are the planes
    the query sits closest to, so their far side holds the likeliest
    missed neighbors. Candidates up to Hamming distance 2 are ranked by
    summed flipped margin; deterministic for a fixed seed/planes.
    """
    q = np.asarray(query_vec, dtype=np.float64)
    margins = planes @ q
    bits = ["1" if m >= 0 else "0" for m in margins]
    n = len(planes)
    cands: list[tuple[float, tuple[int, ...]]] = [(0.0, ())]
    cands += [(abs(float(margins[i])), (i,)) for i in range(n)]
    cands += [
        (abs(float(margins[i])) + abs(float(margins[j])), (i, j))
        for i in range(n)
        for j in range(i + 1, n)
    ]
    cands.sort(key=lambda t: (t[0], t[1]))
    out = []
    for _, flips in cands[: max(1, n_probes)]:
        b = list(bits)
        for i in flips:
            b[i] = "0" if b[i] == "1" else "1"
        out.append("".join(b))
    return out


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 4,
    seed: int = 42,
    n_probes: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: restrict to the query's probe buckets, exact rerank.

    Returns the same schema as :func:`cosine_topk` plus the bucket key.
    ``n_probes=1`` is the single-bucket search (recall < 1 by
    construction); larger values add the lowest-flip-cost neighbor
    buckets from :func:`probe_buckets`, trading scan fraction for
    recall without touching the stored bucketing. The probe set is an
    `IN` filter on the bucket key, so the scan prunes before any
    distance math runs.
    """
    planes = hyperplanes(len(query_vec), n_planes, seed)
    probes = probe_buckets(query_vec, planes, n_probes)
    bucketed = rp_lsh_bucket(df, planes, vec_col)
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        bucketed.where(F.col("bucket").isin(probes))
        .select(
            F.col(id_col),
            F.col("bucket"),
            trunc6(cosine(F.col(vec_col), qcol)).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def ann_batch_topk(
    df: DataFrame,
    query_vecs: list[list[float]],
    k: int = 5,
    n_planes: int = 6,
    seed: int = 42,
    n_probes: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batched ANN: top-k per query for a whole batch of query vectors.

    The realistic search shape — per-query ``limit(k)`` loops don't
    scale past a handful of queries. Each query's multi-probe bucket
    set becomes rows of a tiny ``(query_id, bucket, qv)`` table that is
    **broadcast-joined** against the bucketed corpus on the bucket key:
    one join replaces Q scans, the corpus is read once, and each
    partition only reranks rows whose bucket some query probes.
    Per-query top-k is a ``row_number`` window over ``query_id`` — Q
    bounded partitions, no global sort.

    At 100 TB the bucketed corpus is the write-once index partitioned
    by ``bucket``; this join prunes to the probed buckets via dynamic
    partition pruning, and a query batch of millions would swap the
    broadcast for a shuffled hash join on the same plan.
    """
    from pyspark.sql import Window

    if not query_vecs:
        raise ValueError("ann_batch_topk: empty query batch")
    planes = hyperplanes(len(query_vecs[0]), n_planes, seed)
    bucketed = rp_lsh_bucket(df, planes, vec_col)
    spark = df.sparkSession
    probe_rows = [
        (qid, bucket, [float(x) for x in qv])
        for qid, qv in enumerate(query_vecs)
        for bucket in probe_buckets(qv, planes, n_probes)
    ]
    probes = spark.createDataFrame(
        probe_rows, "query_id long, bucket string, qv array<double>"
    )
    scored = bucketed.join(F.broadcast(probes), "bucket").select(
        "query_id",
        F.col(id_col),
        trunc6(cosine(F.col(vec_col), F.col("qv"))).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("query_id", id_col, "cos_sim", "rnk")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    n_planes: int = 8,
    seed: int = 42,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    cap: int | None = None,
    step: int = 5,
    levels: int = 3,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH blocking.

    Bucketing stays JVM-side (:func:`rp_lsh_bucket`, deterministic
    seeded literals); the within-bucket quadratic rerank runs as a
    vectorized per-bucket ``applyInPandas`` kernel. One shuffle on the
    bucket key, no pair-row materialization — the n² pairs of a bucket
    exist only inside the kernel's NumPy arrays, and the threshold is
    applied in-kernel so no filter lands in a join condition. (A naive
    self-join + ``where(cos >= t)`` plans the full cosine INTO the join
    condition and evaluates it again in the projection — ~4× redundant
    fold work; measured 10.4 s → ~1 s at sf0.1.)

    Float parity with SQL oracles: dots and norms accumulate strictly
    left-to-right over dimensions (one vectorized pass per dim), which
    is bit-identical to the ``F.aggregate`` fold and DuckDB's
    ``list_sum`` — BLAS matmul would reassociate the sum and flip
    values sitting on a trunc6 boundary.

    At scale, per-bucket memory is O(bucket²) for the pair index —
    set ``cap`` (production mode) to bound every bucket via
    :func:`rp_lsh_bucket_capped` (escalating sign-bit depth + salt
    shard: O(cap²) per invocation at any corpus size or skew). With
    ``cap=None`` the fixed 2^n_planes geometry applies and a hot
    bucket is the same skew exposure the join-based plan had.

    Pass ``dim`` explicitly when known (the embedding dimensionality is
    a property of the upstream model, not the data); the ``first()``
    fallback costs one driver round-trip.
    """
    import pandas as pd

    if dim is None:
        sample = df.select(vec_col).first()
        if sample is None or sample[0] is None:
            # empty input / NULL first vector: empty pair table, not a
            # TypeError from len(None)
            id_type = df.schema[id_col].dataType.simpleString()
            return df.sparkSession.createDataFrame(
                [], f"id_a {id_type}, id_b {id_type}, cos_sim double"
            )
        dim = len(sample[0])
    if cap is not None:
        b = rp_lsh_bucket_capped(
            df, dim, vec_col=vec_col, id_col=id_col,
            base_planes=n_planes, step=step, levels=levels,
            cap=cap, seed=seed,
        )
    else:
        planes = hyperplanes(dim, n_planes, seed)
        b = rp_lsh_bucket(df, planes, vec_col)
    b = b.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "bucket"
    )
    id_type = b.schema["id"].dataType.simpleString()
    out_schema = f"id_a {id_type}, id_b {id_type}, cos_sim double"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        empty = pd.DataFrame({"id_a": pdf["id"][:0], "id_b": pdf["id"][:0],
                              "cos_sim": np.zeros(0)})
        if n < 2:
            return empty
        order = np.argsort(pdf["id"].to_numpy(), kind="stable")
        ids = pdf["id"].to_numpy()[order]
        X = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf["v"].to_numpy()[order]]
        )
        d_ = X.shape[1]
        norm_acc = np.zeros(n)
        for d in range(d_):  # left-to-right: bit-identical to the SQL fold
            norm_acc = norm_acc + X[:, d] * X[:, d]
        norms = np.sqrt(norm_acc)
        ia, ib = np.triu_indices(n, k=1)
        dot_acc = np.zeros(len(ia))
        for d in range(d_):
            dot_acc = dot_acc + X[ia, d] * X[ib, d]
        cos = dot_acc / (norms[ia] * norms[ib])
        cos = np.floor(cos * 1_000_000.0) / 1_000_000.0  # trunc6
        keep = cos >= threshold
        if not keep.any():
            return empty
        return pd.DataFrame(
            {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "cos_sim": cos[keep]}
        )

    return b.groupBy("bucket").applyInPandas(kernel, schema=out_schema)


def argmin_cell(vec: Column, cents: Column, sqdist_fn) -> Column:
    """In-row nearest-centroid argmin over a broadcast centroid array.

    ``cents`` is an ``array<struct<cell, c array<double>>>`` column (one
    row, broadcast); the winner is
    ``array_min(transform(cents, s -> struct(d, cell)))`` — Spark's
    struct ordering is lexicographic by field, so this is exactly the
    (distance asc, cell-id asc) tie-break the old
    ``row_number().over(partitionBy(id).orderBy(d, cell))`` plan
    computed, minus its corpus-wide shuffle and ×n_cells row blowup.
    """
    return F.array_min(
        F.transform(
            cents,
            lambda s: F.struct(
                sqdist_fn(vec, s["c"]).alias("d"), s["cell"].alias("cell")
            ),
        )
    )["cell"]


def kmeans_assign(
    df: DataFrame,
    dim: int,
    n_cells: int = 8,
    iters: int = 2,
    quant_bits: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Iterative Lloyd k-means over embeddings, fully deterministic.

    The iterative-algorithm pattern (like connected components in
    operators/graph.py) in its centroid form: each iteration is one
    grouped aggregate (centroid means) — the ONLY corpus shuffle — plus
    an **in-row** argmin assignment: the n_cells centroids are collapsed
    to a single-row array (`array_sort(collect_list(struct(cell, c)))`),
    broadcast, and each corpus row picks its cell with
    ``array_min(transform(cents, s -> struct(dist, cell)))`` — struct
    ordering gives the (distance, cell-id) tie-break with zero shuffle
    and zero row blowup. (The previous crossJoin×n_cells +
    ``row_number over partitionBy(id)`` shape re-shuffled an 8×-inflated
    corpus every iteration.) Determinism on any engine/shuffle order:
    centroid means sum the ORIGINAL vectors quantized to an exact
    ``2^-quant_bits`` integer grid (BIGINT partial sums are
    order-proof; a raw float mean drifts), assignments break distance
    ties by cell id, and the init is ``id mod n_cells`` — so the whole
    trajectory replays exactly as chained SQL (the DuckDB oracle of
    ``ml_kmeans_assign``).

    Returns ``(id, cell)`` after ``iters`` update+assign rounds.
    """
    g, _ = _kmeans_state(df, dim, n_cells, iters, quant_bits, id_col, vec_col)
    return g.select("id", "cell")


def _sqd(vec: Column, cvec: Column) -> Column:
    """Squared euclidean distance between two double arrays (in-row
    sequential fold — deterministic summation order)."""
    return F.aggregate(
        F.zip_with(
            vec, cvec, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _centroids_row(g: DataFrame, dim: int, scale: float):
    """Quantized-grid centroid means of ``g``'s current assignment,
    collapsed to a broadcastable single-row sorted struct array."""
    sums = g.groupBy("cell").agg(
        *[F.sum(F.col("gq")[i]).alias(f"s{i}") for i in range(dim)],
        F.count(F.lit(1)).alias("n"),
    )
    cent = sums.select(
        "cell",
        F.array(
            *[F.col(f"s{i}") / (F.col("n") * F.lit(scale)) for i in range(dim)]
        ).alias("c"),
    )
    return cent.agg(
        F.array_sort(F.collect_list(F.struct(F.col("cell"), F.col("c")))).alias(
            "cents"
        )
    )


def _kmeans_state(
    df: DataFrame,
    dim: int,
    n_cells: int,
    iters: int,
    quant_bits: int,
    id_col: str,
    vec_col: str,
):
    """Run the Lloyd trajectory; return ``(g, scale)`` where ``g`` is
    the working frame ``(id, v, gq, cell)`` after ``iters`` rounds —
    shared by :func:`kmeans_assign` and :func:`semantic_dedup`.

    Each round's frame is persisted and the final one eagerly
    materialized (then the intermediates dropped): every round
    references its predecessor from TWO branches (the centroid
    aggregate and the assignment), so an unmaterialized chain
    re-evaluates upstream 2^iters times — the standard
    checkpoint-between-iterations rule for iterative algorithms
    (MLlib's own k-means does the same). Values are unchanged: the
    quantized centroid math is layout-proof by construction.
    """
    scale = float(1 << quant_bits)
    g = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(scale)).cast("long"),
        ).alias("gq"),
        F.pmod(F.col(id_col), F.lit(n_cells)).alias("cell"),
    )
    kept = []
    for _ in range(iters):
        g = g.persist()
        kept.append(g)
        cents1 = _centroids_row(g, dim, scale)
        g = (
            g.drop("cell")
            .crossJoin(F.broadcast(cents1))
            .withColumn("cell", argmin_cell(F.col("v"), F.col("cents"), _sqd))
            .select("id", "v", "gq", "cell")
        )
    if kept:
        g = g.persist()
        g.count()  # eager: materialize before dropping the chain
        for prev in kept:
            prev.unpersist(blocking=False)
    return g, scale


def semantic_dedup(
    df: DataFrame,
    dim: int,
    n_cells: int = 8,
    iters: int = 2,
    quant_bits: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster the embedding
    corpus with deterministic k-means, then keep ONE representative per
    cell — the member nearest its cell centroid (ties by id) — and map
    every other member to it. The embedding analog of exact-dedup's
    canonical survivor: downstream keeps ``is_rep`` rows and drops (or
    downweights) semantic near-duplicates.

    Per vector: ``(id, cell, rep_id, is_rep, dist)`` with ``dist`` the
    trunc6 squared distance to the final cell centroid.

    Plan shape: the Lloyd rounds are the only corpus shuffles (one
    grouped agg each); the final distance is computed IN-ROW against
    the broadcast centroid array (looked up by cell id, not array
    position — a Lloyd round can empty a cell, so position ≠ id); the
    per-cell representative is an 8-row ``min(struct(dist, id))``
    aggregate broadcast back. No corpus-width join, no window over the
    corpus.
    """
    g, scale = _kmeans_state(df, dim, n_cells, iters, quant_bits, id_col, vec_col)
    cents1 = _centroids_row(g, dim, scale)
    my_c = F.element_at(
        F.filter(F.col("cents"), lambda s: s["cell"] == F.col("cell")), 1
    )["c"]
    # Persisted: the representative aggregate AND the final join both
    # read `d`, and each read re-runs the 64-term in-row distance fold
    # over the corpus — one materialization halves the per-row work
    # (round 11, guide §5); the cached frame is 3 narrow columns.
    d = (
        g.crossJoin(F.broadcast(cents1))
        .withColumn("dist", _sqd(F.col("v"), my_c))
        .select("id", "cell", "dist")
        .persist()
    )
    rep = d.groupBy("cell").agg(
        F.min(F.struct(F.col("dist"), F.col("id"))).alias("m")
    ).select("cell", F.col("m.id").alias("rep_id"))
    from speech_data_pipeline_spark.functions import trunc6

    return d.join(F.broadcast(rep), "cell").select(
        "id",
        "cell",
        "rep_id",
        (F.col("id") == F.col("rep_id")).alias("is_rep"),
        trunc6(F.col("dist")).alias("dist"),
    )


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    quant_bits: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k via an IVF (inverted-file) coarse quantizer — the
    second scale path beside LSH.

    The IVF mechanics are the standard ones (cells from a coarse
    quantizer; search probes the ``nprobe`` cells nearest the query,
    exact rerank inside): at 100 TB the assignment table is written
    once, partitioned by ``cell``, and a query scans ``nprobe/n_cells``
    of the data. Everything here stays in one declarative plan:

    - **centroids**: element-wise mean per initial partition
      (``id % n_cells``) — one k-means update step from a
      deterministic init. Elements are quantized to an exact
      ``2^-quant_bits`` integer grid first, so the partial sums are
      exact BIGINTs and the centroid doubles are bit-identical on any
      engine and any shuffle order (a raw float mean would drift by
      summation order).
    - **assignment**: **in-row** argmin of the full-precision squared
      distance over the broadcast single-row centroid array
      (:func:`argmin_cell`) — no corpus shuffle, no row blowup, ties
      broken by cell id.
    - **probe**: the ``nprobe`` cells nearest the baked-in query
      literal, ranked in-row on the same centroid array
      (``slice(array_sort(transform(...)), 1, nprobe)``) — no window,
      no driver round-trip holds the quantizer.

    Returns ``(id, cell, cos_sim)`` for the exact cosine top-k of the
    probed cells.
    """
    dim = len(query_vec)
    scale = float(1 << quant_bits)
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])

    g = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.pmod(F.col(id_col), F.lit(n_cells)).alias("init_cid"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(scale)).cast("long"),
        ).alias("gq"),
    )
    sums = g.groupBy("init_cid").agg(
        *[F.sum(F.col("gq")[i]).alias(f"s{i}") for i in range(dim)],
        F.count(F.lit(1)).alias("n"),
    )
    cent = sums.select(
        F.col("init_cid").alias("cell"),
        F.array(
            *[F.col(f"s{i}") / (F.col("n") * F.lit(scale)) for i in range(dim)]
        ).alias("c"),
    )

    def sqdist(vec: Column, cvec: Column) -> Column:
        return F.aggregate(
            F.zip_with(
                vec, cvec, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    cents1 = cent.agg(
        F.array_sort(F.collect_list(F.struct(F.col("cell"), F.col("c")))).alias(
            "cents"
        )
    )
    # nprobe nearest cells to the query, as an in-row array literal-alike
    # (evaluated per row over the 1-row broadcast — n_cells elements).
    probeset = F.transform(
        F.slice(
            F.array_sort(
                F.transform(
                    F.col("cents"),
                    lambda s: F.struct(
                        sqdist(qlit, s["c"]).alias("qd"), s["cell"].alias("cell")
                    ),
                )
            ),
            1,
            nprobe,
        ),
        lambda s: s["cell"],
    )
    return (
        g.crossJoin(F.broadcast(cents1))
        .withColumn("cell", argmin_cell(F.col("v"), F.col("cents"), sqdist))
        .where(F.array_contains(probeset, F.col("cell")))
        .select(
            F.col("id"),
            F.col("cell"),
            trunc6(cosine(F.col("v"), qlit)).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("id"))
        .limit(k)
    )


def pq_topk(
    df: DataFrame,
    query_vec: list[float],
    m_sub: int = 4,
    n_cells: int = 4,
    k: int = 10,
    quant_bits: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k via product quantization with ADC (asymmetric distance
    computation) — the third scale path beside LSH and IVF, and the one
    serving systems actually ship: vectors compress to ``m_sub`` small
    codes (here 4×2 bits), queries scan CODES, not vectors.

    Mechanics, all in one declarative plan:

    - **codebooks**: the vector is split into ``m_sub`` contiguous
      subvectors; each subspace gets ``n_cells`` centroids from one
      quantized-grid k-means step off the ``id % n_cells`` init —
      computed as a SINGLE corpus aggregate over all dims (the
      subspace split is column slicing of the one centroid table),
      collapsed to a broadcast one-row array.
    - **encoding**: per subspace, the code is an in-row argmin over
      the broadcast centroids (ties by cell id) — zero shuffle, the
      corpus never duplicates.
    - **ADC query**: the query's distance to a vector is approximated
      by Σ_j sqdist(q_j, centroid[j, code_j]) — per row a fixed
      left-to-right sum of ``m_sub`` doubles against the broadcast
      centroid array (the classic distance-table lookup), then
      ``orderBy(dist, id).limit(k)`` = TakeOrderedAndProject.

    Deterministic cross-engine: centroids from exact BIGINT partial
    sums; all folds in fixed index order; ties broken by id. The
    DuckDB oracle of ``sim_pq_topk`` replays codebooks, codes, and the
    ADC sum relationally.

    Returns ``(id, codes, adc_dist)`` for the approximate top-k.
    """
    from speech_data_pipeline_spark.functions import trunc6

    dim = len(query_vec)
    if dim % m_sub != 0:
        raise ValueError(
            f"pq_topk: dim {dim} not divisible by m_sub {m_sub} — trailing"
            " dimensions would silently drop out of the codes and the ADC"
            " ranking; pad the vectors or choose a divisor"
        )
    sub = dim // m_sub
    scale = float(1 << quant_bits)
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])

    g = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(scale)).cast("long"),
        ).alias("gq"),
        F.pmod(F.col(id_col), F.lit(n_cells)).alias("init_cid"),
    )
    sums = g.groupBy("init_cid").agg(
        *[F.sum(F.col("gq")[i]).alias(f"s{i}") for i in range(dim)],
        F.count(F.lit(1)).alias("n"),
    )
    cent = sums.select(
        F.col("init_cid").alias("cell"),
        F.array(
            *[F.col(f"s{i}") / (F.col("n") * F.lit(scale)) for i in range(dim)]
        ).alias("c"),
    )
    cents1 = cent.agg(
        F.array_sort(F.collect_list(F.struct(F.col("cell"), F.col("c")))).alias(
            "cents"
        )
    )

    def sub_sqd(vec, cvec, j: int):
        # fold subspace dims in fixed ascending order
        return F.aggregate(
            F.sequence(F.lit(j * sub + 1), F.lit(j * sub + sub)),
            F.lit(0.0),
            lambda acc, i: acc
            + (F.element_at(vec, i.cast("int")) - F.element_at(cvec, i.cast("int")))
            * (F.element_at(vec, i.cast("int")) - F.element_at(cvec, i.cast("int"))),
        )

    def code_expr(jj: int):
        # closure factory: a `lambda s, jj=j` default arg would make
        # PySpark read the HOF lambda as the 2-arg (element, index) form
        return F.array_min(
            F.transform(
                F.col("cents"),
                lambda s: F.struct(
                    sub_sqd(F.col("v"), s["c"], jj).alias("d"),
                    s["cell"].alias("cell"),
                ),
            )
        )["cell"]

    def cwin_expr(jj: int):
        return F.element_at(
            F.filter(
                F.col("cents"), lambda s: s["cell"] == F.col(f"code{jj}")
            ),
            1,
        )["c"]

    enc = g.crossJoin(F.broadcast(cents1))
    dist_total = None
    code_cols = []
    for j in range(m_sub):
        enc = enc.withColumn(f"code{j}", code_expr(j))
        dj = sub_sqd(qlit, cwin_expr(j), j)
        dist_total = dj if dist_total is None else dist_total + dj
        code_cols.append(f"code{j}")
    scored = enc.withColumn("adc_raw", dist_total)
    return (
        scored.orderBy("adc_raw", "id")
        .limit(k)
        .select(
            "id",
            F.concat_ws("-", *[F.col(c).cast("string") for c in code_cols]).alias(
                "codes"
            ),
            trunc6(F.col("adc_raw")).alias("adc_dist"),
        )
    )




def ivfpq_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    m_sub: int = 4,
    n_pq: int = 4,
    rerank_n: int = 0,
    quant_bits: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF+PQ composed index with residual codes and per-cell ADC —
    the production billion-vector shape (FAISS ``IVFx,PQy``): coarse
    IVF cells route the query to ``nprobe`` cells, PQ codebooks trained
    on the RESIDUAL ``v - centroid[cell]`` compress each vector to
    ``m_sub`` codes, and the probed cells are scanned over CODES via an
    asymmetric distance table — never over raw vectors.

    Composition of :func:`ivf_topk`'s coarse quantizer and
    :func:`pq_topk`'s subspace encoding, with the three pieces that
    make it the real index:

    - **residual encoding**: after the in-row coarse argmin, the
      residual is computed in-row (``zip_with(v, my_c, -)``), so the
      PQ bits are spent on within-cell variation.
    - **sampled-init + one-Lloyd-round codebooks**: residuals are
      near-zero-mean, so a partition init (means of random subsets, as
      the raw-vector :func:`pq_topk` uses) collapses every codeword to
      ≈0 and the codes carry no signal. Instead the ``n_pq`` lowest-id
      rows' residuals seed the codebook (genuinely distinct codewords),
      every row takes an in-row argmin code, and ONE grouped
      quantized-grid mean per ``(subspace, code)`` refines them — the
      standard sample-then-Lloyd PQ training, fully relational.
    - **per-cell distance tables**: the query's residual differs per
      coarse cell (``q - centroid[cell]``), so the ADC sum is computed
      against the row's own cell centroid — in-row from broadcast
      one-row arrays, the classic nprobe-many distance tables without
      materializing any of them.
    - **exact rerank of the ADC shortlist** (``rerank_n > 0``, FAISS's
      refine stage): codes order candidates, the top ``rerank_n`` get
      an exact cosine against the query, and the final top-k comes
      from that. ADC error then only costs recall when a true
      neighbor falls outside the shortlist — the shape that makes
      lossy 4-bit codes usable. ``rerank_n = 0`` returns the raw ADC
      ranking (the code-only scan).

    Plan shape at 100 TB: THREE corpus-sized aggregates build the index
    (coarse centroid sums; the seed TakeOrdered; the (j, code)
    refinement sums over the ``m_sub``-exploded residual slices — same
    total bytes as the corpus); assignment and encoding are in-row over
    broadcast single-row arrays (zero shuffle, zero row blowup); the
    query filters to ``nprobe/n_cells`` of the data — with the code
    table written partitioned by ``cell``, partition pruning — and cuts
    with TakeOrderedAndProject. The residual frame is persisted once
    because codebook training and encoding both read it.

    Deterministic cross-engine (chained-CTE DuckDB replay in
    ``sim_ivfpq_topk``): quantized-grid integer sums, fixed fold order,
    (distance, code-id) tie-breaks, final (adc, id) ordering.

    Returns ``(id, cell, codes, adc_dist)`` for the approximate top-k.
    """
    dim = len(query_vec)
    if dim % m_sub != 0:
        raise ValueError(
            f"ivfpq_topk: dim {dim} not divisible by m_sub {m_sub} — trailing"
            " dimensions would silently drop out of the codes; pad the"
            " vectors or choose a divisor"
        )
    sub = dim // m_sub
    scale = float(1 << quant_bits)
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])

    # --- coarse quantizer: one k-means step, id%n_cells init (= ivf_topk)
    g = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        F.pmod(F.col(id_col), F.lit(n_cells)).alias("init_cid"),
        F.transform(
            F.col(vec_col),
            lambda x: F.floor(x.cast("double") * F.lit(scale)).cast("long"),
        ).alias("gq"),
    )
    sums = g.groupBy("init_cid").agg(
        *[F.sum(F.col("gq")[i]).alias(f"s{i}") for i in range(dim)],
        F.count(F.lit(1)).alias("n"),
    )
    cent = sums.select(
        F.col("init_cid").alias("cell"),
        F.array(
            *[F.col(f"s{i}") / (F.col("n") * F.lit(scale)) for i in range(dim)]
        ).alias("c"),
    )
    coarse1 = cent.agg(
        F.array_sort(F.collect_list(F.struct(F.col("cell"), F.col("c")))).alias(
            "coarse"
        )
    )

    my_c = F.element_at(
        F.filter(F.col("coarse"), lambda s: s["cell"] == F.col("cell")), 1
    )["c"]
    # assignment + in-row residual; persisted: seed sampling, codebook
    # refinement, and encoding all read this frame (same materialize-
    # once rule as _kmeans_state).
    res = (
        g.crossJoin(F.broadcast(coarse1))
        .withColumn("cell", argmin_cell(F.col("v"), F.col("coarse"), _sqd))
        .withColumn("r", F.zip_with(F.col("v"), my_c, lambda x, c: x - c))
        .withColumn(
            "rq",
            F.transform(
                F.col("r"), lambda x: F.floor(x * F.lit(scale)).cast("long")
            ),
        )
        .select("id", "cell", "v", "r", "rq")
        .persist()
    )

    def dsub(vec: Column, cvec: Column, j: int, sub_rel: bool) -> Column:
        """Σ_i (vec[j*sub+i] - cvec[idx])² over subspace j, fixed order.
        ``sub_rel``: cvec is subspace-local (length ``sub``) vs full-dim."""
        return F.aggregate(
            F.sequence(F.lit(1), F.lit(sub)),
            F.lit(0.0),
            lambda acc, i: acc
            + (
                F.element_at(vec, (i + F.lit(j * sub)).cast("int"))
                - F.element_at(
                    cvec, i.cast("int") if sub_rel else (i + F.lit(j * sub)).cast("int")
                )
            )
            * (
                F.element_at(vec, (i + F.lit(j * sub)).cast("int"))
                - F.element_at(
                    cvec, i.cast("int") if sub_rel else (i + F.lit(j * sub)).cast("int")
                )
            ),
        )

    # --- PQ codebooks: sampled init (n_pq lowest-id residuals as
    # codewords, one-row broadcast array ordered by id so position =
    # code id) + one Lloyd refinement per (subspace, code).
    sv1 = (
        res.orderBy("id")
        .limit(n_pq)
        .agg(F.array_sort(F.collect_list(F.struct(F.col("id"), F.col("r")))).alias("sv"))
    )

    def code0_expr(jj: int) -> Column:
        # index lambda: position in sv IS the init code id
        return F.array_min(
            F.zip_with(
                F.col("sv"),
                F.sequence(F.lit(0), F.size(F.col("sv")) - 1),
                lambda s, p: F.struct(
                    dsub(F.col("r"), s["r"], jj, sub_rel=False).alias("d"),
                    p.alias("pcell"),
                ),
            )
        )["pcell"]

    ex = (
        res.crossJoin(F.broadcast(sv1))
        .select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            code0_expr(j).alias("code"),
                            F.slice(F.col("rq"), j * sub + 1, sub).alias("sq"),
                        )
                        for j in range(m_sub)
                    ]
                )
            ).alias("e"),
        )
        .select("e.j", "e.code", "e.sq")
    )
    ref = ex.groupBy("j", "code").agg(
        *[F.sum(F.col("sq")[i]).alias(f"s{i}") for i in range(sub)],
        F.count(F.lit(1)).alias("n"),
    )
    pcent = ref.select(
        "j",
        F.col("code").alias("pcell"),
        F.array(
            *[F.col(f"s{i}") / (F.col("n") * F.lit(scale)) for i in range(sub)]
        ).alias("c"),
    )
    pq1 = pcent.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("j"), F.col("pcell"), F.col("c")))
        ).alias("pq")
    )

    def code_expr(jj: int) -> Column:
        return F.array_min(
            F.transform(
                F.filter(F.col("pq"), lambda s: s["j"] == jj),
                lambda s: F.struct(
                    dsub(F.col("r"), s["c"], jj, sub_rel=True).alias("d"),
                    s["pcell"].alias("pcell"),
                ),
            )
        )["pcell"]

    def pq_c(jj: int) -> Column:
        return F.element_at(
            F.filter(
                F.col("pq"),
                lambda s: (s["j"] == jj) & (s["pcell"] == F.col(f"code{jj}")),
            ),
            1,
        )["c"]

    # query residual per coarse cell (in-row against the broadcast array)
    q_res = F.zip_with(qlit, my_c, lambda x, c: x - c)

    probeset = F.transform(
        F.slice(
            F.array_sort(
                F.transform(
                    F.col("coarse"),
                    lambda s: F.struct(
                        _sqd(qlit, s["c"]).alias("qd"), s["cell"].alias("cell")
                    ),
                )
            ),
            1,
            nprobe,
        ),
        lambda s: s["cell"],
    )

    enc = (
        res.crossJoin(F.broadcast(coarse1))
        .where(F.array_contains(probeset, F.col("cell")))
        .crossJoin(F.broadcast(pq1))
        .withColumn("qr", q_res)
    )
    dist_total = None
    code_cols = []
    for j in range(m_sub):
        enc = enc.withColumn(f"code{j}", code_expr(j))
        dj = dsub(F.col("qr"), pq_c(j), j, sub_rel=True)
        dist_total = dj if dist_total is None else dist_total + dj
        code_cols.append(f"code{j}")
    codes_str = F.concat_ws(
        "-", *[F.col(c).cast("string") for c in code_cols]
    ).alias("codes")
    scored = enc.withColumn("adc_raw", dist_total)
    if rerank_n and rerank_n > 0:
        short = scored.orderBy("adc_raw", "id").limit(rerank_n)
        return (
            short.select(
                "id",
                "cell",
                codes_str,
                trunc6(F.col("adc_raw")).alias("adc_dist"),
                trunc6(cosine(F.col("v"), qlit)).alias("cos_sim"),
            )
            .orderBy(F.col("cos_sim").desc(), F.col("id"))
            .limit(k)
        )
    return (
        scored.orderBy("adc_raw", "id")
        .limit(k)
        .select(
            "id",
            "cell",
            codes_str,
            trunc6(F.col("adc_raw")).alias("adc_dist"),
        )
    )


def pca_power_topk(
    df: DataFrame,
    dim: int,
    iters: int = 3,
    k: int = 20,
    quant_bits: int = 20,
    contrib_bits: int = 24,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache_handle: list | None = None,
) -> DataFrame:
    """First principal component by MATRIX-FREE power iteration, and
    the top-k projections onto it — distributed PCA without ever
    materializing the d×d covariance.

    Each iteration computes ``u = Σ_rows xc · (xc·v)`` directly: one
    corpus aggregate producing ``dim`` sums (the classic scalable PCA
    step — a covariance pass would shuffle d² partial sums and cap
    ``dim``; this shape works at dim=4096 as well as 64). The running
    vector ``v`` lives in a single-row broadcast state chained through
    the plan, exactly like the Lloyd state in :func:`kmeans_assign`.

    Determinism on any engine / shuffle order:

    - the mean comes from exact BIGINT sums of a ``2^-quant_bits``
      integer grid;
    - each row's contribution ``xc_i·(xc·v)`` is floored onto a
      ``2^-contrib_bits`` grid BEFORE summing, so the per-dimension
      sums are exact integers (a raw double sum would drift with
      partitioning); at N rows the sums need
      ``log2(N · max|contrib| · 2^contrib_bits)`` < 63 bits — for
      larger corpora lower ``contrib_bits`` or sum as DECIMAL(38,0);
    - normalization and dot products fold left-to-right in index
      order (``F.aggregate`` ≡ DuckDB ``list_sum``), and ``sqrt`` /
      division are IEEE-exact.

    The sign of ``v`` follows the all-positive init (power iteration
    converges up to sign; a fixed init pins it). Returns
    ``(id, pc1)`` for the ``k`` largest projections (ties by id).
    """
    # Expressions are assembled as SQL strings (one py4j round-trip per
    # WHOLE array expression instead of ~5 per element): the Column-API
    # form of the dim-wide aggregates cost ~8 s of pure driver-side
    # plan construction at dim=64. The generated SQL mirrors the DuckDB
    # oracle text operator-for-operator.
    scale = repr(float(1 << quant_bits))
    cb = repr(float(1 << contrib_bits))
    base = df.selectExpr(
        f"{id_col} AS id",
        f"transform({vec_col}, x -> CAST(x AS DOUBLE)) AS x",
        f"transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE) * {scale}D)"
        " AS BIGINT)) AS gq",
    ).persist()
    # NOTE: this cache is reused by every power-iteration round AND by
    # the returned (lazy) projection, so it cannot be unpersisted here.
    # Long-lived sessions running many pca_power_topk calls pass
    # ``cache_handle=[]`` and unpersist the appended frame once the
    # result is consumed (or spark.catalog.clearCache()); registry
    # queries are one-shot per session, so a single retained cache is
    # bounded.
    if cache_handle is not None:
        cache_handle.append(base)

    s_arr = ",".join(f"sum(gq[{i}])" for i in range(dim))
    mu_row = base.agg(
        F.expr(f"array({s_arr})").alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).selectExpr(f"transform(s, e -> e / (n * {scale}D)) AS mu")

    import math

    v0 = repr(1.0 / math.sqrt(float(dim)))
    state = mu_row.selectExpr(
        "mu", f"transform(mu, e -> {v0}D) AS v"
    )

    dv_sql = (
        "aggregate(zip_with(xc, v, (a, b) -> a * b), 0.0D,"
        " (acc, e) -> acc + e)"
    )
    u_arr = ",".join(
        f"sum(CAST(floor(xc[{i}] * dv * {cb}D) AS BIGINT))" for i in range(dim)
    )
    for _ in range(iters):
        j = (
            base.crossJoin(F.broadcast(state))
            .withColumn("xc", F.expr("zip_with(x, mu, (a, b) -> a - b)"))
            .withColumn("dv", F.expr(dv_sql))
        )
        # zero-variance corpus -> u = 0 -> norm 0: emit the zero vector
        # instead of dividing by zero (ANSI mode raises otherwise)
        norm_state = (
            j.agg(F.expr(f"array({u_arr})").alias("u"))
            .selectExpr(f"transform(u, e -> e / {cb}D) AS un")
            .selectExpr(
                "un",
                "sqrt(aggregate(transform(un, y -> y * y), 0.0D,"
                " (acc, y) -> acc + y)) AS nrm",
            )
            .selectExpr(
                "transform(un, e -> CASE WHEN nrm = 0.0D THEN 0.0D"
                " ELSE e / nrm END) AS v"
            )
        )
        state = mu_row.crossJoin(F.broadcast(norm_state))

    return (
        base.crossJoin(F.broadcast(state))
        .withColumn("xc", F.expr("zip_with(x, mu, (a, b) -> a - b)"))
        .selectExpr(
            f"id AS {id_col}",
            f"floor({dv_sql} * 1000000.0D) / 1000000.0D AS pc1",
        )
        .orderBy(F.col("pc1").desc(), F.col(id_col))
        .limit(k)
    )


def hard_negatives_in_buckets(
    df: DataFrame,
    n_planes: int = 6,
    seed: int = 42,
    dup_ceiling: float = 0.95,
    dim: int = 64,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
    cap: int | None = None,
    step: int = 5,
    levels: int = 3,
) -> DataFrame:
    """Per-anchor hardest different-label neighbor within its LSH
    bucket — contrastive-training negative mining as a per-bucket
    vectorized kernel (the :func:`embedding_neardup_pairs` shape:
    bucketing JVM-side, the within-bucket quadratic as ONE
    ``applyInPandas`` kernel, NO candidate pair rows ever materialized;
    a join-based formulation would emit O(bucket²) rows and evaluate
    the cosine fold inside the join condition).

    Argmax semantics match the SQL spec: raw-double cosine descending,
    ``neg_id`` ascending on ties, candidates restricted to a DIFFERENT
    label with raw cosine strictly under ``dup_ceiling``; output cosine
    is trunc6. Floats accumulate strictly left-to-right over dims —
    bit-identical to the ``F.aggregate`` fold and DuckDB ``list_sum``.

    At scale per-bucket work is O(bucket²) kernel flops and O(bucket²)
    kernel memory. With ``cap`` set (production mode) bucketing goes
    through :func:`rp_lsh_bucket_capped` — escalating sign-bit depth
    plus a final salt shard bound every invocation at O(cap²)
    regardless of corpus size or skew; with ``cap=None`` the
    fixed-plane geometry applies (diagnostic / tiny corpora only).
    """
    import pandas as pd

    if cap is not None:
        b = rp_lsh_bucket_capped(
            df, dim, vec_col=vec_col, id_col=id_col,
            base_planes=n_planes, step=step, levels=levels,
            cap=cap, seed=seed,
        )
    else:
        planes = hyperplanes(dim, n_planes, seed)
        b = rp_lsh_bucket(df, planes, vec_col)
    b = b.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("lab"),
        F.col(vec_col).alias("v"),
        "bucket",
    )
    id_type = b.schema["id"].dataType.simpleString()
    lab_type = b.schema["lab"].dataType.simpleString()
    out_schema = (
        f"anchor_id {id_type}, label_a {lab_type}, "
        f"neg_id {id_type}, label_n {lab_type}, cos_sim double"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        empty = pd.DataFrame(
            {
                "anchor_id": pdf["id"][:0],
                "label_a": pdf["lab"][:0],
                "neg_id": pdf["id"][:0],
                "label_n": pdf["lab"][:0],
                "cos_sim": np.zeros(0),
            }
        )
        if n < 2:
            return empty
        order = np.argsort(pdf["id"].to_numpy(), kind="stable")
        ids = pdf["id"].to_numpy()[order]
        labs = pdf["lab"].to_numpy()[order]
        X = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf["v"].to_numpy()[order]]
        )
        d_ = X.shape[1]
        norm_acc = np.zeros(n)
        for d in range(d_):  # left-to-right: bit-identical to the fold
            norm_acc = norm_acc + X[:, d] * X[:, d]
        norms = np.sqrt(norm_acc)
        dot_acc = np.zeros((n, n))
        for d in range(d_):
            dot_acc = dot_acc + X[:, d][:, None] * X[:, d][None, :]
        cos = dot_acc / (norms[:, None] * norms[None, :])
        mask = (
            (labs[:, None] != labs[None, :])
            & (cos < dup_ceiling)
            & ~np.eye(n, dtype=bool)
        )
        val = np.where(mask, cos, -np.inf)
        # argmax returns the FIRST max — ids are sorted ascending, so
        # ties resolve to the smallest neg_id, matching the SQL spec
        best = val.argmax(axis=1)
        has = np.isfinite(val[np.arange(n), best])
        if not has.any():
            return empty
        sel = np.flatnonzero(has)
        bj = best[sel]
        c6 = np.floor(cos[sel, bj] * 1_000_000.0) / 1_000_000.0
        return pd.DataFrame(
            {
                "anchor_id": ids[sel],
                "label_a": labs[sel],
                "neg_id": ids[bj],
                "label_n": labs[bj],
                "cos_sim": c6,
            }
        )

    return b.groupBy("bucket").applyInPandas(kernel, schema=out_schema)


def knn_in_buckets(
    df: DataFrame,
    k: int = 5,
    n_planes: int = 6,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cap: int | None = None,
    step: int = 5,
    levels: int = 3,
) -> DataFrame:
    """Per-vector top-k cosine neighbor lists within LSH buckets — the
    kNN-graph construction step (mutual-kNN graphs, diffusion maps,
    graph-based label propagation over embeddings).

    Same engine shape as :func:`hard_negatives_in_buckets`: bucketing
    JVM-side, within-bucket quadratic as ONE vectorized per-bucket
    ``applyInPandas`` kernel emitting only n·k edge rows (never the n²
    candidate pairs). Ranking is raw-double cosine descending with
    dst-id ascending tie-break (ids sorted ascending + stable argsort
    = the SQL row_number contract); ``cos_raw`` is emitted untruncated
    so consumers can re-rank/filter before display-truncating.

    Scale: per-bucket cost O(bucket²) flops / memory. With ``cap``
    set (the production mode), bucketing goes through
    :func:`rp_lsh_bucket_capped` — ``n_planes`` is the BASE depth and
    over-populated buckets escalate by ``step`` extra sign bits up to
    ``levels`` times, then salt-shard, so every kernel invocation is
    O(cap²) regardless of corpus size or skew. With ``cap=None``
    (diagnostic / tiny corpora) the fixed-plane geometry applies and
    bucket population is corpus-linear.
    """
    import pandas as pd

    if cap is not None:
        b = rp_lsh_bucket_capped(
            df, dim, vec_col=vec_col, id_col=id_col,
            base_planes=n_planes, step=step, levels=levels,
            cap=cap, seed=seed,
        ).select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "bucket"
        )
    else:
        planes = hyperplanes(dim, n_planes, seed)
        b = rp_lsh_bucket(df, planes, vec_col).select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v"), "bucket"
        )
    id_type = b.schema["id"].dataType.simpleString()
    out_schema = f"src {id_type}, dst {id_type}, cos_raw double"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        empty = pd.DataFrame(
            {"src": pdf["id"][:0], "dst": pdf["id"][:0],
             "cos_raw": np.zeros(0)}
        )
        if n < 2:
            return empty
        order = np.argsort(pdf["id"].to_numpy(), kind="stable")
        ids = pdf["id"].to_numpy()[order]
        X = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf["v"].to_numpy()[order]]
        )
        d_ = X.shape[1]
        norm_acc = np.zeros(n)
        for d in range(d_):  # left-to-right: bit-identical to the fold
            norm_acc = norm_acc + X[:, d] * X[:, d]
        norms = np.sqrt(norm_acc)
        dot_acc = np.zeros((n, n))
        for d in range(d_):
            dot_acc = dot_acc + X[:, d][:, None] * X[:, d][None, :]
        cos = dot_acc / (norms[:, None] * norms[None, :])
        val = np.where(np.eye(n, dtype=bool), -np.inf, cos)
        kk = min(k, n - 1)
        # stable sort on -cos: ties resolve to the smaller index, and
        # ids are ascending, so ties go to the smaller dst id
        nbr = np.argsort(-val, axis=1, kind="stable")[:, :kk]
        src = np.repeat(ids, kk)
        dst = ids[nbr.ravel()]
        return pd.DataFrame(
            {"src": src, "dst": dst,
             "cos_raw": cos[np.repeat(np.arange(n), kk), nbr.ravel()]}
        )

    return b.groupBy("bucket").applyInPandas(kernel, schema=out_schema)


def jl_sign_matrix(in_dim: int, out_dim: int, seed: str = "rp") -> list[list[int]]:
    """Deterministic ±1 Johnson–Lindenstrauss sign matrix, seeded by
    md5 — the Achlioptas (2003) database-friendly projection. Computed
    ONCE at plan-build time (the signs are literals in the plan, and
    the same literals parametrize the SQL oracle), so the projection
    costs zero per-row hashing."""
    import hashlib

    return [
        [
            1
            if int(
                hashlib.md5(f"{seed}_{j}_{i}".encode()).hexdigest()[0], 16
            )
            % 2
            == 0
            else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def random_projection(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    in_dim: int = 64,
    out_dim: int = 16,
    seed: str = "rp",
) -> DataFrame:
    """Johnson–Lindenstrauss random projection to ``out_dim`` dims:
    ``y_j = (Σ_i x_i·s_ij) / √out_dim`` with the seeded ±1 sign matrix
    of :func:`jl_sign_matrix` — the standard cheap dimensionality
    reduction that preserves pairwise distances within (1±ε) w.h.p.

    Parity: each output coordinate is ONE left-to-right
    ``F.aggregate`` fold over the input vector (≡ DuckDB ``list_sum``
    over ``list_transform`` — the repo-wide fold rule); the 1/√m
    scale (m a power of two → exact binary fraction) multiplies once
    at the end.

    100 TB shape: pure per-row column algebra — no shuffle, no UDF,
    no broadcast state; the sign matrix lives in the plan.
    """
    signs = jl_sign_matrix(in_dim, out_dim, seed)
    scale = 1.0 / float(out_dim) ** 0.5
    x = F.col(vec_col)

    def coord(j: int) -> Column:
        s = F.array(*[F.lit(float(v)) for v in signs[j]])
        return trunc6(
            F.aggregate(
                F.zip_with(x, s, lambda a, b: a.cast("double") * b),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            * F.lit(scale)
        )

    return df.select(
        F.col(id_col).alias("id"),
        F.array(*[coord(j) for j in range(out_dim)]).alias("proj"),
    )


def late_interaction_topk(
    df: DataFrame,
    query_vec: list[float],
    n_sub: int = 8,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ColBERT-style late-interaction (MaxSim) retrieval: treat each
    embedding as ``n_sub`` sub-vectors ("token" vectors) and score
    ``Σ_i max_j cos(q_i, d_j)`` — the multi-vector relevance model
    that beats single-vector cosine when different parts of a
    document match different parts of the query.

    Engine shape: the whole 8×8 MaxSim grid is ONE generated column
    expression over in-row array slices (the :func:`dot` /
    :func:`l2_norm` fold primitives — left-to-right double folds,
    IEEE-identical in DuckDB's list_sum), so scoring is a map-only
    pass with no Python and no shuffle; the top-k is
    TakeOrderedAndProject exactly like :func:`cosine_topk`.
    Zero-norm sub-vectors contribute cosine 0 (guarded on the
    sum-of-squares, before the sqrt).

    At 100 TB the same expression runs per-partition unchanged; the
    only cross-node traffic is the k-row heap merge.
    """
    dim = len(query_vec)
    sub = dim // n_sub
    # The 8×8 grid is built as ONE SQL string parsed JVM-side: the
    # previous Column-algebra construction issued thousands of py4j
    # round-trips (one per lambda/lit/operator node) and dominated the
    # query's wall time at 4.8s of driver-side plan BUILDING before a
    # 1s execution (round-10 profile; guide §1.2 "per-task work" —
    # here per-PLAN work). The parsed expression tree is fold-for-fold
    # the one the lambda form produced: same slices, same left-to-right
    # double folds, same CASE/greatest/+ shape — bit-identical scores
    # (re-proved against the DuckDB oracle, which mirrors this exact
    # fold order).
    import math

    if not all(math.isfinite(float(x)) for x in query_vec):
        # repr() of inf/nan ('inf', 'nan') is not parseable SQL; the
        # Column-literal form this replaced accepted them, so fail loud
        raise ValueError("late_interaction_topk: query_vec must be finite")
    vec_sql = f"`{vec_col}`"

    def _qarr(i: int) -> str:
        lits = ", ".join(
            f"{float(x)!r}D" for x in query_vec[i * sub : (i + 1) * sub]
        )
        return f"array({lits})"

    sq = "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)"
    terms = []
    for i in range(n_sub):
        arr = _qarr(i)
        l2q = f"sqrt(aggregate({arr}, 0.0D, {sq}))"
        cands = []
        for j in range(n_sub):
            dj = f"slice({vec_sql}, {j * sub + 1}, {sub})"
            nd2 = f"aggregate({dj}, 0.0D, {sq})"
            dotx = (
                f"aggregate(zip_with({dj}, {arr}, "
                f"(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
                f"0.0D, (acc, x) -> acc + x)"
            )
            cands.append(
                f"(CASE WHEN {nd2} > 0.0D THEN {dotx} / ({l2q} * sqrt({nd2}))"
                f" ELSE 0.0D END)"
            )
        terms.append("greatest(" + ", ".join(cands) + ")")
    score = F.expr(" + ".join(terms))
    return (
        df.select(F.col(id_col), trunc6(score).alias("li_score"))
        .orderBy(F.col("li_score").desc(), F.col(id_col))
        .limit(k)
    )
