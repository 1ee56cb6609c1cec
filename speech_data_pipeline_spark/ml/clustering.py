"""Real (pure-NumPy) density clustering backend for M5.

The reference's speaker re-clustering fits UMAP + HDBSCAN per audio
file (modules/speaker_rematch.py:90-137: cuML/CPU fallbacks, noise
label -1, soft-clustering rescue of noise at prob >= 0.2, and
``min_cluster_size = max(2, 4% of n)``, :117-119). Those libraries are
not in this container, but density clustering itself needs nothing
beyond NumPy at per-file cardinality (one file's chunk embeddings,
1e2-1e4 rows — the same O(n²)-per-file budget the reference spends).
This module provides classic DBSCAN plus the reference-shaped noise
rescue, making the M5 ``load_backend`` seam demonstrably real rather
than all-stub, the same upgrade the pure-NumPy WAV parser gave S2.

Determinism: labels are assigned by BFS from the lowest-index unvisited
core point, so for a fixed row order (the kernel sorts by chunk index)
the labeling is bit-stable across runs, partitionings, and engines —
the property SURVEY §7 known-hard #3 demands from Spark-retried tasks.
"""

from __future__ import annotations

import numpy as np


def _pairwise_sq_dists(X: np.ndarray) -> np.ndarray:
    """Dense squared Euclidean distance matrix (per-file cardinality)."""
    sq = np.einsum("ij,ij->i", X, X)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (X @ X.T)
    np.maximum(d2, 0.0, out=d2)
    return d2


def dbscan(
    X: np.ndarray, eps: float, min_samples: int
) -> tuple[np.ndarray, np.ndarray]:
    """Classic DBSCAN over a dense distance matrix.

    Returns ``(labels, core_mask)``; noise is ``-1``. Cluster ids are
    dense, ordered by first (lowest-index) core point — deterministic
    for a fixed row order.
    """
    n = len(X)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.zeros(0, dtype=bool)
    d2 = _pairwise_sq_dists(np.asarray(X, dtype=np.float64))
    within = d2 <= eps * eps
    core = within.sum(axis=1) >= min_samples  # self-neighbor included
    labels = np.full(n, -1, dtype=np.int64)
    cid = 0
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        labels[i] = cid
        queue = [i]
        while queue:
            j = queue.pop()
            for nb in np.flatnonzero(within[j]):
                if labels[nb] == -1:
                    labels[nb] = cid
                    if core[nb]:
                        queue.append(int(nb))
        cid += 1
    return labels, core


def rescue_noise(
    X: np.ndarray,
    labels: np.ndarray,
    core: np.ndarray,
    eps: float,
    rescue_factor: float = 2.0,
) -> np.ndarray:
    """Soft-rescue analog of the reference's HDBSCAN membership pass
    (modules/speaker_rematch.py:127-135: noise points re-labeled when
    soft-cluster probability >= 0.2): a noise point joins the cluster
    of its nearest core point when that distance is within
    ``rescue_factor * eps``. Pure distance form of the same idea —
    recover borderline chunks without inventing clusters.
    """
    labels = labels.copy()
    noise_idx = np.flatnonzero(labels == -1)
    core_idx = np.flatnonzero(core)
    if len(noise_idx) == 0 or len(core_idx) == 0:
        return labels
    Xf = np.asarray(X, dtype=np.float64)
    d2 = _pairwise_sq_dists(Xf)
    lim = (rescue_factor * eps) ** 2
    for i in noise_idx:
        dists = d2[i, core_idx]
        j = int(np.argmin(dists))
        if dists[j] <= lim:
            labels[i] = labels[core_idx[j]]
    return labels


def cluster_embeddings(
    X: np.ndarray,
    eps: float = 0.5,
    min_cluster_frac: float = 0.04,
    rescue_factor: float = 2.0,
) -> np.ndarray:
    """The full M5 backend: DBSCAN with the reference's cluster-size
    floor ``max(2, frac * n)`` (speaker_rematch.py:117-119) and the
    noise-rescue pass. Returns labels with ``-1`` noise."""
    n = len(X)
    min_samples = max(2, int(np.ceil(min_cluster_frac * n)))
    labels, core = dbscan(np.asarray(X, dtype=np.float64), eps, min_samples)
    return rescue_noise(X, labels, core, eps, rescue_factor)
