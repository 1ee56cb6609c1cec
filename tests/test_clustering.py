"""M5 real-backend tests: pure-NumPy DBSCAN + reference-shaped rescue
(ml/clustering.py) both as a library and through the Spark kernel."""

import numpy as np
import pytest

from speech_data_pipeline_spark.ml.clustering import (
    cluster_embeddings,
    dbscan,
    rescue_noise,
)
from speech_data_pipeline_spark.ml.stubs import cluster_per_group


def blobs(seed=0, centers=((0, 0), (10, 0), (0, 10)), per=20, noise=2):
    rng = np.random.default_rng(seed)
    pts = []
    for c in centers:
        pts.append(rng.normal(loc=c, scale=0.3, size=(per, 2)))
    X = np.vstack(pts)
    outliers = rng.uniform(low=30, high=40, size=(noise, 2))
    return np.vstack([X, outliers])


def test_dbscan_recovers_blobs_and_noise():
    X = blobs()
    labels, core = dbscan(X, eps=1.5, min_samples=3)
    # three clusters of 20; the 2 far outliers are noise
    assert sorted(np.unique(labels[:-2])) == [0, 1, 2]
    assert set(labels[-2:]) == {-1}
    for b in range(3):
        assert len(set(labels[b * 20 : (b + 1) * 20])) == 1
    assert core[:-2].sum() > 0


def test_dbscan_deterministic_label_order():
    X = blobs(seed=3)
    l1, _ = dbscan(X, eps=1.5, min_samples=3)
    l2, _ = dbscan(X.copy(), eps=1.5, min_samples=3)
    assert (l1 == l2).all()
    # first point always belongs to cluster 0 (lowest-index core BFS)
    assert l1[0] == 0


def test_rescue_joins_borderline_point_only():
    X = blobs()
    # add one borderline point ~2*eps from cluster 0's edge, one far out
    X = np.vstack([X, [[2.5, 0.0]], [[100.0, 100.0]]])
    labels, core = dbscan(X, eps=1.5, min_samples=3)
    assert labels[-2] == -1 and labels[-1] == -1
    rescued = rescue_noise(X, labels, core, eps=1.5, rescue_factor=2.0)
    assert rescued[-2] == labels[0]  # joined nearest cluster
    assert rescued[-1] == -1  # far point stays noise


def test_min_cluster_floor_matches_reference_rule():
    # 100 points -> min_samples = max(2, ceil(4)) = 4: a 3-point clump
    # is too small to seed a cluster
    rng = np.random.default_rng(1)
    big = rng.normal(0, 0.3, size=(97, 2))
    clump = np.array([[50.0, 50.0], [50.1, 50.0], [50.0, 50.1]])
    X = np.vstack([big, clump])
    labels = cluster_embeddings(X, eps=1.0)
    assert set(labels[-3:]) == {-1}
    assert (labels[:-3] == labels[0]).all()


@pytest.mark.parametrize("partitions", [1, 7])
def test_cluster_per_group_dbscan_kernel(spark, partitions):
    rows = []
    for aid in ("a", "b"):
        X = blobs(seed=hash(aid) % 100)
        for i, v in enumerate(X):
            rows.append((aid, i, [float(x) for x in v]))
    df = spark.createDataFrame(
        rows, "audio_id string, chunk_idx long, embedding array<double>"
    ).repartition(partitions)
    out = cluster_per_group(
        df, distance_threshold=1.5, backend="dbscan"
    ).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.audio_id, {})[r.chunk_idx] = r.label
    for aid in ("a", "b"):
        labels = [by_key[aid][i] for i in sorted(by_key[aid])]
        assert sorted(set(labels[:-2])) == [0, 1, 2]
        assert set(labels[-2:]) == {-1}


def test_cluster_per_group_stub_still_works(spark):
    df = spark.createDataFrame(
        [("a", 0, [0.0, 0.0]), ("a", 1, [0.1, 0.0]), ("a", 2, [9.0, 9.0])],
        "audio_id string, chunk_idx long, embedding array<double>",
    )
    out = {r.chunk_idx: r.label for r in cluster_per_group(df).collect()}
    assert out[0] == out[1] != out[2]
