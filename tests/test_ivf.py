"""IVF index tests: k-means quality, recall vs brute force, persistence."""

import numpy as np
import pytest

from ann_solo_tpu.index.ivf import IvfIndex, bruteforce_search
from ann_solo_tpu.ops.kmeans import spherical_kmeans


class IvfConfig:
    def __init__(self, num_list=16, num_probe=8):
        self._values = {"num_list": num_list, "num_probe": num_probe}

    def __getattr__(self, key):
        return self._values[key]

    def __getitem__(self, key):
        return self._values[key]


def _clustered_vectors(rng, n=4000, d=64, n_clusters=16):
    """Unit vectors drawn around random cluster directions."""
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assignment = rng.integers(0, n_clusters, n)
    vectors = centers[assignment] + 0.3 * rng.normal(size=(n, d)).astype(
        np.float32
    )
    vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)
    return vectors.astype(np.float32)


def test_kmeans_clusters_unit_sphere():
    rng = np.random.default_rng(3)
    vectors = _clustered_vectors(rng)
    centroids, assignments = spherical_kmeans(vectors, 16, n_iter=15)
    # Centroids are unit norm; assignments match the nearest centroid.
    np.testing.assert_allclose(
        np.linalg.norm(centroids, axis=1), 1.0, rtol=1e-5
    )
    expected = np.argmax(vectors @ centroids.T, axis=1)
    assert (assignments == expected).mean() > 0.999
    # Clustering should beat a random partition on within-cluster score.
    score = (vectors * centroids[assignments]).sum(axis=1).mean()
    random_score = (
        (vectors * centroids[np.random.default_rng(0).integers(0, 16,
                                                               len(vectors))])
        .sum(axis=1).mean()
    )
    assert score > random_score + 0.1


def test_ivf_recall_vs_bruteforce():
    rng = np.random.default_rng(11)
    vectors = _clustered_vectors(rng, n=6000, d=64, n_clusters=32)
    queries = vectors[rng.choice(len(vectors), 300, replace=False)]
    queries = queries + 0.05 * rng.normal(size=queries.shape).astype(
        np.float32
    )
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    k = 32
    exact = bruteforce_search(vectors, queries, k)
    index = IvfIndex.build(vectors, IvfConfig(num_list=32, num_probe=12))
    approx = index.search(queries, k)
    recalls = [
        len(set(exact[i]) & set(approx[i][approx[i] >= 0])) / k
        for i in range(len(queries))
    ]
    # Probing 12/32 lists of clustered data must recover most neighbors.
    assert np.mean(recalls) > 0.8
    # Full probing = exact search.
    full = index.search(queries, k, num_probe=32)
    recalls_full = [
        len(set(exact[i]) & set(full[i][full[i] >= 0])) / k
        for i in range(len(queries))
    ]
    assert np.mean(recalls_full) > 0.999


def test_ivf_persistence(tmp_path):
    rng = np.random.default_rng(5)
    vectors = _clustered_vectors(rng, n=1000, d=32, n_clusters=8)
    index = IvfIndex.build(vectors, IvfConfig(num_list=8, num_probe=4))
    path = str(tmp_path / "test.ivf.h5")
    index.save(path)
    loaded = IvfIndex.load(path, num_probe=4)
    queries = vectors[:50]
    np.testing.assert_array_equal(
        index.search(queries, 10), loaded.search(queries, 10)
    )


def test_ivf_returns_valid_ids():
    rng = np.random.default_rng(7)
    vectors = _clustered_vectors(rng, n=500, d=32, n_clusters=4)
    index = IvfIndex.build(vectors, IvfConfig(num_list=4, num_probe=2))
    ids = index.search(vectors[:20], 600)  # k > n
    assert ids.shape == (20, 600)
    valid = ids[ids >= 0]
    assert valid.max() < 500
    # Each query's own vector should be among its neighbors.
    for i in range(20):
        assert i in set(ids[i][ids[i] >= 0])
