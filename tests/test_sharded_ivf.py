"""Sharded IVF search vs the single-device IVF semantics."""

import numpy as np
import pytest

from ann_solo_tpu.index.ivf import IvfIndex, bruteforce_search
from ann_solo_tpu.parallel.mesh import make_mesh
from ann_solo_tpu.parallel.sharded_ivf import sharded_ivf_search

from test_ivf import IvfConfig, _clustered_vectors


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_sharded_ivf_full_probe_is_exact(mesh):
    rng = np.random.default_rng(21)
    vectors = _clustered_vectors(rng, n=2048, d=64, n_clusters=16)
    index = IvfIndex.build(vectors, IvfConfig(num_list=16, num_probe=16))
    queries = vectors[rng.choice(len(vectors), 64, replace=False)]
    k = 16
    ids, scores = sharded_ivf_search(mesh, index, queries, k, num_probe=16)
    exact = bruteforce_search(vectors, queries, k)
    agree = [
        len(set(ids[i][ids[i] >= 0]) & set(exact[i])) / k
        for i in range(len(queries))
    ]
    assert np.mean(agree) > 0.99


def test_sharded_ivf_partial_probe_recall(mesh):
    rng = np.random.default_rng(22)
    vectors = _clustered_vectors(rng, n=4096, d=64, n_clusters=32)
    index = IvfIndex.build(vectors, IvfConfig(num_list=32, num_probe=12))
    queries = vectors[rng.choice(len(vectors), 64, replace=False)]
    k = 16
    ids, _ = sharded_ivf_search(mesh, index, queries, k)
    exact = bruteforce_search(vectors, queries, k)
    recalls = [
        len(set(ids[i][ids[i] >= 0]) & set(exact[i])) / k
        for i in range(len(queries))
    ]
    assert np.mean(recalls) > 0.75
    # Sharded search uses exact per-query probing, so its recall must be at
    # least that of the single-device tile-union approximation.
    single = index.search(queries, k)
    single_recalls = [
        len(set(single[i][single[i] >= 0]) & set(exact[i])) / k
        for i in range(len(queries))
    ]
    assert np.mean(recalls) >= np.mean(single_recalls) - 0.02
