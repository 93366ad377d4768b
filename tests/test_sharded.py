"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from ann_solo_tpu.index.ivf import bruteforce_search
from ann_solo_tpu.parallel.mesh import make_mesh, pad_to_multiple
from ann_solo_tpu.parallel.sharded import (
    sharded_kmeans_step,
    sharded_search_step,
    sharded_topk_search,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices("cpu")) >= 8, "conftest must force 8 CPU devices"
    return make_mesh(8)


def _library(rng, n=1024, d=64):
    vectors = rng.normal(size=(n, d)).astype(np.float32)
    vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)
    prec = rng.uniform(400, 1200, n).astype(np.float32)
    return vectors, prec


def test_mesh_shape(mesh):
    assert mesh.shape["dp"] * mesh.shape["lib"] == 8


def test_sharded_topk_matches_single_device(mesh):
    rng = np.random.default_rng(3)
    vectors, prec = _library(rng)
    queries, q_prec = _library(rng, n=64)
    k = 16
    ids, scores = sharded_topk_search(
        mesh, vectors, prec, queries, q_prec, k, charge=2.0, tol=1e6
    )
    ids = np.asarray(ids)
    # With an unbounded window this must equal exact max-IP search.
    exact = bruteforce_search(vectors, queries, k)
    agree = [
        len(set(ids[i]) & set(exact[i])) / k for i in range(len(queries))
    ]
    assert np.mean(agree) > 0.99


def test_sharded_topk_respects_precursor_window(mesh):
    rng = np.random.default_rng(4)
    vectors, prec = _library(rng)
    queries, q_prec = _library(rng, n=64)
    tol = 10.0
    charge = 2.0
    ids, scores = sharded_topk_search(
        mesh, vectors, prec, queries, q_prec, 16, charge=charge, tol=tol
    )
    ids = np.asarray(ids)
    for i in range(len(queries)):
        for j in ids[i][ids[i] >= 0]:
            assert abs(q_prec[i] - prec[j]) * charge <= tol + 1e-3
    # Queries with empty windows return -1 everywhere.
    lonely_prec = np.full(len(queries), 5000.0, np.float32)
    ids2, _ = sharded_topk_search(
        mesh, vectors, prec, queries, lonely_prec, 16, charge, tol
    )
    assert (np.asarray(ids2) == -1).all()


def test_sharded_kmeans_step_matches_host(mesh):
    rng = np.random.default_rng(5)
    vectors, _ = _library(rng, n=2048)
    centroids = vectors[:32].copy()
    new = np.asarray(sharded_kmeans_step(mesh, vectors, centroids))
    # Host oracle.
    ids = np.argmax(vectors @ centroids.T, axis=1)
    sums = np.zeros_like(centroids)
    np.add.at(sums, ids, vectors)
    counts = np.bincount(ids, minlength=32).astype(np.float32)
    expected = np.where(
        counts[:, None] > 0,
        sums / np.maximum(counts[:, None], 1.0),
        centroids,
    )
    expected /= np.maximum(
        np.linalg.norm(expected, axis=1, keepdims=True), 1e-30
    )
    np.testing.assert_allclose(new, expected, atol=1e-5)


def test_full_sharded_step(mesh):
    rng = np.random.default_rng(6)
    vectors, prec = _library(rng, n=1024)
    queries, q_prec = _library(rng, n=64)
    centroids = vectors[:16].copy()
    ids, scores, new_centroids = sharded_search_step(
        mesh, vectors, prec, centroids, queries, q_prec, k=8,
        charge=2.0, tol=1e6,
    )
    assert np.asarray(ids).shape == (64, 8)
    assert np.asarray(new_centroids).shape == (16, 64)
    assert np.isfinite(np.asarray(scores)[np.asarray(ids) >= 0]).all()


def test_pad_to_multiple():
    arr = np.ones((10, 3))
    padded = pad_to_multiple(arr, 8)
    assert padded.shape == (16, 3)
    assert padded[10:].sum() == 0
