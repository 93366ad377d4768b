"""Multi-slice ('dcn', 'dp', 'lib') sharded IVF on the virtual mesh.

Validates the DCN-axis collective layout compiles and produces results
identical to the single-slice sharded scan -- the 100M+-vector
multi-slice build story (SURVEY.md §5 long-context analog)."""

import numpy as np
import pytest

from ann_solo_tpu.index.ivf import IvfIndex
from ann_solo_tpu.parallel.mesh import make_mesh, make_multislice_mesh
from ann_solo_tpu.parallel.sharded_ivf import (
    multislice_ivf_search,
    sharded_ivf_search,
)

from test_ivf import IvfConfig, _clustered_vectors


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(61)
    vectors = _clustered_vectors(rng, n=2048, d=64, n_clusters=16)
    prec = rng.uniform(400, 1200, len(vectors)).astype(np.float32)
    index = IvfIndex.build(
        vectors, IvfConfig(num_list=16, num_probe=8), precursor_mz=prec
    )
    queries = vectors[rng.choice(len(vectors), 32, replace=False)]
    q_prec = prec[rng.choice(len(vectors), 32)]
    return index, queries, q_prec


def test_multislice_matches_single_slice(corpus):
    index, queries, q_prec = corpus
    # 2 virtual slices x 4 chips: lists shard over ('dcn', 'lib').
    mesh_ms = make_multislice_mesh(2, 4, dp_size=1)
    mesh_ss = make_mesh(8, dp_size=1)
    ids_ms, scores_ms = multislice_ivf_search(
        mesh_ms, index, queries, 16, q_prec=q_prec, charge=2.0,
        tol_val=200.0,
    )
    ids_ss, scores_ss = sharded_ivf_search(
        mesh_ss, index, queries, 16, q_prec=q_prec, charge=2.0,
        tol_val=200.0,
    )
    np.testing.assert_array_equal(ids_ms, ids_ss)
    np.testing.assert_allclose(scores_ms, scores_ss, rtol=1e-6)


def test_multislice_dp_axis(corpus):
    index, queries, q_prec = corpus
    # Data parallelism within slices: 2 slices x (dp=2, lib=2).
    mesh = make_multislice_mesh(2, 4, dp_size=2)
    ids, _ = multislice_ivf_search(
        mesh, index, queries, 8, q_prec=q_prec, charge=2.0,
        tol_val=200.0,
    )
    assert ids.shape == (32, 8)
    assert (ids >= 0).any(axis=1).all()
