"""Probe-gather streaming scan kernel (`ops/ivf_probe_pallas.py`).

Interpret-mode functional checks on the CPU backend.  This kernel is
the EXACT big-library select path: it runs no in-kernel selection, so
its contract is strict bit-identity with `_ivf_search_perquery` (same
canonical bf16-key ranking, same dedup) with ZERO certificate flags.
Hardware parity re-runs on the real chip via `scale_demo.py` / the
bench self-match gate -- interpret-mode passing does NOT imply
hardware correctness.
"""

import numpy as np

import jax.numpy as jnp

from ann_solo_tpu.index.ivf import IvfIndex, _ivf_search_perquery
from tests.test_ivf import IvfConfig, _clustered_vectors
from tests.test_ivf_pallas import _assert_same_up_to_boundary_ties


def _force_probe(monkeypatch, ivf_mod):
    monkeypatch.setattr(ivf_mod, "_FULLSCAN_TRANSIENT", 0)
    monkeypatch.setenv("ANN_SOLO_TPU_PROBE_PALLAS", "force")
    monkeypatch.setenv("ANN_SOLO_TPU_CHUNKED_PALLAS", "0")


def test_probe_e2e_dispatch_forced(monkeypatch):
    """`search` with ANN_SOLO_TPU_PROBE_PALLAS=force must route
    chunked-regime searches through the probe-gather kernel (interpret
    on CPU), return the same candidate sets as the fullscan regime,
    and flag NOTHING (the path is exact by construction)."""
    from ann_solo_tpu.index import ivf as ivf_mod

    rng = np.random.default_rng(97)
    n, d, l = 5400, 128, 64  # cap lands exactly on 128
    vectors = _clustered_vectors(rng, n=n, d=d, n_clusters=16)
    prec = np.sort(rng.uniform(400, 1200, n)).astype(np.float32)
    index = IvfIndex.build(
        vectors, IvfConfig(num_list=l, num_probe=16), redundancy=1,
        precursor_mz=prec,
    )
    assert index.padded_vectors.shape[1] % 128 == 0
    b, k = 96, 32
    rows = rng.choice(n, b, replace=False)
    queries = vectors[rows] + 0.05 * rng.normal(size=(b, d)).astype(
        np.float32
    )
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    q_prec = prec[rows].copy()

    want, want_s = index.search_with_scores(
        queries, k, num_probe=16, q_prec=q_prec, charge=2.0,
        tol_val=50.0, tol_mode="Da",
    )  # fullscan regime
    _force_probe(monkeypatch, ivf_mod)
    index._device = None  # re-upload with the chunked-regime D padding
    got = index.search(
        queries, k, num_probe=16, q_prec=q_prec, charge=2.0,
        tol_val=50.0, tol_mode="Da",
    )
    assert index._last_chunked_flagged == 0
    for qq in range(b):
        _assert_same_up_to_boundary_ties(
            got[qq], want[qq], want_s[qq], qq
        )


def test_probe_e2e_redundant_and_ragged_d(monkeypatch):
    """x2 redundant storage (prev-table dedup on the probe path) plus a
    D that needs device padding (100 -> 128): candidate sets must match
    the fullscan regime, zero flags."""
    from ann_solo_tpu.index import ivf as ivf_mod

    rng = np.random.default_rng(101)
    n, d, l = 2700, 100, 64  # cap = 128 at R=2; d needs padding
    vectors = _clustered_vectors(rng, n=n, d=d, n_clusters=16)
    index = IvfIndex.build(
        vectors, IvfConfig(num_list=l, num_probe=16), redundancy=2,
    )
    assert index.padded_vectors.shape[1] % 128 == 0
    b, k = 64, 16
    rows = rng.choice(n, b, replace=False)
    queries = vectors[rows] + 0.05 * rng.normal(size=(b, d)).astype(
        np.float32
    )
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    want, want_s = index.search_with_scores(queries, k, num_probe=16)
    _force_probe(monkeypatch, ivf_mod)
    index._device = None
    assert index.device_dim == 128  # ragged 100 -> 128 pad
    got = index.search(queries, k, num_probe=16)
    assert index._last_chunked_flagged == 0
    for qq in range(b):
        _assert_same_up_to_boundary_ties(
            got[qq], want[qq], want_s[qq], qq
        )


def test_probe_identity_vs_perquery_tie_heavy(monkeypatch):
    """THE contract test: on tie-saturated int8 data the forced probe
    path must return ids AND scores bit-identical to
    `_ivf_search_perquery` -- not merely up to ties.  The kernel writes
    raw masked scores and the SAME `_canonical_topk` ranks them, so any
    mismatch is a lane-order or masking bug."""
    from ann_solo_tpu.index import ivf as ivf_mod

    rng = np.random.default_rng(107)
    n, d, l = 5400, 128, 64
    vectors = (rng.integers(-4, 5, size=(n, d)) / 8.0).astype(
        np.float32
    )
    index = IvfIndex.build(
        vectors, IvfConfig(num_list=l, num_probe=16), redundancy=1,
        storage_dtype=np.int8,
    )
    assert index.padded_vectors.shape[1] % 128 == 0
    b, k, p = 128, 32, 16
    queries = (rng.integers(-32, 33, size=(b, d)) / 64.0).astype(
        np.float32
    )

    _force_probe(monkeypatch, ivf_mod)
    index._device = None
    got_ids, got_s = index.search_with_scores(
        queries, k, num_probe=p, charge=2.0,
    )
    assert index._last_chunked_flagged == 0
    vecs_d, ids_d, prec_d, scales_d, cents_d = index.device_arrays()
    qd = jnp.asarray(queries, jnp.float32)
    dp = vecs_d.shape[-1]
    if qd.shape[-1] != dp:
        qd = jnp.pad(qd, ((0, 0), (0, dp - qd.shape[-1])))
    want_s, want_ids = _ivf_search_perquery(
        vecs_d, ids_d, prec_d, scales_d, cents_d,
        qd, jnp.zeros(b, jnp.float32), jnp.float32(2.0),
        p, k, k, 0.0, "Da", False,
    )
    np.testing.assert_array_equal(
        np.asarray(got_ids), np.asarray(want_ids)
    )
    np.testing.assert_array_equal(
        np.asarray(got_s), np.asarray(want_s)
    )


def test_probe_identity_redundant_window(monkeypatch):
    """Bit-identity vs the per-query oracle WITH x2 redundancy and a
    precursor window -- the full production configuration."""
    from ann_solo_tpu.index import ivf as ivf_mod

    rng = np.random.default_rng(113)
    n, d, l = 4000, 128, 64
    vectors = (rng.integers(-4, 5, size=(n, d)) / 8.0).astype(
        np.float32
    )
    prec = np.sort(rng.uniform(400, 1200, n)).astype(np.float32)
    index = IvfIndex.build(
        vectors, IvfConfig(num_list=l, num_probe=16), redundancy=2,
        storage_dtype=np.int8, precursor_mz=prec,
    )
    b, k, p = 64, 16, 16
    rows = rng.choice(n, b, replace=False)
    queries = (rng.integers(-32, 33, size=(b, d)) / 64.0).astype(
        np.float32
    )
    q_prec = prec[rows].copy()

    _force_probe(monkeypatch, ivf_mod)
    index._device = None
    got_ids, got_s = index.search_with_scores(
        queries, k, num_probe=p, q_prec=q_prec, charge=2.0,
        tol_val=50.0, tol_mode="Da",
    )
    assert index._last_chunked_flagged == 0
    vecs_d, ids_d, prec_d, scales_d, cents_d = index.device_arrays()
    qd = jnp.asarray(queries, jnp.float32)
    dp = vecs_d.shape[-1]
    if qd.shape[-1] != dp:
        qd = jnp.pad(qd, ((0, 0), (0, dp - qd.shape[-1])))
    k_scan = index.redundancy * k
    want_s, want_ids = _ivf_search_perquery(
        vecs_d, ids_d, prec_d, scales_d, cents_d,
        qd, jnp.asarray(q_prec, jnp.float32), jnp.float32(2.0),
        p, k, k_scan, 50.0, "Da", index.redundancy > 1,
    )
    np.testing.assert_array_equal(
        np.asarray(got_ids), np.asarray(want_ids)
    )
    np.testing.assert_array_equal(
        np.asarray(got_s), np.asarray(want_s)
    )


def test_probe_table_smem_budget():
    """The (B, P) int32 probe table is a scalar-prefetched SMEM operand
    (~1 MB/core); the support check must reject tiles over the budget
    and `probe_scan_max_queries` must return the largest viable pow2
    tile (round-5 regression: B=1024 x P=256 = 1 MB OOMed the core)."""
    import numpy as np

    from ann_solo_tpu.ops.ivf_probe_pallas import (
        _SMEM_PREFETCH_BUDGET,
        probe_scan_max_queries,
        probe_scan_supported,
    )

    p = 256
    b_max = probe_scan_max_queries(p)
    assert b_max * p * 4 <= _SMEM_PREFETCH_BUDGET
    assert 2 * b_max * p * 4 > _SMEM_PREFETCH_BUDGET
    # The round-5 failing shape: rejected at B=1024, accepted at b_max.
    assert not probe_scan_supported(
        16384, 256, 896, p, 1024, np.dtype(np.int8), 1024
    )
    assert probe_scan_supported(
        16384, 256, 896, p, 1024, np.dtype(np.int8), b_max
    )
