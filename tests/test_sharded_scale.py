"""Scale regimes in the SHARDED IVF search path (VERDICT r4 missing #1).

The shard-local scan must dispatch by the same cost model as the
single-chip index: when a shard's local block exceeds the fullscan
transient, the masked one-shot einsum is replaced by the probe-gather
kernel (TPU) or the exact chunked running-merge scan -- with results
bit-identical to the single-device index, which is itself pinned to the
per-query oracle.  Also pins the ADVICE r3 tie-boundary dedup caveat in
the sharded merge and the structural no-big-transient property.
"""

import os

import numpy as np
import pytest

from ann_solo_tpu.index import ivf as ivf_mod
from ann_solo_tpu.index.ivf import IvfIndex
from ann_solo_tpu.parallel import sharded_ivf as sh_mod
from ann_solo_tpu.parallel.mesh import make_mesh
from ann_solo_tpu.parallel.sharded_ivf import ShardedIvfIndex


class Cfg:
    def __init__(self, num_list, num_probe, redundancy=2):
        self.num_list = num_list
        self.num_probe = num_probe
        self.ivf_redundancy = redundancy

    def __getitem__(self, key):
        return getattr(self, key)


def _corpus(rng, n=4096, d=128):
    v = rng.normal(size=(n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    prec = rng.uniform(400, 1200, n).astype(np.float32)
    return v, prec


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, dp_size=2)  # (dp=2, lib=4)


@pytest.fixture()
def small_transient(monkeypatch):
    """Force the scale regimes at test-sized shapes: shrink the
    fullscan-transient bound the dispatch (and the placement-time
    padding decision) reads, and the chunk transient so the chunked
    regime actually runs multiple chunks through the running merge."""
    monkeypatch.setattr(ivf_mod, "_FULLSCAN_TRANSIENT", 1)
    monkeypatch.setattr(ivf_mod, "_CHUNK_TRANSIENT", 1 << 12)


def test_sharded_chunked_regime_identity(mesh, small_transient):
    """Chunked running-merge local scan == single-device results,
    bit-for-bit, window fused, int8 storage."""
    rng = np.random.default_rng(5)
    # Non-128-aligned feature dim: the scale-regime placement must pad
    # vectors, QUERIES, and CENTROIDS consistently (a missing centroid
    # pad shipped briefly in round 5 and was caught by the dryrun).
    v, prec = _corpus(rng, d=72)
    single = IvfIndex.build(
        v, Cfg(32, 12), precursor_mz=prec, storage_dtype=np.int8
    )
    sharded = ShardedIvfIndex(mesh, single)
    assert sharded.scale_regime and sharded.dim == 128
    regime, _, chunk_lists, _ = sharded._regime_params(32, 12, 32)
    assert regime == "chunked" and chunk_lists < sharded.lists_per_shard
    q = v[rng.choice(len(v), 64, replace=False)]
    qp = prec[rng.choice(len(v), 64)]
    ids_c, sc_c = sharded.search_with_scores(
        q, 16, num_probe=12, q_prec=qp, charge=2.0, tol_val=300.0
    )
    ids_s, sc_s = single.search_with_scores(
        q, 16, num_probe=12, q_prec=qp, charge=2.0, tol_val=300.0
    )
    np.testing.assert_array_equal(ids_c, ids_s)
    np.testing.assert_allclose(sc_c, sc_s, rtol=1e-5, atol=1e-6)


def test_sharded_probe_regime_identity(mesh, small_transient, monkeypatch):
    """Probe-gather local scan (Pallas kernel, interpret mode on the CPU
    mesh) == single-device results, bit-for-bit."""
    monkeypatch.setenv("ANN_SOLO_TPU_PROBE_PALLAS", "force")
    rng = np.random.default_rng(7)
    v, prec = _corpus(rng)
    single = IvfIndex.build(
        v, Cfg(32, 12), precursor_mz=prec, storage_dtype=np.int8
    )
    sharded = ShardedIvfIndex(mesh, single)
    regime, w, _, interpret = sharded._regime_params(32, 12, 32)
    assert regime == "probe" and interpret
    # l_l = 8 <= num_probe here: full width, overflow impossible.
    assert w == min(12, sharded.lists_per_shard)
    q = v[rng.choice(len(v), 64, replace=False)]
    qp = prec[rng.choice(len(v), 64)]
    ids_p, sc_p = sharded.search_with_scores(
        q, 16, num_probe=12, q_prec=qp, charge=2.0, tol_val=300.0
    )
    ids_s, sc_s = single.search_with_scores(
        q, 16, num_probe=12, q_prec=qp, charge=2.0, tol_val=300.0
    )
    np.testing.assert_array_equal(ids_p, ids_s)
    np.testing.assert_allclose(sc_p, sc_s, rtol=1e-5, atol=1e-6)
    assert sharded._last_overflow == 0


def test_sharded_probe_single_shard_fast_path(small_transient, monkeypatch):
    """On a single-list-shard mesh the probe regime takes the fast path
    (coarse top-k IS the compaction -- no probed bitmap, no compaction
    sort) and must stay bit-identical to the single-device index."""
    monkeypatch.setenv("ANN_SOLO_TPU_PROBE_PALLAS", "force")
    rng = np.random.default_rng(23)
    v, prec = _corpus(rng)
    single = IvfIndex.build(
        v, Cfg(32, 12), precursor_mz=prec, storage_dtype=np.int8
    )
    mesh1 = make_mesh(2, dp_size=2)  # lib axis size 1: one list shard
    sharded = ShardedIvfIndex(mesh1, single)
    assert sharded.n_list_shards == 1
    regime, w, _, interpret = sharded._regime_params(32, 12, 32)
    assert regime == "probe" and interpret
    assert w == 12  # single shard: full probe width, overflow impossible
    q = v[rng.choice(len(v), 64, replace=False)]
    qp = prec[rng.choice(len(v), 64)]
    ids_p, sc_p = sharded.search_with_scores(
        q, 16, num_probe=12, q_prec=qp, charge=2.0, tol_val=300.0
    )
    ids_s, sc_s = single.search_with_scores(
        q, 16, num_probe=12, q_prec=qp, charge=2.0, tol_val=300.0
    )
    np.testing.assert_array_equal(ids_p, ids_s)
    np.testing.assert_allclose(sc_p, sc_s, rtol=1e-5, atol=1e-6)
    assert sharded._last_overflow == 0


def test_sharded_probe_overflow_repair(mesh, small_transient, monkeypatch):
    """A query whose probed lists CONCENTRATE on one shard beyond the
    static probe width must be flagged and repaired through the exact
    chunked program -- results identical to single-device.

    Engineered: centroids 0..31 (all of shard 0's lists) cluster around
    one direction; a query on that direction probes 24 lists, all local
    to shard 0, far beyond the width ~2 * 24 / 4 = 16."""
    monkeypatch.setenv("ANN_SOLO_TPU_PROBE_PALLAS", "force")
    rng = np.random.default_rng(11)
    d = 128
    num_list = 128  # l_l = 32 per shard
    u = np.zeros(d, np.float32)
    u[0] = 1.0
    cents = rng.normal(size=(num_list, d)).astype(np.float32)
    cents[:32] = u + 0.05 * rng.normal(size=(32, d)).astype(np.float32)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    # Vectors near their centroids (4096 rows, 32 per list).
    v = cents[np.arange(4096) % num_list]
    v = v + 0.1 * rng.normal(size=v.shape).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v = v.astype(np.float32)
    prec = rng.uniform(400, 1200, len(v)).astype(np.float32)
    single = IvfIndex.build(
        v, Cfg(num_list, 24), precursor_mz=prec,
        storage_dtype=np.int8, centroids=cents,
    )
    sharded = ShardedIvfIndex(mesh, single)
    regime, w, _, _ = sharded._regime_params(16, 24, 32)
    assert regime == "probe" and w == 16 < 24
    # Half the queries aim at the concentrated shard, half are benign.
    q = np.concatenate([v[:16], v[2000:2016]])
    qp = np.concatenate([prec[:16], prec[2000:2016]])
    ids_p, sc_p = sharded.search_with_scores(
        q, 16, num_probe=24, q_prec=qp, charge=2.0, tol_val=500.0
    )
    assert sharded._last_overflow > 0  # the repair path actually ran
    ids_s, sc_s = single.search_with_scores(
        q, 16, num_probe=24, q_prec=qp, charge=2.0, tol_val=500.0
    )
    np.testing.assert_array_equal(ids_p, ids_s)
    np.testing.assert_allclose(sc_p, sc_s, rtol=1e-5, atol=1e-6)


def test_sharded_no_fullblock_transient(mesh, small_transient):
    """Structural memory assertion (VERDICT r4 #1): the scale-regime
    local program must not contain ANY (.., L_l * cap) f32 tensor --
    the round-4 sharded scan materialized a (B_l, L_l * cap) score
    transient; the chunked scan's widest score tensor is
    (B_l, chunk_lists * cap)."""
    rng = np.random.default_rng(13)
    v, prec = _corpus(rng)
    single = IvfIndex.build(
        v, Cfg(32, 12), precursor_mz=prec, storage_dtype=np.int8
    )
    sharded = ShardedIvfIndex(mesh, single)
    regime, w, chunk_lists, interpret = sharded._regime_params(32, 12, 32)
    assert regime == "chunked"
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    qt = jax.device_put(
        jnp.zeros((64, sharded.dim), jnp.float32),
        NamedSharding(mesh, P("dp", None)),
    )
    qpt = jax.device_put(
        jnp.zeros((64,), jnp.float32), NamedSharding(mesh, P("dp"))
    )
    lowered = sh_mod._sharded_ivf_impl.lower(
        mesh, qt, qpt,
        sharded.vectors_s, sharded.ids_s, sharded.prec_s,
        sharded.scales_s, sharded.centroids_s,
        12, 16, sharded.lists_per_shard, 2.0, 300.0, "Da",
        32, ("lib",), (4,), regime, w, chunk_lists, interpret,
    ).as_text()
    l_l, cap = sharded.lists_per_shard, sharded.cap
    full_lanes = f"x{l_l * cap}x"  # e.g. "...x3072xf32" transient
    assert full_lanes not in lowered, (
        "scale-regime sharded scan materializes a full local-block "
        "score transient"
    )
    assert f"x{chunk_lists * cap}x" in lowered  # the chunked block IS there


def test_sharded_dedup_tie_boundary(mesh):
    """ADVICE r3 carry-over: with redundant storage, copies of an id
    whose tied scores straddle the post-merge selection boundary must
    never drop the id.  Massive ties (every vector duplicated 32x) make
    every selection boundary a tie; sharded results must still match
    single-device exactly and contain no duplicate ids."""
    rng = np.random.default_rng(17)
    d = 64
    base = rng.normal(size=(8, d)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    v = np.repeat(base, 32, axis=0)  # 256 rows, 8 distinct values
    prec = np.tile(
        rng.uniform(400, 1200, 32).astype(np.float32), 8
    )
    single = IvfIndex.build(
        v, Cfg(8, 8, redundancy=2), precursor_mz=prec,
        storage_dtype=np.float32,
    )
    q = base[rng.choice(8, 32)]
    qp = prec[rng.choice(len(v), 32)]
    for tol in (0.0, 500.0):
        sharded = ShardedIvfIndex(mesh, single)
        ids_sh, _ = sharded.search_with_scores(
            q, 16, num_probe=8, q_prec=qp, charge=2.0, tol_val=tol
        )
        ids_si, _ = single.search_with_scores(
            q, 16, num_probe=8, q_prec=qp, charge=2.0, tol_val=tol
        )
        np.testing.assert_array_equal(ids_sh, ids_si)
        for row in ids_sh:
            real = row[row >= 0]
            assert len(set(real.tolist())) == len(real)  # no dup ids
            assert len(real) == 16  # nothing dropped at the boundary
