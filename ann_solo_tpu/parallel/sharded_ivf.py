"""ICI-sharded IVF search: inverted lists partitioned across devices.

The 100M+-vector regime from BASELINE.md: the list-major padded IVF
storage (index/ivf.py) is sharded over the 'lib' mesh axis by *list* --
each device owns a contiguous slice of lists (and their member vectors),
centroids are replicated.  A query tile broadcasts over ICI; every shard
scans the probed lists it owns with blocked MXU matmuls, takes a local
top-k, and the per-shard candidates merge with one all-gather of k entries
per query -- communication O(k), independent of library size.

Query-side data parallelism rides the 'dp' axis unchanged.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ann_solo_tpu.index.ivf import (
    _canonical_topk,
    _dedup_topk,
    _pad_topk,
    _scan_queries,
)

logger = logging.getLogger(__name__)


def _local_ivf_scan(
    queries,  # (B_l, D) local query tile
    query_prec,  # (B_l,) precursor m/z (ignored unless tol_val > 0)
    padded_vectors,  # (L_l, P, D) lists owned by this shard
    padded_ids,  # (L_l, P) global row ids, -1 padded
    padded_prec,  # (L_l, P) precursor m/z per stored vector
    padded_scales,  # (L_l, P) int8 dequantization scales (1s otherwise)
    centroids,  # (L, D) replicated
    num_probe: int,
    k: int,
    lists_per_shard: int,
    charge: float,
    tol_val: float,
    tol_mode: str,
    list_axes: Tuple[str, ...] = ("lib",),
    list_axis_sizes: Tuple[int, ...] = (1,),
    k_scan: int = 0,  # pre-dedup width for redundant storage (0 = k)
):
    l_total = centroids.shape[0]
    b = queries.shape[0]
    coarse = jnp.dot(
        queries, centroids.T, preferred_element_type=jnp.float32
    )  # (B, L)
    _, probe_ids = jax.lax.top_k(coarse, min(num_probe, l_total))
    probed = jnp.zeros((b, l_total), bool)
    rows = jnp.arange(b)[:, None]
    probed = probed.at[rows, probe_ids].set(True)
    # This shard owns lists [shard * L_l, (shard+1) * L_l).  With
    # multi-axis list sharding (('dcn', 'lib') on multi-slice systems)
    # the flat shard index is row-major over the named axes.
    shard = jax.lax.axis_index(list_axes[0])
    for name, size in zip(list_axes[1:], list_axis_sizes[1:]):
        shard = shard * size + jax.lax.axis_index(name)
    local_probed = jax.lax.dynamic_slice(
        probed, (0, shard * lists_per_shard), (b, lists_per_shard)
    )  # (B, L_l)

    l_l, p, d = padded_vectors.shape
    cast = padded_vectors.dtype != jnp.float32
    if padded_vectors.dtype == jnp.int8:
        padded_vectors = padded_vectors.astype(jnp.bfloat16)
    scores = jnp.einsum(
        "qd,lpd->qlp", _scan_queries(queries, cast), padded_vectors,
        preferred_element_type=jnp.float32,
    )  # (B, L_l, P)
    scores = scores * padded_scales[None, :, :]
    mask = local_probed[:, :, None] & (padded_ids >= 0)[None, :, :]
    if tol_val > 0:
        # Precursor window fused into the shard-local scan mask (same
        # semantics as the single-chip index, ivf._ivf_search_tile).
        if tol_mode == "Da":
            mask &= (
                jnp.abs(query_prec[:, None, None] - padded_prec[None])
                * charge
                <= tol_val
            )
        else:
            mask &= (
                jnp.abs(query_prec[:, None, None] - padded_prec[None])
                / jnp.maximum(padded_prec[None], 1e-6) * 1e6
                <= tol_val
            )
    scores = jnp.where(mask, scores, -jnp.inf).reshape(b, l_l * p)
    flat_ids = jnp.broadcast_to(
        padded_ids.reshape(-1)[None, :], (b, l_l * p)
    )
    # With redundant storage (index.redundancy > 1) a vector's copies may
    # live on different shards (or the same one): keep k_scan = R * k
    # entries through the local selection, then dedup ids.
    k_scan = max(k_scan, k)
    k_local = min(k_scan, l_l * p)
    # Canonical ranking (ivf._canonical_topk): lanes are in shard-local
    # list-major order == global position order within the shard, and
    # the shard-major all-gather merge below preserves that order
    # across shards, so stable top-k tie-breaks match the single-device
    # regimes exactly (the sharded == single-device identity test).
    local_scores, pos = _canonical_topk(scores, k_local, cast)
    local_ids = jnp.take_along_axis(flat_ids, pos, axis=1)
    # Merge per-shard top-k over ICI.
    # O(k) merge: one all-gather per list axis (DCN leg last and tiny
    # on multi-slice meshes -- k entries per query per slice).
    all_scores = jax.lax.all_gather(local_scores, list_axes, axis=0)
    all_ids = jax.lax.all_gather(local_ids, list_axes, axis=0)
    s = all_scores.shape[0]
    merged_scores = jnp.transpose(all_scores, (1, 0, 2)).reshape(
        b, s * k_local
    )
    merged_ids = jnp.transpose(all_ids, (1, 0, 2)).reshape(b, s * k_local)
    top_scores, top_pos = jax.lax.top_k(
        merged_scores, min(k_scan, s * k_local)
    )
    top_ids = jnp.take_along_axis(merged_ids, top_pos, axis=1)
    top_ids = jnp.where(top_scores > -jnp.inf, top_ids, -1)
    if k_scan > k or top_scores.shape[1] > k:
        top_scores, top_ids = _dedup_topk(top_scores, top_ids, k)
    top_scores, top_ids = _pad_topk(top_scores, top_ids, k)
    return top_ids, top_scores


@partial(jax.jit, static_argnums=(0, 8, 9, 10, 11, 12, 13, 14))
def _sharded_ivf_impl(
    mesh, queries, query_prec, padded_vectors, padded_ids, padded_prec,
    padded_scales, centroids,
    num_probe: int, k: int, lists_per_shard: int,
    charge: float, tol_val: float, tol_mode: str,
    k_scan: int = 0,
):
    in_specs = [
        P("dp", None),  # queries
        P("dp"),  # query precursor m/z
        P("lib", None, None),  # lists
        P("lib", None),  # ids
        P("lib", None),  # stored precursor m/z
        P("lib", None),  # dequantization scales
        P(None, None),  # centroids replicated
    ]
    args = [
        queries, query_prec, padded_vectors, padded_ids, padded_prec,
        padded_scales, centroids,
    ]
    body = partial(
        _local_ivf_scan,
        num_probe=num_probe,
        k=k,
        lists_per_shard=lists_per_shard,
        charge=charge,
        tol_val=tol_val,
        tol_mode=tol_mode,
        k_scan=k_scan,
    )
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )
    return fn(*args)


@partial(jax.jit, static_argnums=(0, 3))
def _sharded_kmeans_fit(mesh, vectors_sharded, init_centroids, n_iter: int):
    """Spherical k-means with training rows sharded over the whole mesh:
    every update is shard-local segment sums + one psum (sharded.py);
    centroids stay replicated.  One jitted program for all iterations."""
    from ann_solo_tpu.parallel.sharded import sharded_kmeans_step

    def body(_, centroids):
        return sharded_kmeans_step(mesh, vectors_sharded, centroids)

    return jax.lax.fori_loop(0, n_iter, body, init_centroids)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _list_axes(mesh: Mesh) -> Tuple[str, ...]:
    """The mesh axes lists shard over: ('dcn', 'lib') on multi-slice
    meshes (row-major, matching `_local_ivf_scan`'s flat shard index),
    ('lib',) otherwise."""
    return tuple(a for a in ("dcn", "lib") if a in mesh.axis_names)


def _n_list_shards(mesh: Mesh) -> int:
    n = 1
    for a in _list_axes(mesh):
        n *= mesh.shape[a]
    return n


def _list_spec(mesh: Mesh, n_trailing: int) -> P:
    axes = _list_axes(mesh)
    return P(axes if len(axes) > 1 else axes[0], *([None] * n_trailing))


def _place_lib_blocks(mesh: Mesh, blocks, spec: P):
    """Assemble a global array sharded over the list axes from per-shard
    host blocks, placing each block straight onto its devices (dp
    replicas get copies) -- the full array never exists on one device or
    as one host buffer beyond the input list.

    On a ('dcn', 'dp', 'lib') mesh block `i` lands on the devices whose
    (dcn, lib) coordinates flatten row-major to `i`: slice-local blocks
    go to slice-local chips, so the placement uploads are host->ICI
    within each slice and nothing crosses DCN at build time."""
    global_shape = (
        len(blocks) * blocks[0].shape[0],
    ) + blocks[0].shape[1:]
    sharding = NamedSharding(mesh, spec)
    names = mesh.axis_names
    la = _list_axes(mesh)
    buffers = []
    for idx in np.ndindex(mesh.devices.shape):
        shard = 0
        for a in la:
            shard = shard * mesh.shape[a] + idx[names.index(a)]
        buffers.append(
            jax.device_put(blocks[shard], mesh.devices[idx])
        )
    return jax.make_array_from_single_device_arrays(
        global_shape, sharding, buffers
    )


class ShardedIvfIndex:
    """A host IvfIndex with its blocks placed once across the mesh."""

    def __init__(self, mesh: Mesh, index):
        n_lists = index.padded_vectors.shape[0]
        n_shards = _n_list_shards(mesh)
        if n_lists % n_shards != 0:
            raise ValueError(
                f"num_list={n_lists} must divide list shards={n_shards}"
            )
        self.mesh = mesh
        self.num_probe = index.num_probe
        self.redundancy = getattr(index, "redundancy", 1)
        self.lists_per_shard = n_lists // n_shards
        self.vectors_s = jax.device_put(
            jnp.asarray(index.padded_vectors),
            NamedSharding(mesh, _list_spec(mesh, 2)),
        )
        self.ids_s = jax.device_put(
            jnp.asarray(index.padded_ids),
            NamedSharding(mesh, _list_spec(mesh, 1)),
        )
        self.prec_s = jax.device_put(
            jnp.asarray(index.padded_prec, jnp.float32),
            NamedSharding(mesh, _list_spec(mesh, 1)),
        )
        self.scales_s = jax.device_put(
            jnp.asarray(index.padded_scales, jnp.float32),
            NamedSharding(mesh, _list_spec(mesh, 1)),
        )
        self.centroids_s = jax.device_put(
            jnp.asarray(index.centroids, jnp.float32),
            NamedSharding(mesh, P()),
        )

    @classmethod
    def build_sharded(
        cls,
        mesh: Mesh,
        vectors: np.ndarray,  # (N, D) host rows (RAM/stream-bound)
        config,
        precursor_mz=None,
        seed: int = 42,
        storage_dtype=None,
        redundancy=None,
        centroids=None,
        n_iter: int = 25,
    ) -> "ShardedIvfIndex":
        """Build an index that is BORN sharded over the 'lib' mesh axis
        (BASELINE.md north star: 100M+ vectors sharded over ICI "for
        both index build and query" -- a 100M x 800 bf16 block is
        ~160 GB and can never exist on one chip even transiently).

        * k-means trains on a FAISS-subsampled row set sharded over the
          WHOLE mesh: per-shard segment sums + one psum per iteration
          (`_sharded_kmeans_fit`); centroids replicate (L x D is small).
        * top-A assignment runs in fixed row blocks on the default
          device; only the (N, A) int32 choices ever accumulate.
        * balanced (redundant) placement reuses `plan_assignments` --
          byte-identical placement to the single-device build given the
          same centroids (tests/test_sharded_build.py pins this).
        * each shard's (L_l, cap, D) block is packed separately and
          placed straight onto its devices: no device holds more than
          one shard block at any point.

        The host feeds rows (vectors live in host RAM or stream from
        disk); device memory is bounded by one shard block + one row
        chunk.  Reference analog: FAISS train/add,
        spectral_library.py:163-181 (single-GPU only).
        """
        import ml_dtypes

        from ann_solo_tpu.index.ivf import (
            _pack_lists,
            ivf_build_params,
            plan_assignments,
            resolve_soar_lambda,
        )
        from ann_solo_tpu.ops.kmeans import assign_topk_blocked

        if storage_dtype is None:
            storage_dtype = ml_dtypes.bfloat16
        from ann_solo_tpu.index.ivf import resolve_num_list

        num_list = resolve_num_list(
            int(config.num_list), int(np.shape(vectors)[0])
        )
        if redundancy is None:
            try:
                redundancy = int(config.ivf_redundancy)
            except (KeyError, AttributeError):
                redundancy = 2
        # On a ('dcn', 'dp', 'lib') multi-slice mesh, lists shard over
        # the combined ('dcn', 'lib') axes: each slice's chips pack and
        # hold their own contiguous list range, placement uploads stay
        # within the slice (host->ICI), and only the O(L x D) centroid
        # psum of k-means training crosses DCN during the build.
        lib_shards = _n_list_shards(mesh)
        if num_list % lib_shards != 0:
            raise ValueError(
                f"num_list={num_list} must divide list shards={lib_shards}"
            )
        vectors = np.asarray(vectors)
        n, d = vectors.shape
        soar_lambda = resolve_soar_lambda(config)
        r_eff, cap, n_choices = ivf_build_params(
            n, num_list, redundancy, soar_lambda
        )
        if centroids is None:
            centroids = cls._train_centroids_sharded(
                mesh, vectors, num_list, seed, n_iter
            )
        centroids = np.asarray(centroids, np.float32)

        # Assignment in fixed row blocks (bounded device memory; only
        # the (N, A) int32 choices accumulate on the host).  The SOAR
        # round-2 re-rank runs in the same blocks -- identical inputs
        # and math as the single-device build, so placement stays
        # byte-identical (tests/test_sharded_build.py).
        centroids_d = jnp.asarray(centroids)
        block = 1 << 16
        choices = np.concatenate([
            np.asarray(assign_topk_blocked(
                jnp.asarray(vectors[start : start + block]),
                centroids_d, n_choices,
            ))
            for start in range(0, n, block)
        ])
        round_choices = None
        if soar_lambda > 0.0 and r_eff >= 2:
            from ann_solo_tpu.ops.kmeans import soar_round2_choices

            second = np.concatenate([
                np.asarray(soar_round2_choices(
                    jnp.asarray(vectors[start : start + block]),
                    centroids_d,
                    jnp.asarray(choices[start : start + block]),
                    soar_lambda,
                ))
                for start in range(0, n, block)
            ])
            round_choices = [second] + [None] * max(0, r_eff - 2)
        flat_slot, row_ids, spilled, _ = plan_assignments(
            choices, num_list, cap, r_eff, round_choices=round_choices
        )
        logger.debug(
            "Sharded IVF build: %d lists (cap %d, x%d), %d spilled",
            num_list, cap, r_eff, spilled,
        )

        lists_per_shard = num_list // lib_shards
        slot_span = lists_per_shard * cap
        prec = (
            np.asarray(precursor_mz, np.float32)
            if precursor_mz is not None else None
        )
        vec_blocks, ids_blocks, prec_blocks, scale_blocks = [], [], [], []
        for s_idx in range(lib_shards):
            lo = s_idx * slot_span
            m = (flat_slot >= lo) & (flat_slot < lo + slot_span)
            local_slot = flat_slot[m] - lo
            local_rows = row_ids[m]
            uniq, inv = np.unique(local_rows, return_inverse=True)
            # Pad entry/row counts to power-of-two buckets: one compiled
            # _pack_lists variant per bucket, not per shard.
            m_pad = _next_pow2(max(1, len(local_slot)))
            local_slot = np.concatenate(
                [local_slot, np.full(m_pad - len(local_slot), -1)]
            )
            inv = np.concatenate(
                [inv, np.zeros(m_pad - len(inv), inv.dtype)]
            ).astype(np.int32)
            u_pad = _next_pow2(max(1, len(uniq)))
            sub = np.zeros((u_pad, d), np.float32)
            sub[: len(uniq)] = vectors[uniq]
            ids_flat, packed, scales = _pack_lists(
                jnp.asarray(sub), jnp.asarray(local_slot),
                jnp.asarray(inv), lists_per_shard, cap,
                jnp.dtype(storage_dtype),
            )
            ids_flat = np.asarray(ids_flat)
            gids = np.where(
                ids_flat >= 0,
                uniq[np.clip(ids_flat, 0, len(uniq) - 1)],
                -1,
            ).astype(np.int32)
            pr = (
                np.where(
                    gids >= 0, prec[np.clip(gids, 0, n - 1)], 0.0
                ).astype(np.float32)
                if prec is not None
                else np.zeros_like(gids, np.float32)
            )
            vec_blocks.append(np.asarray(packed))
            ids_blocks.append(gids.reshape(lists_per_shard, cap))
            prec_blocks.append(pr.reshape(lists_per_shard, cap))
            scale_blocks.append(
                np.asarray(scales).reshape(lists_per_shard, cap)
            )

        index = cls.__new__(cls)
        index.mesh = mesh
        index.num_probe = int(config.num_probe)
        index.redundancy = r_eff
        index.lists_per_shard = lists_per_shard
        index.vectors_s = _place_lib_blocks(
            mesh, vec_blocks, _list_spec(mesh, 2)
        )
        index.ids_s = _place_lib_blocks(
            mesh, ids_blocks, _list_spec(mesh, 1)
        )
        index.prec_s = _place_lib_blocks(
            mesh, prec_blocks, _list_spec(mesh, 1)
        )
        index.scales_s = _place_lib_blocks(
            mesh, scale_blocks, _list_spec(mesh, 1)
        )
        index.centroids_s = jax.device_put(
            jnp.asarray(centroids), NamedSharding(mesh, P())
        )
        return index

    @staticmethod
    def _train_centroids_sharded(
        mesh: Mesh, vectors: np.ndarray, num_list: int, seed: int,
        n_iter: int,
    ) -> np.ndarray:
        """Sharded spherical k-means on a FAISS-style subsample."""
        from ann_solo_tpu.index.ivf import _TRAIN_POINTS_PER_CENTROID

        n = len(vectors)
        cap_train = num_list * _TRAIN_POINTS_PER_CENTROID
        rng = np.random.RandomState(seed + 1)
        if n > cap_train:
            rows = np.sort(rng.choice(n, size=cap_train, replace=False))
            train = vectors[rows]
        else:
            train = vectors
        rng_init = np.random.RandomState(seed)
        init_rows = rng_init.choice(
            len(train), size=min(num_list, len(train)), replace=False
        )
        init = np.asarray(train[init_rows], np.float32)
        if len(init) < num_list:
            reps = -(-num_list // len(init))
            init = np.tile(init, (reps, 1))[:num_list]
            init = init + rng_init.normal(0, 1e-4, init.shape).astype(
                np.float32
            )
        init /= np.maximum(
            np.linalg.norm(init, axis=1, keepdims=True), 1e-30
        )
        # Zero-pad rows to the mesh size (zero rows carry weight 0).
        n_pad = -(-len(train) // mesh.size) * mesh.size
        if n_pad != len(train):
            train = np.concatenate(
                [train, np.zeros((n_pad - len(train), train.shape[1]),
                                 train.dtype)]
            )
        train_s = jax.device_put(
            jnp.asarray(train, jnp.float32),
            NamedSharding(mesh, P(tuple(mesh.axis_names), None)),
        )
        init_s = jax.device_put(
            jnp.asarray(init), NamedSharding(mesh, P())
        )
        return np.asarray(
            _sharded_kmeans_fit(mesh, train_s, init_s, n_iter)
        )

    def search(
        self,
        queries: np.ndarray,
        k: int,
        num_probe: int = 0,
        q_prec=None,
        charge: float = 1.0,
        tol_val: float = 0.0,
        tol_mode: str = "Da",
    ) -> np.ndarray:
        ids, _ = self.search_with_scores(
            queries, k, num_probe, q_prec, charge, tol_val, tol_mode
        )
        return ids

    def search_with_scores(
        self,
        queries: np.ndarray,
        k: int,
        num_probe: int = 0,
        q_prec=None,
        charge: float = 1.0,
        tol_val: float = 0.0,
        tol_mode: str = "Da",
    ) -> Tuple[np.ndarray, np.ndarray]:
        ids, scores = self.search_device(
            queries, k, num_probe, q_prec, charge, tol_val, tol_mode
        )
        return np.asarray(ids), np.asarray(scores)

    def search_device(
        self,
        queries,
        k: int,
        num_probe: int = 0,
        q_prec=None,
        charge: float = 1.0,
        tol_val: float = 0.0,
        tol_mode: str = "Da",
    ):
        """Sharded search returning global DEVICE arrays (dp-sharded):
        downstream device-side rescoring consumes them without a host
        round trip.  `queries` may be NumPy or an (already dp-sharded)
        device array."""
        num_probe = int(num_probe or self.num_probe)
        b = len(queries)
        if b == 0:
            return (
                jnp.zeros((0, k), jnp.int32),
                jnp.zeros((0, k), jnp.float32),
            )
        if q_prec is None:
            q_prec = np.zeros(b, np.float32)
            tol_val = 0.0
        dp = self.mesh.shape["dp"]
        b_pad = -(-b // dp) * dp
        queries_d = jnp.asarray(queries, jnp.float32)
        q_prec_d = jnp.asarray(q_prec, jnp.float32)
        if b_pad != b:
            queries_d = jnp.pad(queries_d, ((0, b_pad - b), (0, 0)))
            q_prec_d = jnp.pad(q_prec_d, (0, b_pad - b))
        queries_s = jax.device_put(
            queries_d, NamedSharding(self.mesh, P("dp", None))
        )
        q_prec_s = jax.device_put(
            q_prec_d, NamedSharding(self.mesh, P("dp"))
        )
        impl = (
            _multislice_ivf_impl if "dcn" in self.mesh.axis_names
            else _sharded_ivf_impl
        )
        ids, scores = impl(
            self.mesh, queries_s, q_prec_s,
            self.vectors_s, self.ids_s, self.prec_s, self.scales_s,
            self.centroids_s,
            num_probe, k, self.lists_per_shard,
            float(charge), float(tol_val), tol_mode,
            self.redundancy * k,
        )
        return ids[:b], scores[:b]


@partial(jax.jit, static_argnums=(0, 8, 9, 10, 11, 12, 13, 14))
def _multislice_ivf_impl(
    mesh, queries, query_prec, padded_vectors, padded_ids, padded_prec,
    padded_scales, centroids,
    num_probe: int, k: int, lists_per_shard: int,
    charge: float, tol_val: float, tol_mode: str,
    k_scan: int = 0,
):
    """Sharded IVF scan with lists partitioned over ('dcn', 'lib').

    The within-slice merge rides ICI; the across-slice merge is one
    k-entry all-gather on DCN (BASELINE.md 100M+ north star; see
    mesh.make_multislice_mesh for the axis convention)."""
    in_specs = [
        P("dp", None),  # queries (replicated over dcn/lib)
        P("dp"),
        P(("dcn", "lib"), None, None),  # lists over slices x chips
        P(("dcn", "lib"), None),
        P(("dcn", "lib"), None),
        P(("dcn", "lib"), None),  # dequantization scales
        P(None, None),  # centroids replicated
    ]
    args = [
        queries, query_prec, padded_vectors, padded_ids, padded_prec,
        padded_scales, centroids,
    ]
    body = partial(
        _local_ivf_scan,
        num_probe=num_probe,
        k=k,
        lists_per_shard=lists_per_shard,
        charge=charge,
        tol_val=tol_val,
        tol_mode=tol_mode,
        k_scan=k_scan,
        list_axes=("dcn", "lib"),
        list_axis_sizes=(
            mesh.shape["dcn"], mesh.shape["lib"]
        ),
    )
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )
    return fn(*args)


def multislice_ivf_search(
    mesh: Mesh,
    index,
    queries: np.ndarray,
    k: int,
    num_probe: int = 0,
    q_prec=None,
    charge: float = 1.0,
    tol_val: float = 0.0,
    tol_mode: str = "Da",
) -> Tuple[np.ndarray, np.ndarray]:
    """Search an IvfIndex sharded over a ('dcn', 'dp', 'lib') mesh."""
    num_probe = int(num_probe or index.num_probe)
    n_lists = index.padded_vectors.shape[0]
    n_shards = mesh.shape["dcn"] * mesh.shape["lib"]
    if n_lists % n_shards != 0:
        raise ValueError(
            f"num_list={n_lists} must divide {n_shards} list shards"
        )
    b = len(queries)
    queries = np.asarray(queries, np.float32)
    if q_prec is None:
        q_prec = np.zeros(b, np.float32)
        tol_val = 0.0
    q_prec = np.asarray(q_prec, np.float32)
    dp = mesh.shape["dp"]
    b_pad = -(-b // dp) * dp
    if b_pad != b:
        queries = np.concatenate(
            [queries, np.zeros((b_pad - b, queries.shape[1]), np.float32)]
        )
        q_prec = np.concatenate([q_prec, np.zeros(b_pad - b, np.float32)])
    list_spec = NamedSharding(mesh, P(("dcn", "lib"), None, None))
    ids, scores = _multislice_ivf_impl(
        mesh,
        jax.device_put(
            jnp.asarray(queries), NamedSharding(mesh, P("dp", None))
        ),
        jax.device_put(
            jnp.asarray(q_prec), NamedSharding(mesh, P("dp"))
        ),
        jax.device_put(jnp.asarray(index.padded_vectors), list_spec),
        jax.device_put(
            jnp.asarray(index.padded_ids),
            NamedSharding(mesh, P(("dcn", "lib"), None)),
        ),
        jax.device_put(
            jnp.asarray(index.padded_prec, jnp.float32),
            NamedSharding(mesh, P(("dcn", "lib"), None)),
        ),
        jax.device_put(
            jnp.asarray(index.padded_scales, jnp.float32),
            NamedSharding(mesh, P(("dcn", "lib"), None)),
        ),
        jax.device_put(
            jnp.asarray(index.centroids, jnp.float32),
            NamedSharding(mesh, P()),
        ),
        num_probe, k, n_lists // n_shards,
        float(charge), float(tol_val), tol_mode,
        getattr(index, "redundancy", 1) * k,
    )
    return np.asarray(ids)[:b], np.asarray(scores)[:b]


def sharded_ivf_search(
    mesh: Mesh,
    index,
    queries: np.ndarray,
    k: int,
    num_probe: int = 0,
    q_prec=None,
    charge: float = 1.0,
    tol_val: float = 0.0,
    tol_mode: str = "Da",
) -> Tuple[np.ndarray, np.ndarray]:
    """Search a (host) IvfIndex with its lists sharded over the mesh.

    Returns ((B, k) global row ids, (B, k) scores).  The number of lists
    must divide the 'lib' mesh axis size; pad `num_list` accordingly at
    build time.  Convenience wrapper over ShardedIvfIndex (which callers
    should hold directly to keep the placed blocks resident).
    """
    return ShardedIvfIndex(mesh, index).search_with_scores(
        queries, k, num_probe, q_prec, charge, tol_val, tol_mode
    )
