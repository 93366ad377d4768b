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

from ann_solo_tpu.index.ivf import _dedup_topk, _pad_topk


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
    if padded_vectors.dtype == jnp.int8:
        padded_vectors = padded_vectors.astype(jnp.bfloat16)
    scores = jnp.einsum(
        "qd,lpd->qlp", queries, padded_vectors,
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
    # entries through the merge, then dedup ids globally.
    k_scan = max(k_scan, k)
    k_local = min(k_scan, l_l * p)
    local_scores, pos = jax.lax.top_k(scores, k_local)
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
    if top_scores.shape[1] > k:
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
    fn = shard_map(
        partial(
            _local_ivf_scan,
            num_probe=num_probe,
            k=k,
            lists_per_shard=lists_per_shard,
            charge=charge,
            tol_val=tol_val,
            tol_mode=tol_mode,
            k_scan=k_scan,
        ),
        mesh=mesh,
        in_specs=(
            P("dp", None),  # queries
            P("dp"),  # query precursor m/z
            P("lib", None, None),  # lists
            P("lib", None),  # ids
            P("lib", None),  # stored precursor m/z
            P("lib", None),  # dequantization scales
            P(None, None),  # centroids replicated
        ),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )
    return fn(
        queries, query_prec, padded_vectors, padded_ids, padded_prec,
        padded_scales, centroids,
    )


class ShardedIvfIndex:
    """A host IvfIndex with its blocks placed once across the mesh."""

    def __init__(self, mesh: Mesh, index):
        n_lists = index.padded_vectors.shape[0]
        lib_shards = mesh.shape["lib"]
        if n_lists % lib_shards != 0:
            raise ValueError(
                f"num_list={n_lists} must divide lib shards={lib_shards}"
            )
        self.mesh = mesh
        self.num_probe = index.num_probe
        self.redundancy = getattr(index, "redundancy", 1)
        self.lists_per_shard = n_lists // lib_shards
        self.vectors_s = jax.device_put(
            jnp.asarray(index.padded_vectors),
            NamedSharding(mesh, P("lib", None, None)),
        )
        self.ids_s = jax.device_put(
            jnp.asarray(index.padded_ids),
            NamedSharding(mesh, P("lib", None)),
        )
        self.prec_s = jax.device_put(
            jnp.asarray(index.padded_prec, jnp.float32),
            NamedSharding(mesh, P("lib", None)),
        )
        self.scales_s = jax.device_put(
            jnp.asarray(index.padded_scales, jnp.float32),
            NamedSharding(mesh, P("lib", None)),
        )
        self.centroids_s = jax.device_put(
            jnp.asarray(index.centroids, jnp.float32),
            NamedSharding(mesh, P()),
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
        ids, scores = _sharded_ivf_impl(
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
    fn = shard_map(
        partial(
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
        ),
        mesh=mesh,
        in_specs=(
            P("dp", None),  # queries (replicated over dcn/lib)
            P("dp"),
            P(("dcn", "lib"), None, None),  # lists over slices x chips
            P(("dcn", "lib"), None),
            P(("dcn", "lib"), None),
            P(("dcn", "lib"), None),  # dequantization scales
            P(None, None),  # centroids replicated
        ),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )
    return fn(
        queries, query_prec, padded_vectors, padded_ids, padded_prec,
        padded_scales, centroids,
    )


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
