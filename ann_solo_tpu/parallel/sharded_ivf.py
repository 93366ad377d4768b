"""ICI-sharded IVF search: inverted lists partitioned across devices.

The 100M+-vector regime from BASELINE.md: the list-major padded IVF
storage (index/ivf.py) is sharded over the 'lib' mesh axis by *list* --
each device owns a contiguous slice of lists (and their member vectors),
centroids are replicated.  A query tile broadcasts over ICI; every shard
scans the probed lists it owns, takes a local top-k, and the per-shard
candidates merge with one all-gather of k entries per query --
communication O(k), independent of library size.

The shard-local scan dispatches between the same regimes as the
single-chip index (`IvfIndex.search_device`, index/ivf.py), chosen by
the same cost model:

* **fullscan** -- small local blocks: each 128-query tile scans ALL
  local lists as one contiguous MXU einsum with probing as a selection
  mask (round-3 design; now tiled, so the score transient is bounded
  to ``(tile, L_l, cap)`` instead of ``(B_l, L_l, cap)``).
* **probe-gather** -- big local blocks on TPU: each query's probed
  LOCAL lists are compacted to the front and streamed through the
  ``ops.ivf_probe_pallas`` kernel at DMA bandwidth; per-shard traffic
  is ``B_l x width x cap x D`` bytes, independent of the local library
  size.  On meshes with >1 list shard the static probe width is
  ``~2 x num_probe / n_shards`` (a query's probes spread across
  shards); the rare query whose probes concentrate on one shard
  overflows the width, is flagged through a psum'd coverage bit, and
  re-runs through the exact chunked program -- the same
  detect-and-repair structure as the single-chip voting regime.
* **chunked** -- the exact fallback (f32 storage, CPU meshes, repair
  path): local lists stream through `lax.scan` in chunks sized to
  `_CHUNK_TRANSIENT`, each chunk's canonical top-k merges into a
  running top-k by one two-key sort -- (score key desc, position asc),
  so the merge IS the canonical ranking and no certificates or repairs
  are needed (an entry outside a chunk's top-k_local is outranked by
  k_local lanes of that chunk alone).

All regimes rank lanes in shard-local global-position order and merge
shard-major, so results are bit-identical to the single-device index
regimes down to boundary ties (tests/test_sharded_ivf.py).

Query-side data parallelism rides the 'dp' axis unchanged.
"""

from __future__ import annotations

import logging
import os
import time
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

from ann_solo_tpu.index import ivf as _ivf
from ann_solo_tpu.index.ivf import (
    _canonical_topk,
    _dedup_topk,
    _pad_topk,
    _scan_queries,
    _window_mask,
)

logger = logging.getLogger(__name__)

# Per-device bound on the probe-gather score block (B_l, width * cap) f32.
_PROBE_SCORE_BYTES = 512 << 20
# Probe-width slack over the per-shard mean probed-list count.
_PROBE_WIDTH_SLACK = 2


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _shard_index(list_axes, list_axis_sizes):
    """Flat row-major shard index over the named list axes."""
    shard = jax.lax.axis_index(list_axes[0])
    for name, size in zip(list_axes[1:], list_axis_sizes[1:]):
        shard = shard * size + jax.lax.axis_index(name)
    return shard


def _local_probe_mask(
    queries, centroids, num_probe: int, lists_per_shard: int,
    list_axes, list_axis_sizes,
):
    """(B, L_l) bool: this shard's slice of each query's probed lists."""
    l_total = centroids.shape[0]
    b = queries.shape[0]
    coarse = jnp.dot(
        queries, centroids.T, preferred_element_type=jnp.float32
    )  # (B, L)
    _, probe_ids = jax.lax.top_k(coarse, min(num_probe, l_total))
    probed = jnp.zeros((b, l_total), bool)
    rows = jnp.arange(b)[:, None]
    probed = probed.at[rows, probe_ids].set(True)
    shard = _shard_index(list_axes, list_axis_sizes)
    return jax.lax.dynamic_slice(
        probed, (0, shard * lists_per_shard), (b, lists_per_shard)
    )


def _local_scan_fullscan(
    queries, query_prec, local_probed,
    padded_vectors, padded_ids, padded_prec, padded_scales,
    k_local: int, charge: float, tol_val: float, tol_mode: str,
):
    """Tiled masked-einsum local scan (small local blocks).

    Each 128-query tile scans every local list as one MXU einsum; the
    probe/validity/window mask runs in the epilogue and selection is
    canonical (`_canonical_topk`).  Score transient: (tile, L_l, cap)
    f32 -- the dispatch in `ShardedIvfIndex` only picks this regime
    when that fits `_FULLSCAN_TRANSIENT` (index/ivf.py cost model)."""
    l_l, cap, d = padded_vectors.shape
    b = queries.shape[0]
    tile = min(_ivf._TILE_Q, b)
    n_tiles = b // tile
    cast = padded_vectors.dtype != jnp.float32
    vecs = padded_vectors
    if vecs.dtype == jnp.int8:
        vecs = vecs.astype(jnp.bfloat16)

    def tile_fn(inp):
        qt, qpt, probed_t = inp  # (T, D), (T,), (T, L_l)
        scores = jnp.einsum(
            "qd,lpd->qlp", _scan_queries(qt, cast), vecs,
            preferred_element_type=jnp.float32,
        )  # (T, L_l, cap)
        scores = scores * padded_scales[None, :, :]
        mask = probed_t[:, :, None] & (padded_ids >= 0)[None, :, :]
        if tol_val > 0:
            mask &= _window_mask(
                qpt[:, None, None], padded_prec[None], charge,
                tol_val, tol_mode,
            )
        flat = jnp.where(mask, scores, -jnp.inf).reshape(
            tile, l_l * cap
        )
        k_t = min(k_local, l_l * cap)
        top_s, pos = _canonical_topk(flat, k_t, cast)
        flat_ids = padded_ids.reshape(-1)
        top_i = jnp.where(top_s > -jnp.inf, flat_ids[pos], -1)
        return _pad_topk(top_s, top_i, k_local)

    scores_t, ids_t = jax.lax.map(
        tile_fn,
        (
            queries.reshape(n_tiles, tile, d),
            query_prec.reshape(n_tiles, tile),
            local_probed.reshape(n_tiles, tile, l_l),
        ),
    )
    return (
        scores_t.reshape(b, k_local),
        ids_t.reshape(b, k_local),
    )


def _local_scan_probe(
    queries, query_prec, loc_lists, slot_valid, overflow,
    padded_vectors, padded_ids, padded_prec, padded_scales,
    k_local: int, charge: float, tol_val: float, tol_mode: str,
    interpret: bool,
):
    """Probe-gather local scan (big local blocks, TPU).

    `loc_lists` holds each query's probed LOCAL list ids compacted to
    the front (sorted ascending -- the canonical lane order; built by
    `_local_ivf_scan`, either straight from the coarse top-k on a
    single list shard or via the probed-bitmap compaction sort on
    multi-shard meshes); exactly its width in list blocks per
    query stream through the `ops.ivf_probe_pallas` kernel, so traffic
    is B x width x cap x D bytes regardless of the local library size,
    every byte at DMA bandwidth.  `overflow` flags queries probing
    MORE local lists than the width (their selection here would be
    truncated); the caller re-runs them through the exact chunked
    program.
    """
    from ann_solo_tpu.ops.ivf_probe_pallas import ivf_probe_scan

    l_l, cap, d = padded_vectors.shape
    b = queries.shape[0]
    w = loc_lists.shape[1]
    safe_lists = jnp.where(slot_valid, loc_lists, 0)
    meta = jnp.concatenate(
        [
            padded_prec.astype(jnp.float32),
            padded_scales.astype(jnp.float32),
            (padded_ids >= 0).astype(jnp.float32),
        ],
        axis=1,
    )  # (L_l, 3 * cap)
    flat = ivf_probe_scan(
        padded_vectors, meta, queries, query_prec,
        jnp.float32(charge), safe_lists, tol_val, tol_mode, interpret,
    )  # (B, w * cap) f32, -inf masked
    flat = jnp.where(
        jnp.repeat(slot_valid, cap, axis=1), flat, -jnp.inf
    )
    k_t = min(k_local, w * cap)
    top_s, pos = _canonical_topk(flat, k_t, cast=True)
    lp = pos // cap
    slot = pos - lp * cap
    lists = jnp.take_along_axis(safe_lists, lp, axis=1)
    top_i = jnp.where(top_s > -jnp.inf, padded_ids[lists, slot], -1)
    top_s, top_i = _pad_topk(top_s, top_i, k_local)
    return top_s, top_i, overflow


def _local_scan_chunked(
    queries, query_prec, local_probed,
    padded_vectors, padded_ids, padded_prec, padded_scales,
    k_local: int, charge: float, tol_val: float, tol_mode: str,
    chunk_lists: int,
):
    """Chunked local scan with an exact canonical running merge.

    Streams local lists through `lax.scan` in `chunk_lists`-list chunks
    (per-chunk f32 score transient bounded by the caller's
    `_CHUNK_TRANSIENT` sizing); each chunk's canonical top-k_local
    merges into the carry by ONE two-key sort on
    (-score, global position) -- ascending on that pair IS the
    canonical (key desc, position asc) order, so ties resolve exactly
    as in every other regime.  Exact with no certificates: a lane
    outside its own chunk's top-k_local is outranked by k_local lanes
    from that chunk alone and can never enter the global top-k_local.
    """
    l_l, cap, d = padded_vectors.shape
    b = queries.shape[0]
    cast = padded_vectors.dtype != jnp.float32
    c = min(chunk_lists, l_l)
    n_chunks = -(-l_l // c)
    k_t = min(k_local, c * cap)
    q_scan = _scan_queries(queries, cast)
    iota_c = jnp.arange(c, dtype=jnp.int32)

    def chunk_fn(carry, ci):
        run_s, run_pos = carry  # (B, k_local) f32 desc, int32
        start = jnp.minimum(ci * c, l_l - c)
        vecs = jax.lax.dynamic_slice_in_dim(padded_vectors, start, c, 0)
        ids_c = jax.lax.dynamic_slice_in_dim(padded_ids, start, c, 0)
        scl_c = jax.lax.dynamic_slice_in_dim(padded_scales, start, c, 0)
        probed_c = jax.lax.dynamic_slice_in_dim(
            local_probed, start, c, 1
        )  # (B, C)
        if vecs.dtype == jnp.int8:
            vecs = vecs.astype(jnp.bfloat16)
        s = jnp.einsum(
            "qd,lpd->qlp", q_scan, vecs,
            preferred_element_type=jnp.float32,
        )  # (B, C, cap)
        s = s * scl_c[None]
        # The last chunk clamps its start when c does not divide L_l;
        # mask the re-read lists (same trick as _ivf_search_chunked).
        fresh = (start + iota_c) >= ci * c  # (C,)
        mask = (
            probed_c[:, :, None]
            & (ids_c >= 0)[None]
            & fresh[None, :, None]
        )
        if tol_val > 0:
            prec_c = jax.lax.dynamic_slice_in_dim(
                padded_prec, start, c, 0
            )
            mask &= _window_mask(
                query_prec[:, None, None], prec_c[None], charge,
                tol_val, tol_mode,
            )
        flat = jnp.where(mask, s, -jnp.inf).reshape(b, c * cap)
        top_s, pos = _canonical_topk(flat, k_t, cast)
        gpos = start * cap + pos  # global flat local position
        # Canonical merge: ascending (-score, position) == (score
        # desc, position asc).  -(-inf) = +inf sorts empty lanes last.
        neg = jnp.concatenate([-run_s, -top_s], axis=1)
        cat_pos = jnp.concatenate([run_pos, gpos], axis=1)
        neg_s, pos_s = jax.lax.sort(
            (neg, cat_pos), dimension=1, is_stable=False, num_keys=2
        )
        return (-neg_s[:, :k_local], pos_s[:, :k_local]), 0

    init = (
        jnp.full((b, k_local), -jnp.inf, jnp.float32),
        jnp.full((b, k_local), np.iinfo(np.int32).max, jnp.int32),
    )
    (run_s, run_pos), _ = jax.lax.scan(
        chunk_fn, init, jnp.arange(n_chunks, dtype=jnp.int32)
    )
    lists = run_pos // cap
    slots = run_pos - lists * cap
    lists = jnp.clip(lists, 0, l_l - 1)
    slots = jnp.clip(slots, 0, cap - 1)
    run_i = jnp.where(run_s > -jnp.inf, padded_ids[lists, slots], -1)
    return run_s, run_i


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
    regime: str = "fullscan",
    probe_width: int = 0,
    chunk_lists: int = 0,
    interpret: bool = False,
):
    b = queries.shape[0]
    l_l, cap, _ = padded_vectors.shape
    cast = padded_vectors.dtype != jnp.float32
    n_shards = 1
    for sz in list_axis_sizes:
        n_shards *= sz

    # With redundant storage (index.redundancy > 1) a vector's copies
    # may live on different shards (or the same one): keep
    # k_scan = R * k entries through the local selection, then dedup.
    k_scan = max(k_scan, k)
    k_local = min(k_scan, l_l * cap)
    overflow = jnp.zeros((b,), bool)
    if regime == "probe" and n_shards == 1:
        # Single-shard fast path: every probed list is local, so the
        # coarse top-k IS the compaction -- skips the (B, L) probed
        # bitmap scatter and the (B, L_l) compaction sort (measured
        # ~9% of the 2.1M select on the 1x1 mesh).
        coarse = jnp.dot(
            queries, centroids.T, preferred_element_type=jnp.float32
        )
        p = min(num_probe, l_l)
        _, probe_ids = jax.lax.top_k(coarse, p)
        loc_lists = jnp.sort(probe_ids, axis=1)[:, :probe_width]
        slot_valid = jnp.ones(loc_lists.shape, bool)
        local_scores, local_ids, overflow = _local_scan_probe(
            queries, query_prec, loc_lists, slot_valid, overflow,
            padded_vectors, padded_ids, padded_prec, padded_scales,
            k_local, charge, tol_val, tol_mode, interpret,
        )
        # Merge below is a no-op reshape at s=1; fall through.
        local_probed = None
    elif regime == "probe":
        local_probed = _local_probe_mask(
            queries, centroids, num_probe, lists_per_shard,
            list_axes, list_axis_sizes,
        )  # (B, L_l)
        w = probe_width
        iota_l = jnp.broadcast_to(
            jnp.arange(l_l, dtype=jnp.int32)[None, :], (b, l_l)
        )
        # Probed local list ids compact to the front, ascending (the
        # canonical global-position lane order); non-probed slots
        # carry l_l.
        sortk = jnp.where(local_probed, iota_l, l_l)
        loc_lists = jax.lax.sort(sortk, dimension=1)[:, :w]
        slot_valid = loc_lists < l_l
        if w < min(num_probe, l_l):
            overflow = jnp.sum(local_probed, axis=1) > w
        local_scores, local_ids, overflow = _local_scan_probe(
            queries, query_prec, loc_lists, slot_valid, overflow,
            padded_vectors, padded_ids, padded_prec, padded_scales,
            k_local, charge, tol_val, tol_mode, interpret,
        )
    elif regime == "chunked":
        local_probed = _local_probe_mask(
            queries, centroids, num_probe, lists_per_shard,
            list_axes, list_axis_sizes,
        )
        local_scores, local_ids = _local_scan_chunked(
            queries, query_prec, local_probed,
            padded_vectors, padded_ids, padded_prec, padded_scales,
            k_local, charge, tol_val, tol_mode, chunk_lists,
        )
    else:
        local_probed = _local_probe_mask(
            queries, centroids, num_probe, lists_per_shard,
            list_axes, list_axis_sizes,
        )
        local_scores, local_ids = _local_scan_fullscan(
            queries, query_prec, local_probed,
            padded_vectors, padded_ids, padded_prec, padded_scales,
            k_local, charge, tol_val, tol_mode,
        )
    # Merge per-shard top-k over ICI.
    # O(k) merge: one all-gather per list axis (DCN leg last and tiny
    # on multi-slice meshes -- k entries per query per slice).  Lanes
    # within a shard are in local-position order and shards gather in
    # shard-major order == global position order, so the stable merge
    # tie-break matches the single-device regimes exactly.
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
    # OR the truncation flag across shards so every dp replica (and the
    # host) sees a query as flagged when ANY shard overflowed.
    if regime == "probe" and probe_width < min(num_probe, l_l):
        overflow = (
            jax.lax.psum(overflow.astype(jnp.int32), list_axes) > 0
        )
    return top_ids, top_scores, overflow


@partial(
    jax.jit, static_argnums=(0, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17,
                             18, 19, 20)
)
def _sharded_ivf_impl(
    mesh, queries, query_prec, padded_vectors, padded_ids, padded_prec,
    padded_scales, centroids,
    num_probe: int, k: int, lists_per_shard: int,
    charge: float, tol_val: float, tol_mode: str,
    k_scan: int = 0,
    list_axes: Tuple[str, ...] = ("lib",),
    list_axis_sizes: Tuple[int, ...] = (1,),
    regime: str = "fullscan",
    probe_width: int = 0,
    chunk_lists: int = 0,
    interpret: bool = False,
):
    """One shard_map program covering single-slice ('dp', 'lib') and
    multi-slice ('dcn', 'dp', 'lib') meshes: lists shard over
    `list_axes` (row-major flat shard index), queries over 'dp'.  The
    within-slice merge rides ICI; on multi-slice meshes the across-
    slice merge is one k-entry all-gather on DCN (BASELINE.md 100M+
    north star; see mesh.make_multislice_mesh)."""
    la = list_axes if len(list_axes) > 1 else list_axes[0]
    in_specs = [
        P("dp", None),  # queries (replicated over the list axes)
        P("dp"),  # query precursor m/z
        P(la, None, None),  # lists
        P(la, None),  # ids
        P(la, None),  # stored precursor m/z
        P(la, None),  # dequantization scales
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
        list_axes=list_axes,
        list_axis_sizes=list_axis_sizes,
        k_scan=k_scan,
        regime=regime,
        probe_width=probe_width,
        chunk_lists=chunk_lists,
        interpret=interpret,
    )
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P("dp", None), P("dp", None), P("dp")),
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
    blocks (host ndarrays or single-device jax arrays), placing each
    block straight onto its devices (dp replicas get copies) -- the
    full array never exists on one device or as one host buffer beyond
    the input list.

    On a ('dcn', 'dp', 'lib') mesh block `i` lands on the devices whose
    (dcn, lib) coordinates flatten row-major to `i`: slice-local blocks
    go to slice-local chips, so the placement uploads are host->ICI
    within each slice and nothing crosses DCN at build time."""
    global_shape = (
        len(blocks) * blocks[0].shape[0],
    ) + tuple(blocks[0].shape[1:])
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


def _pad_block(arr, cap_to: int, d_to: int = 0, fill=0):
    """Right-pad a per-shard (L_l, cap[, D]) host block's slot axis to
    `cap_to` (and feature axis to `d_to` for 3-D blocks).  Padded slots
    are invalid everywhere (ids -1 / masks false); zero feature columns
    leave inner products unchanged."""
    arr = np.asarray(arr)
    pads = [(0, 0), (0, cap_to - arr.shape[1])]
    if arr.ndim == 3:
        pads.append((0, max(0, d_to - arr.shape[2])))
    if all(p == (0, 0) for p in pads):
        return arr
    return np.pad(arr, pads, constant_values=fill)


class ShardedIvfIndex:
    """An IVF index with its list blocks placed once across the mesh.

    Construct from a host `IvfIndex` (placement only) or born-sharded
    via `build_sharded` / `build_sharded_streaming`.  Searches dispatch
    the shard-local scan by the single-chip cost model (see module
    docstring); *scale-regime* indexes (local block too big for the
    fullscan transient) are placed with the slot/feature axes padded to
    multiples of 128 so the probe-gather Pallas kernel sees Mosaic-
    aligned blocks without materializing a padded copy per call.
    """

    def __init__(self, mesh: Mesh, index):
        n_lists = index.padded_vectors.shape[0]
        n_shards = _n_list_shards(mesh)
        if n_lists % n_shards != 0:
            raise ValueError(
                f"num_list={n_lists} must divide list shards={n_shards}"
            )
        lists_per_shard = n_lists // n_shards
        cap = index.padded_ids.shape[1]
        d = index.padded_vectors.shape[2]
        self._init_params(
            mesh, int(index.num_probe),
            getattr(index, "redundancy", 1), lists_per_shard, cap, d,
            np.dtype(index.padded_vectors.dtype),
        )
        cap_s, d_s = self.cap, self.dim
        spec3 = NamedSharding(mesh, _list_spec(mesh, 2))
        spec2 = NamedSharding(mesh, _list_spec(mesh, 1))
        vecs = np.asarray(index.padded_vectors)
        ids = np.asarray(index.padded_ids)
        prec = np.asarray(index.padded_prec, np.float32)
        scales = np.asarray(index.padded_scales, np.float32)
        if cap_s != cap or d_s != d:
            vecs = _pad_block(vecs, cap_s, d_s)
            ids = _pad_block(ids, cap_s, fill=-1)
            prec = _pad_block(prec, cap_s)
            scales = _pad_block(scales, cap_s, fill=1.0)
        self.vectors_s = jax.device_put(jnp.asarray(vecs), spec3)
        self.ids_s = jax.device_put(jnp.asarray(ids), spec2)
        self.prec_s = jax.device_put(jnp.asarray(prec), spec2)
        self.scales_s = jax.device_put(jnp.asarray(scales), spec2)
        cents = np.asarray(index.centroids, np.float32)
        if cents.shape[-1] != d_s:  # match the feature-axis padding
            cents = np.pad(
                cents, ((0, 0), (0, d_s - cents.shape[-1]))
            )
        self.centroids_s = jax.device_put(
            jnp.asarray(cents), NamedSharding(mesh, P()),
        )

    def _init_params(
        self, mesh: Mesh, num_probe: int, redundancy: int,
        lists_per_shard: int, cap: int, d: int, dtype: np.dtype,
    ):
        """Shared bookkeeping + the placement-time scale decision.

        `scale_regime` mirrors the single-chip dispatch bound
        (index/ivf.py `search_device`): the per-tile (T, L_l, cap) f32
        score transient of the fullscan einsum no longer fits
        `_FULLSCAN_TRANSIENT`.  Scale-regime blocks are stored with
        cap and D padded to multiples of 128 (Mosaic lane layout for
        the probe-gather kernel; TPU tiling pays the minor-dim pad
        physically regardless -- see IvfIndex.build_streaming)."""
        self.mesh = mesh
        self.num_probe = num_probe
        self.redundancy = max(1, int(redundancy))
        self.lists_per_shard = lists_per_shard
        self.n_list_shards = _n_list_shards(mesh)
        self.storage_dtype = np.dtype(dtype)
        self.scale_regime = (
            lists_per_shard * cap * 4 * _ivf._TILE_Q
            > _ivf._FULLSCAN_TRANSIENT
        )
        if self.scale_regime:
            self.cap = -(-cap // 128) * 128
            self.dim = -(-d // 128) * 128
        else:
            self.cap = cap
            self.dim = d
        self._last_overflow = 0  # observability (SCALE.json)

    def _regime_params(self, b_l: int, num_probe: int, k_scan: int):
        """(regime, probe_width, chunk_lists, interpret) for a local
        batch of `b_l` queries -- the sharded mirror of
        `IvfIndex.search_device`'s dispatch."""
        from ann_solo_tpu.ops.ivf_probe_pallas import (
            probe_scan_max_queries,
            probe_scan_supported,
        )
        from ann_solo_tpu.ops.shifted_dot_pallas import (
            use_pallas_default,
        )

        l_l, cap, d = self.lists_per_shard, self.cap, self.dim
        if not self.scale_regime:
            return "fullscan", 0, 0, False
        p = min(self.num_probe if num_probe <= 0 else num_probe, l_l)
        s = self.n_list_shards
        if s == 1:
            w = p
        else:
            # A query's p probed lists spread over s shards; 2x the
            # mean covers the binomial tail, overflow repairs the rest.
            w = min(p, max(16, _next_pow2(-(-_PROBE_WIDTH_SLACK * p // s))))
        probe_env = os.environ.get("ANN_SOLO_TPU_PROBE_PALLAS", "1")
        pallas_ok = use_pallas_default() or probe_env == "force"
        use_probe = (
            probe_env != "0"
            and pallas_ok
            and probe_scan_supported(
                l_l, cap, d, w, k_scan, self.storage_dtype,
                max(8, min(b_l, probe_scan_max_queries(w))),
            )
        )
        if use_probe:
            interpret = not use_pallas_default()
            return "probe", w, 0, interpret
        _, chunk_lists = _ivf.chunked_scan_params(
            l_l, cap, p, k_scan, b_l
        )
        return "chunked", 0, chunk_lists, False

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
        """Build an index BORN sharded from a resident host row block.

        Thin wrapper over `build_sharded_streaming` -- the row accessor
        fancy-indexes the host array chunk by chunk, so peak transient
        memory is bounded exactly as in the streaming path (the full
        block exists only as the caller's input)."""
        vectors = np.asarray(vectors)
        n, d = vectors.shape

        def get_rows(idx):
            host = np.clip(np.asarray(idx), 0, n - 1)
            return jnp.asarray(vectors[host], jnp.float32)

        return cls.build_sharded_streaming(
            mesh, get_rows, n, d, config,
            precursor_mz=precursor_mz, seed=seed,
            storage_dtype=storage_dtype, redundancy=redundancy,
            centroids=centroids, n_iter=n_iter,
        )

    @classmethod
    def build_sharded_streaming(
        cls,
        mesh: Mesh,
        get_rows,
        n: int,
        d: int,
        config,
        precursor_mz=None,
        seed: int = 42,
        storage_dtype=None,
        redundancy=None,
        centroids=None,
        n_iter: int = 25,
        group_bytes: int = 1 << 30,
        train_rows_cap: int = 1 << 21,
    ) -> "ShardedIvfIndex":
        """Build an index that is BORN sharded over the list axes
        WITHOUT the full (N, D) source block ever existing (BASELINE.md
        north star: 100M+ vectors sharded over ICI "for both index
        build and query" -- a 100M x 800 f32 block is ~320 GB and can
        never exist on one host or chip even transiently).

        * k-means trains on a FAISS-subsampled row set fetched through
          `get_rows` and sharded over the WHOLE mesh: per-shard segment
          sums + one psum per iteration (`_sharded_kmeans_fit`);
          centroids replicate (L x D is small).
        * top-A assignment runs in fixed row blocks on the default
          device; only the (N, A) int32 choices ever accumulate.
        * balanced (redundant) placement reuses `plan_assignments` --
          byte-identical placement to the single-device build given the
          same centroids (tests/test_sharded_build.py pins this); the
          bookkeeping tables are O(R * N) int32/int64, not O(N * D).
        * each shard's (L_l, cap, D) block is packed GROUP by GROUP on
          the default device (`_pack_group`, quantization bit-identical
          to `_pack_lists`): one list-group's source rows are fetched
          through `get_rows`, quantized, and written into a donated
          preallocated buffer; the finished shard block transfers to
          its devices and the scratch is freed before the next shard
          packs.  Peak memory anywhere = one shard block + one
          list-group's rows (tests/test_sharded_build.py pins the
          accessor's max rows-in-flight).

        `get_rows(row_indices (M,) int32 device array) -> (M, d)`
        returns source rows for arbitrary indices; indices may contain
        -1 or clamped duplicates for empty slots, whose rows may hold
        anything -- the packer masks them.  Reference analog: FAISS
        train on a subsample + batched `add`
        (spectral_library.py:163-181), sharded.
        """
        import ml_dtypes

        from ann_solo_tpu.index.ivf import (
            _pack_group,
            ivf_build_params,
            plan_assignments,
            resolve_num_list,
            resolve_num_probe,
            resolve_soar_lambda,
        )
        from ann_solo_tpu.ops.kmeans import assign_topk_blocked

        if storage_dtype is None:
            storage_dtype = ml_dtypes.bfloat16
        num_list = resolve_num_list(int(config.num_list), n)
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
        soar_lambda = resolve_soar_lambda(config)
        r_eff, cap, n_choices = ivf_build_params(
            n, num_list, redundancy, soar_lambda
        )
        t_phase = time.perf_counter()

        def _phase(name):
            nonlocal t_phase
            now = time.perf_counter()
            logger.info(
                "sharded streaming build: %s %.1fs", name, now - t_phase
            )
            t_phase = now

        if centroids is None:
            centroids = cls._train_centroids_sharded(
                mesh, get_rows, n, num_list, seed, n_iter,
                train_rows_cap=train_rows_cap,
            )
        centroids = np.asarray(centroids, np.float32)
        _phase("train")

        # Assignment in fixed row blocks (bounded device memory; only
        # the (N, A) int32 choices accumulate on the host).  The SOAR
        # round-2 re-rank runs in the same blocks -- identical inputs
        # and math as the single-device build, so placement stays
        # byte-identical (tests/test_sharded_build.py).
        centroids_d = jnp.asarray(centroids)
        block = 1 << 16
        ch_parts, soar_parts = [], []
        use_soar = soar_lambda > 0.0 and r_eff >= 2
        for start in range(0, n, block):
            idx = jnp.arange(
                start, min(start + block, n), dtype=jnp.int32
            )
            rows = get_rows(idx)
            ch = assign_topk_blocked(rows, centroids_d, n_choices)
            ch_parts.append(np.asarray(ch))
            if use_soar:
                from ann_solo_tpu.ops.kmeans import soar_round2_choices

                soar_parts.append(np.asarray(soar_round2_choices(
                    rows, centroids_d, ch, soar_lambda,
                )))
            del rows
        choices = np.concatenate(ch_parts)
        del ch_parts
        _phase("assign")
        round_choices = None
        if use_soar:
            round_choices = [np.concatenate(soar_parts)] + [None] * max(
                0, r_eff - 2
            )
            del soar_parts
        flat_slot, row_ids, spilled, _ = plan_assignments(
            choices, num_list, cap, r_eff, round_choices=round_choices
        )
        del choices, round_choices
        logger.debug(
            "Sharded IVF build: %d lists (cap %d, x%d), %d spilled",
            num_list, cap, r_eff, spilled,
        )
        # Slot -> global row table ((L * cap,) int32, -1 = empty):
        # O(L * cap) bookkeeping, ~3 * N ints -- never O(N * D).
        total = num_list * cap
        ids_flat = np.full((total,), -1, np.int32)
        keep = flat_slot >= 0
        ids_flat[flat_slot[keep]] = row_ids[keep]
        del flat_slot, row_ids
        _phase("plan")

        lists_per_shard = num_list // lib_shards
        index = cls.__new__(cls)
        index._init_params(
            mesh, resolve_num_probe(int(config.num_probe), num_list),
            r_eff, lists_per_shard, cap, d,
            np.dtype(storage_dtype),
        )
        cap_s, d_s = index.cap, index.dim
        dt = jnp.dtype(storage_dtype)
        group_lists = max(
            1, int(group_bytes // (cap * d * (4 + dt.itemsize)))
        )
        while lists_per_shard % group_lists:
            group_lists -= 1
        prec = (
            np.asarray(precursor_mz, np.float32)
            if precursor_mz is not None else None
        )
        vec_bufs, ids_bufs, prec_bufs, scale_bufs = [], [], [], []
        for s_idx in range(lib_shards):
            lo = s_idx * lists_per_shard
            shard_ids = ids_flat[
                lo * cap : (lo + lists_per_shard) * cap
            ].reshape(lists_per_shard, cap)
            # Pack this shard's block group by group into donated
            # buffers on the default device (slot-axis padding written
            # as invalid rows by construction: ids -1 -> fill 0).
            packed = jnp.zeros((lists_per_shard, cap_s, d_s), dt)
            scales = jnp.ones((lists_per_shard, cap_s), jnp.float32)
            shard_ids_pad = _pad_block(shard_ids, cap_s, fill=-1)
            for g0 in range(0, lists_per_shard, group_lists):
                idx_np = shard_ids_pad[g0 : g0 + group_lists].reshape(-1)
                fill = jnp.asarray(
                    (idx_np >= 0).astype(np.float32)
                )
                src = get_rows(jnp.asarray(idx_np))
                if src.shape[-1] != d_s:
                    src = jnp.pad(
                        src, ((0, 0), (0, d_s - src.shape[-1]))
                    )
                packed, scales = _pack_group(
                    packed, scales, src, fill, jnp.int32(g0),
                    group_lists, cap_s,
                )
                del src
            pr = (
                np.where(
                    shard_ids_pad >= 0,
                    prec[np.clip(shard_ids_pad, 0, n - 1)],
                    0.0,
                ).astype(np.float32)
                if prec is not None
                else np.zeros_like(shard_ids_pad, np.float32)
            )
            # Transfer the finished block to its shard devices and
            # free the packing scratch before the next shard packs.
            vec_bufs.append(packed)
            scale_bufs.append(scales)
            ids_bufs.append(shard_ids_pad)
            prec_bufs.append(pr)
            del packed, scales
        _phase("pack")
        index.vectors_s = _place_lib_blocks(
            mesh, vec_bufs, _list_spec(mesh, 2)
        )
        del vec_bufs
        index.ids_s = _place_lib_blocks(
            mesh, ids_bufs, _list_spec(mesh, 1)
        )
        index.prec_s = _place_lib_blocks(
            mesh, prec_bufs, _list_spec(mesh, 1)
        )
        index.scales_s = _place_lib_blocks(
            mesh, scale_bufs, _list_spec(mesh, 1)
        )
        if centroids.shape[-1] != d_s:  # match the feature-axis padding
            centroids = np.pad(
                centroids, ((0, 0), (0, d_s - centroids.shape[-1]))
            )
        index.centroids_s = jax.device_put(
            jnp.asarray(centroids), NamedSharding(mesh, P())
        )
        _phase("place")
        return index

    @staticmethod
    def _train_centroids_sharded(
        mesh: Mesh, get_rows, n: int, num_list: int, seed: int,
        n_iter: int, train_rows_cap: int = 1 << 21,
    ) -> np.ndarray:
        """Sharded spherical k-means on a FAISS-style subsample fetched
        through the row accessor (same subsample rows as the resident
        build given the same seed).  ``train_rows_cap`` bounds the
        device-resident subsample like `IvfIndex.build_streaming`'s
        (a 16384-list build would otherwise fetch a 4.2M-row / 13 GB
        f32 block)."""
        from ann_solo_tpu.index.ivf import (
            _TRAIN_POINTS_PER_CENTROID,
            fetch_rows_blocked,
        )

        cap_train = min(
            num_list * _TRAIN_POINTS_PER_CENTROID, train_rows_cap
        )
        rng = np.random.RandomState(seed + 1)
        if n > cap_train:
            rows = np.sort(rng.choice(n, size=cap_train, replace=False))
        else:
            rows = np.arange(n)
        # The subsample stays a DEVICE array end to end: only the small
        # (L, D) init block crosses the host boundary.  (The earlier
        # np.asarray round-trip downloaded + re-uploaded the multi-GB
        # block -- ~3.4 GB at the 2.1M/4096-list shape -- across the
        # host link for nothing.)
        t0 = time.perf_counter()
        # Fetch in the assignment loop's 64k block shape so the
        # accessor compiles once per build (ivf.fetch_rows_blocked).
        train = fetch_rows_blocked(
            get_rows, rows.astype(np.int32), block=1 << 16
        ).astype(jnp.float32)
        np.asarray(train[:1, :1])  # real sync (block_until_ready no-ops
        # on the tunneled backend; only host materialization waits)
        n_rows = int(train.shape[0])
        t1 = time.perf_counter()
        rng_init = np.random.RandomState(seed)
        init_rows = rng_init.choice(
            n_rows, size=min(num_list, n_rows), replace=False
        )
        init = np.array(train[jnp.asarray(init_rows)], np.float32)
        if len(init) < num_list:
            reps = -(-num_list // len(init))
            init = np.tile(init, (reps, 1))[:num_list]
            init = init + rng_init.normal(0, 1e-4, init.shape).astype(
                np.float32
            )
        init /= np.maximum(
            np.linalg.norm(init, axis=1, keepdims=True), 1e-30
        )
        t2 = time.perf_counter()
        # Zero-pad rows to the mesh size (zero rows carry weight 0).
        n_pad = -(-n_rows // mesh.size) * mesh.size
        if n_pad != n_rows:
            train = jnp.pad(train, ((0, n_pad - n_rows), (0, 0)))
        train_s = jax.device_put(
            train,
            NamedSharding(mesh, P(tuple(mesh.axis_names), None)),
        )
        np.asarray(train_s[:1, :1])  # real sync (see above)
        init_s = jax.device_put(
            jnp.asarray(init), NamedSharding(mesh, P())
        )
        t3 = time.perf_counter()
        out = np.asarray(
            _sharded_kmeans_fit(mesh, train_s, init_s, n_iter)
        )
        logger.info(
            "sharded k-means train: gen %.1fs init %.1fs place %.1fs "
            "fit %.1fs", t1 - t0, t2 - t1, t3 - t2,
            time.perf_counter() - t3,
        )
        return out

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
        device array.

        Scale-regime indexes run in query super-tiles bounding the
        per-device probe-gather score block to `_PROBE_SCORE_BYTES`;
        probe-width overflow (a query whose probed lists concentrate
        on one shard beyond the static width) is detected on device
        and repaired through the exact chunked program -- the same
        structure as the single-chip dropped-coverage rerun."""
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
        k_scan = self.redundancy * k
        queries_d = jnp.asarray(queries, jnp.float32)
        if queries_d.shape[-1] != self.dim:
            queries_d = jnp.pad(
                queries_d,
                ((0, 0), (0, self.dim - queries_d.shape[-1])),
            )
        q_prec_d = jnp.asarray(q_prec, jnp.float32)

        # Super-tile size: bound the scale-regime per-device score
        # block; fullscan indexes run the whole batch in one call
        # (their transient is tiled inside the program).
        regime0, w0, _, _ = self._regime_params(
            max(1, _next_pow2(-(-b // dp))), num_probe, k_scan
        )
        if regime0 == "probe":
            from ann_solo_tpu.ops.ivf_probe_pallas import (
                probe_scan_max_queries,
            )

            per_q = max(w0 * self.cap * 4, 1)
            tq_l = max(
                min(8, _next_pow2(-(-b // dp))),
                min(
                    _next_pow2(_PROBE_SCORE_BYTES // per_q + 1) // 2,
                    probe_scan_max_queries(w0),  # SMEM probe table
                ),
            )
            tq = tq_l * dp
        elif regime0 == "chunked":
            tq = dp * max(
                1, _next_pow2(min(-(-b // dp), _ivf._CHUNK_TQ))
            )
        else:
            tq = dp * _next_pow2(-(-b // dp))
        out_ids, out_scores = [], []
        self._last_overflow = 0
        for start in range(0, b, tq):
            stop = min(start + tq, b)
            n = stop - start
            n_pad = dp * _next_pow2(-(-n // dp))
            qt = queries_d[start:stop]
            qpt = q_prec_d[start:stop]
            if n_pad != n:
                qt = jnp.pad(qt, ((0, n_pad - n), (0, 0)))
                qpt = jnp.pad(qpt, (0, n_pad - n))
            ids_t, scores_t = self._search_tile(
                qt, qpt, k, num_probe, k_scan, charge, tol_val, tol_mode
            )
            out_ids.append(ids_t[:n])
            out_scores.append(scores_t[:n])
        if len(out_ids) == 1:
            return out_ids[0], out_scores[0]
        return jnp.concatenate(out_ids), jnp.concatenate(out_scores)

    def _search_tile(
        self, qt, qpt, k: int, num_probe: int, k_scan: int,
        charge: float, tol_val: float, tol_mode: str,
    ):
        """One padded super-tile through the shard_map program, with
        the probe-width overflow repair."""
        mesh = self.mesh
        dp = mesh.shape["dp"]
        la = _list_axes(mesh)
        sizes = tuple(mesh.shape[a] for a in la)
        b_l = qt.shape[0] // dp
        regime, w, chunk_lists, interpret = self._regime_params(
            b_l, num_probe, k_scan
        )
        qt_s = jax.device_put(qt, NamedSharding(mesh, P("dp", None)))
        qpt_s = jax.device_put(qpt, NamedSharding(mesh, P("dp")))
        ids, scores, overflow = _sharded_ivf_impl(
            mesh, qt_s, qpt_s,
            self.vectors_s, self.ids_s, self.prec_s, self.scales_s,
            self.centroids_s,
            num_probe, k, self.lists_per_shard,
            float(charge), float(tol_val), tol_mode,
            k_scan, la, sizes, regime, w, chunk_lists, interpret,
        )
        if regime != "probe" or w >= min(
            num_probe, self.lists_per_shard
        ):
            return ids, scores
        flags_np = np.asarray(overflow)  # one small download
        n_retry = int(flags_np.sum())
        self._last_overflow += n_retry
        if n_retry == 0:
            return ids, scores
        logger.debug(
            "Sharded probe-width overflow for %d/%d queries; chunked "
            "rerun", n_retry, len(flags_np),
        )
        retry_rows = np.nonzero(flags_np)[0]
        n_pad = dp * _next_pow2(-(-n_retry // dp))
        rows = np.concatenate(
            [retry_rows, np.full(n_pad - n_retry, retry_rows[0])]
        ).astype(np.int32)
        rows_d = jnp.asarray(rows)
        _, chunk_lists = _ivf.chunked_scan_params(
            self.lists_per_shard, self.cap,
            min(num_probe, self.lists_per_shard), k_scan, n_pad // dp,
        )
        r_ids, r_scores, _ = _sharded_ivf_impl(
            mesh,
            jax.device_put(
                qt[rows_d], NamedSharding(mesh, P("dp", None))
            ),
            jax.device_put(qpt[rows_d], NamedSharding(mesh, P("dp"))),
            self.vectors_s, self.ids_s, self.prec_s, self.scales_s,
            self.centroids_s,
            num_probe, k, self.lists_per_shard,
            float(charge), float(tol_val), tol_mode,
            k_scan, la, sizes, "chunked", 0, chunk_lists, False,
        )
        ids = ids.at[rows_d].set(r_ids)
        scores = scores.at[rows_d].set(r_scores)
        return ids, scores


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
    """Search an IvfIndex sharded over a ('dcn', 'dp', 'lib') mesh.

    Convenience wrapper over ShardedIvfIndex (which callers should hold
    directly to keep the placed blocks resident)."""
    return ShardedIvfIndex(mesh, index).search_with_scores(
        queries, k, num_probe, q_prec, charge, tol_val, tol_mode
    )


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
