"""TPU-native IVF (inverted file) approximate-nearest-neighbor index.

From-scratch replacement for the FAISS IndexIVFFlat dependency
(reference spectral_library.py:133-183, 457-500), redesigned for the MXU:

* **Uniform capped lists** ("balanced IVF"): storage is a dense
  ``(num_list, cap, D)`` block with ``cap ~ 1.5 x N / num_list`` -- one
  list scan is one contiguous MXU matmul and skewed k-means assignments
  cannot blow up memory (the round-1 max-length padding could reach GBs).
  Vectors overflowing their nearest list *spill to their next-nearest
  centroid's list* (ScaNN-style balanced assignment); nothing is dropped.
* **Build**: k-means trains on a FAISS-style subsample
  (max_points_per_centroid=256), full assignment runs as blocked MXU
  matmuls, and list packing happens on device via argsort-by-assignment --
  no per-list host passes.  Storage defaults to bfloat16 (the memory
  analog of FAISS GPU ``useFloat16``, spectral_library.py:492-495) with
  float32 MXU accumulation.
* **Search**: query tiles (sorted by nearest centroid) scan the tile's
  top-voted lists as blocked matmuls with the per-query probed-list mask
  AND the precursor-mass window fused into the scan mask (reference
  applies the window outside FAISS, spectral_library.py:443-446 -- fusing
  it stops out-of-window neighbors from wasting top-k slots).  A
  device-computed coverage flag detects queries whose own probed lists
  fell outside the scanned budget; those rare rows re-run alone, where
  the scanned set provably equals their probe set -- per-query
  ``nprobe`` semantics are exact, never best-effort.
* **Persistence**: one .h5 file per charge, named with the hyperparameter
  hash like the reference's .idxann files (spectral_library.py:98-116).

Recall parity is measured against brute force at fixed probe budgets
(BASELINE.md: 75.1% of brute-force SSMs at k=1024); tests/test_ivf.py.
"""

from __future__ import annotations

import logging
import os
from functools import partial
from typing import Optional, Tuple

import h5py
import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from ann_solo_tpu.ops.kmeans import assign_topk_blocked, spherical_kmeans

logger = logging.getLogger(__name__)

_TILE_Q = 128  # queries per search tile
_LIST_CHUNK = 16  # lists scanned per inner step
_TILE_LIST_SLACK = 4  # tile scans up to slack * num_probe voted lists
_FILL_SLACK = 1.5  # list capacity = slack * mean list size
_N_CHOICES = 4  # spill candidates per vector (nearest centroids)
_TRAIN_POINTS_PER_CENTROID = 256  # FAISS subsampling rule


def ivf_index_filename(
    library_filename: str, config_hash: str, charge: int,
    index_dtype: str = "bf16",
) -> str:
    """Per-charge index path (reference's .idxann naming,
    spectral_library.py:98-116).  Index-only settings (storage dtype)
    key the filename rather than the shared store hash, so switching
    them rebuilds just the index."""
    base = os.path.splitext(library_filename)[0]
    suffix = "" if index_dtype == "bf16" else f"_{index_dtype}"
    return f"{base}_{config_hash[:7]}_{charge}{suffix}.ivf.h5"


# --------------------------------------------------------------------- #
# Build: balanced list filling on device


@partial(jax.jit, static_argnums=(1, 2))
def _fill_lists(
    choices: jnp.ndarray,  # (N, A) int32 nearest-centroid ranking
    num_list: int,
    cap: int,
):
    """Place each vector in its best-ranked list with a free slot.

    Round ``a`` tries every still-unplaced vector's ``a``-th choice:
    contenders for one list are ordered by a stable sort, the first
    ``cap - used`` of them are accepted.  Returns (list, slot) per vector
    (-1 = unplaced, handled by a host fallback) and per-list fill counts.
    """
    n, a_max = choices.shape
    placed_list = jnp.full((n,), -1, jnp.int32)
    placed_pos = jnp.full((n,), -1, jnp.int32)
    used = jnp.zeros((num_list,), jnp.int32)
    iota = jnp.arange(n, dtype=jnp.int32)
    for a in range(a_max):
        cand = jnp.where(placed_list < 0, choices[:, a], num_list)
        order = jnp.argsort(cand, stable=True)
        sorted_cand = cand[order]
        counts = (
            jnp.zeros(num_list + 1, jnp.int32).at[cand].add(1)
        )
        starts = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]]
        )
        pos_in_seg = iota - starts[sorted_cand]
        safe_cand = jnp.clip(sorted_cand, 0, num_list - 1)
        slot = used[safe_cand] + pos_in_seg
        accept = (sorted_cand < num_list) & (slot < cap)
        placed_list = placed_list.at[order].set(
            jnp.where(accept, sorted_cand, placed_list[order])
        )
        placed_pos = placed_pos.at[order].set(
            jnp.where(accept, slot, placed_pos[order])
        )
        used = (
            used
            + jnp.zeros(num_list + 1, jnp.int32)
            .at[jnp.where(accept, sorted_cand, num_list)]
            .add(1)[:num_list]
        )
    return placed_list, placed_pos, used


@partial(jax.jit, static_argnums=(2, 3, 4))
def _pack_lists(
    vectors: jnp.ndarray,  # (N, D) float32
    flat_slot: jnp.ndarray,  # (N,) int64 destination slot per vector
    num_list: int,
    cap: int,
    storage_dtype,
):
    """Scatter row ids then gather rows into the (L, cap, D) block.

    One fused program: an eager op-by-op formulation compiles each step
    separately and is orders of magnitude slower on tunneled TPUs.

    int8 storage quantizes per row (scale = max|v| / 127, the SQ8
    scheme); scans multiply the dequantization scale back in.  Returns
    (ids_flat, packed_block, packed_scales) -- scales are all-ones for
    float dtypes.
    """
    n, d = vectors.shape
    total = num_list * cap
    ids_flat = (
        jnp.full((total,), -1, jnp.int32)
        .at[flat_slot]
        .set(jnp.arange(n, dtype=jnp.int32))
    )
    is_int8 = jnp.dtype(storage_dtype) == jnp.dtype("int8")

    def pack_chunk(ids_chunk):  # (C,) -> ((C, D) storage, (C,) scales)
        safe = jnp.clip(ids_chunk, 0, n - 1)
        gathered = jnp.where(
            (ids_chunk >= 0)[:, None], vectors[safe], 0.0
        )
        if is_int8:
            gathered = gathered.astype(jnp.float32)
            scale = jnp.max(jnp.abs(gathered), axis=1) / 127.0
            q = jnp.round(
                gathered / jnp.maximum(scale, 1e-30)[:, None]
            ).astype(jnp.int8)
            return q, scale.astype(jnp.float32)
        return (
            gathered.astype(storage_dtype),
            jnp.ones(ids_chunk.shape, jnp.float32),
        )

    # Chunk the gather+quantize so the float32 transient never exceeds
    # ~3 GB regardless of library size (multi-million-row builds).
    chunk = min(total, 1 << 20)
    n_chunks = -(-total // chunk)
    total_pad = n_chunks * chunk
    ids_padded = jnp.pad(
        ids_flat, (0, total_pad - total), constant_values=-1
    ).reshape(n_chunks, chunk)
    packed, scales = jax.lax.map(pack_chunk, ids_padded)
    packed = packed.reshape(total_pad, d)[:total]
    scales = scales.reshape(total_pad)[:total]
    return (
        ids_flat,
        packed.reshape(num_list, cap, d),
        scales.reshape(num_list, cap),
    )


@partial(jax.jit, static_argnums=(2, 3))
def _pack_prec(prec, ids_flat, num_list: int, cap: int):
    safe = jnp.clip(ids_flat, 0, prec.shape[0] - 1)
    return jnp.where(ids_flat >= 0, prec[safe], 0.0).reshape(
        num_list, cap
    )


# --------------------------------------------------------------------- #
# Search


@partial(jax.jit, static_argnums=(8, 9, 10, 11, 12, 13))
def _ivf_search_tile(
    padded_vectors: jnp.ndarray,  # (L, cap, D) storage dtype
    padded_ids: jnp.ndarray,  # (L, cap) int32, -1 = padding
    padded_prec: jnp.ndarray,  # (L, cap) float32 precursor m/z (0 pad)
    padded_scales: jnp.ndarray,  # (L, cap) float32 (int8 dequant; 1s)
    centroids: jnp.ndarray,  # (L, D) float32
    queries: jnp.ndarray,  # (TQ, D) float32
    q_prec: jnp.ndarray,  # (TQ,) float32 (ignored unless tol_val > 0)
    charge: jnp.ndarray,  # () float32 (Da-mode charge scaling)
    num_probe: int,
    budget: int,  # lists scanned by this tile
    list_chunk: int,
    k: int,
    tol_val: float,  # <= 0 disables the fused precursor window
    tol_mode: str,
):
    l, cap, d = padded_vectors.shape
    tq = queries.shape[0]
    coarse = jnp.dot(
        queries, centroids.T, preferred_element_type=jnp.float32
    )  # (TQ, L)
    _, probe_ids = jax.lax.top_k(coarse, min(num_probe, l))
    probed = jnp.zeros((tq, l), bool)
    rows = jnp.arange(tq)[:, None]
    probed = probed.at[rows, probe_ids].set(True)
    votes = jnp.sum(probed, axis=0)  # (L,)
    n_scan = min(budget, l)
    _, scan_lists = jax.lax.top_k(votes, n_scan)
    scanned = jnp.zeros((l,), bool).at[scan_lists].set(True)
    # Per-query coverage: did any of MY probed lists miss the budget?
    dropped = jnp.any(probed & ~scanned[None, :], axis=1)  # (TQ,)

    n_chunks = -(-n_scan // list_chunk)
    pad_lists = n_chunks * list_chunk
    scan_lists = jnp.concatenate(
        [scan_lists, jnp.zeros(pad_lists - n_scan, scan_lists.dtype)]
    )
    chunk_valid = jnp.arange(pad_lists) < n_scan

    def body(c, state):
        top_scores, top_ids = state
        lists = jax.lax.dynamic_slice(
            scan_lists, (c * list_chunk,), (list_chunk,)
        )
        lists_valid = jax.lax.dynamic_slice(
            chunk_valid, (c * list_chunk,), (list_chunk,)
        )
        vecs = padded_vectors[lists]  # (C, cap, D)
        ids = padded_ids[lists]  # (C, cap)
        if vecs.dtype == jnp.int8:
            vecs = vecs.astype(jnp.bfloat16)
        scores = jnp.einsum(
            "qd,cpd->qcp", queries, vecs,
            preferred_element_type=jnp.float32,
        )  # (TQ, C, cap)
        scores = scores * padded_scales[lists][None, :, :]
        mask = (
            probed[:, lists][:, :, None]
            & (ids >= 0)[None, :, :]
            & lists_valid[None, :, None]
        )
        if tol_val > 0:
            prec = padded_prec[lists]  # (C, cap)
            if tol_mode == "Da":
                window = (
                    jnp.abs(q_prec[:, None, None] - prec[None, :, :])
                    * charge
                    <= tol_val
                )
            else:  # ppm
                window = (
                    jnp.abs(q_prec[:, None, None] - prec[None, :, :])
                    / jnp.maximum(prec[None, :, :], 1e-6)
                    * 1e6
                    <= tol_val
                )
            mask &= window
        scores = jnp.where(mask, scores, -jnp.inf)
        flat_scores = scores.reshape(tq, -1)
        flat_ids = jnp.broadcast_to(
            ids.reshape(-1)[None, :], (tq, ids.size)
        )
        merged_scores = jnp.concatenate([top_scores, flat_scores], axis=1)
        merged_ids = jnp.concatenate([top_ids, flat_ids], axis=1)
        new_scores, pos = jax.lax.top_k(merged_scores, k)
        new_ids = jnp.take_along_axis(merged_ids, pos, axis=1)
        return new_scores, new_ids

    init = (
        jnp.full((tq, k), -jnp.inf, jnp.float32),
        jnp.full((tq, k), -1, jnp.int32),
    )
    top_scores, top_ids = jax.lax.fori_loop(0, n_chunks, body, init)
    top_ids = jnp.where(top_scores > -jnp.inf, top_ids, -1)
    return top_scores, top_ids, dropped


@partial(jax.jit, static_argnums=(8, 9, 10, 11))
def _ivf_search_perquery(
    padded_vectors: jnp.ndarray,  # (L, cap, D)
    padded_ids: jnp.ndarray,  # (L, cap)
    padded_prec: jnp.ndarray,  # (L, cap)
    padded_scales: jnp.ndarray,  # (L, cap)
    centroids: jnp.ndarray,  # (L, D)
    queries: jnp.ndarray,  # (B, D)
    q_prec: jnp.ndarray,  # (B,)
    charge: jnp.ndarray,  # ()
    num_probe: int,
    k: int,
    tol_val: float,
    tol_mode: str,
):
    """Exact per-query probe scan: each query gathers its OWN top
    `num_probe` lists (uniform caps make the gather static-shape) inside
    one `lax.scan` -- the batched fallback for query sets too divergent
    for tile-level list sharing, and a correctness oracle for the tiles.
    """
    l, cap, d = padded_vectors.shape
    p = min(num_probe, l)
    coarse = jnp.dot(
        queries, centroids.T, preferred_element_type=jnp.float32
    )
    _, probe_ids = jax.lax.top_k(coarse, p)  # (B, P)
    k_eff = min(k, p * cap)

    # Process queries in small groups: amortizes scan-step overhead while
    # keeping the per-group gather (G * P * cap * D) VMEM-sized.
    b = queries.shape[0]
    g = 8 if b % 8 == 0 else 1

    def group(carry, inp):
        q, qp, probes = inp  # (G, D), (G,), (G, P)
        vecs = padded_vectors[probes]  # (G, P, cap, D)
        ids = padded_ids[probes]  # (G, P, cap)
        if vecs.dtype == jnp.int8:
            vecs = vecs.astype(jnp.bfloat16)
        scores = jnp.einsum(
            "gd,gpcd->gpc", q, vecs, preferred_element_type=jnp.float32
        )
        scores = scores * padded_scales[probes]
        mask = ids >= 0
        if tol_val > 0:
            prec = padded_prec[probes]
            if tol_mode == "Da":
                mask &= (
                    jnp.abs(qp[:, None, None] - prec) * charge <= tol_val
                )
            else:
                mask &= (
                    jnp.abs(qp[:, None, None] - prec)
                    / jnp.maximum(prec, 1e-6) * 1e6
                    <= tol_val
                )
        flat = jnp.where(mask, scores, -jnp.inf).reshape(q.shape[0], -1)
        top_scores, pos = jax.lax.top_k(flat, k_eff)
        top_ids = jnp.take_along_axis(
            ids.reshape(q.shape[0], -1), pos, axis=1
        )
        top_ids = jnp.where(top_scores > -jnp.inf, top_ids, -1)
        return carry, (top_scores, top_ids)

    _, (scores, ids) = jax.lax.scan(
        group, 0,
        (
            queries.reshape(b // g, g, d),
            q_prec.reshape(b // g, g),
            probe_ids.reshape(b // g, g, -1),
        ),
    )
    scores = scores.reshape(b, k_eff)
    ids = ids.reshape(b, k_eff)
    if k_eff < k:
        scores = jnp.pad(
            scores, ((0, 0), (0, k - k_eff)), constant_values=-jnp.inf
        )
        ids = jnp.pad(ids, ((0, 0), (0, k - k_eff)), constant_values=-1)
    return scores, ids


class IvfIndex:
    """Inverted-file index over one charge partition."""

    def __init__(
        self,
        centroids: np.ndarray,
        padded_vectors: np.ndarray,  # (L, cap, D)
        padded_ids: np.ndarray,  # (L, cap)
        num_probe: int,
        padded_prec: Optional[np.ndarray] = None,  # (L, cap)
        padded_scales: Optional[np.ndarray] = None,  # (L, cap), int8 SQ
    ):
        self.centroids = centroids
        self.padded_vectors = padded_vectors
        self.padded_ids = padded_ids
        self.num_probe = num_probe
        if padded_prec is None:
            padded_prec = np.zeros(padded_ids.shape, np.float32)
        self.padded_prec = padded_prec
        if padded_scales is None:
            padded_scales = np.ones(padded_ids.shape, np.float32)
        self.padded_scales = padded_scales
        self._device = None
        # Sticky: once a query batch shows tile-level list sharing does
        # not pay (most rows overflow the vote budget), later batches on
        # this index go straight to the per-query scan.
        self._tiles_degenerate = False

    @property
    def num_list(self) -> int:
        return self.padded_vectors.shape[0]

    @property
    def bytes_per_vector(self) -> float:
        """Storage bytes per *indexed* vector incl. padding overhead."""
        n = int(np.sum(np.asarray(self.padded_ids) >= 0))
        total = (
            np.asarray(self.padded_vectors).nbytes
            + np.asarray(self.padded_ids).nbytes
            + np.asarray(self.padded_prec).nbytes
            + np.asarray(self.padded_scales).nbytes
        )
        return total / max(n, 1)

    def device_arrays(self):
        """Index blocks resident on the default device (uploaded once)."""
        if self._device is None:
            self._device = (
                jnp.asarray(self.padded_vectors),
                jnp.asarray(self.padded_ids),
                jnp.asarray(self.padded_prec),
                jnp.asarray(self.padded_scales),
                jnp.asarray(self.centroids, jnp.float32),
            )
        return self._device

    # ------------------------------------------------------------------ #

    @classmethod
    def build(
        cls,
        vectors,
        config,
        precursor_mz=None,
        seed: int = 42,
        storage_dtype=ml_dtypes.bfloat16,
    ) -> "IvfIndex":
        """Train the quantizer and pack balanced lists (the reference's
        FAISS train/add, spectral_library.py:163-181).

        Everything heavy runs on device: subsampled k-means training,
        blocked top-A centroid assignment, sort-based balanced list
        filling, and the final gather into the (L, cap, D) block.  Only
        assignment *failures* (vectors whose A=4 nearest lists are all
        full -- rare) fall back to a host pass.
        """
        num_list = int(config.num_list)
        # f32 or bf16 source (bf16 halves HBM during multi-million-row
        # builds; all matmuls accumulate f32 either way).
        vectors_d = jnp.asarray(vectors)
        n, d = vectors_d.shape
        cap = max(8, int(-(-_FILL_SLACK * n / num_list // 8) * 8))
        logger.info(
            "Train IVF index: %d vectors, %d lists (cap %d)",
            n, num_list, cap,
        )
        centroids, _ = spherical_kmeans(
            vectors_d, num_list, seed=seed,
            max_points_per_centroid=_TRAIN_POINTS_PER_CENTROID,
        )
        choices = assign_topk_blocked(
            vectors_d, centroids, min(_N_CHOICES, num_list)
        )
        placed_list, placed_pos, used = _fill_lists(choices, num_list, cap)
        placed_list = np.array(placed_list)  # writable host copies
        placed_pos = np.array(placed_pos)
        unplaced = np.nonzero(placed_list < 0)[0]
        if len(unplaced):
            # All A choices full: place into any list with free slots.
            used_np = np.asarray(used).copy()
            order = np.argsort(used_np)
            free_slots = []
            for list_id in order:
                free_slots.extend(
                    (list_id, pos)
                    for pos in range(used_np[list_id], cap)
                )
                if len(free_slots) >= len(unplaced):
                    break
            if len(free_slots) < len(unplaced):
                raise RuntimeError(
                    "IVF capacity exhausted; raise _FILL_SLACK"
                )
            for row, (list_id, pos) in zip(unplaced, free_slots):
                placed_list[row] = list_id
                placed_pos[row] = pos
            logger.debug(
                "IVF spill fallback placed %d vectors", len(unplaced)
            )
        flat_slot = (
            placed_list.astype(np.int64) * cap + placed_pos
        )
        ids_flat, padded_vectors, padded_scales = _pack_lists(
            vectors_d, jnp.asarray(flat_slot), num_list, cap,
            jnp.dtype(storage_dtype),
        )
        padded_ids = ids_flat.reshape(num_list, cap)
        if precursor_mz is not None:
            padded_prec = _pack_prec(
                jnp.asarray(precursor_mz, jnp.float32), ids_flat,
                num_list, cap,
            )
        else:
            padded_prec = jnp.zeros((num_list, cap), jnp.float32)
        spilled = int(np.sum(placed_list != np.asarray(choices[:, 0])))
        logger.debug(
            "IVF lists: cap=%d fill=%.2f spilled=%d (%.2f%%)",
            cap, n / (num_list * cap), spilled, 100.0 * spilled / max(n, 1),
        )
        return cls(
            np.asarray(centroids), padded_vectors, padded_ids,
            int(config.num_probe), padded_prec, padded_scales,
        )

    @classmethod
    def load_or_build(
        cls, filename: str, lib, config
    ) -> "IvfIndex":
        """Load a persisted index, or vectorize the charge block and build
        one (reference spectral_library.py:109-116,490)."""
        if os.path.isfile(filename):
            try:
                return cls.load(filename, int(config.num_probe))
            except OSError as e:
                logger.warning("Failed to load ANN index %s: %s", filename, e)
        logger.warning(
            "Missing ANN index for %s; building", os.path.basename(filename)
        )
        from ann_solo_tpu.models.vectorize import (
            VectorizeParams,
            vectorize_batch,
        )

        vparams = VectorizeParams.from_config(config)
        tables = vparams.device_tables()
        chunks = []
        step = 8192
        for start in range(0, lib.n_spectra, step):
            stop = min(start + step, lib.n_spectra)
            chunks.append(
                vectorize_batch(
                    vparams, tables,
                    lib.mz[start:stop], lib.intensity[start:stop],
                    lib.n_peaks[start:stop],
                )
            )
        vectors = jnp.concatenate(chunks, axis=0)
        dtype_by_name = {
            "bf16": ml_dtypes.bfloat16,
            "f32": np.float32,
            "int8": np.int8,
        }
        try:
            dtype_name = str(config.index_dtype)
        except (KeyError, AttributeError):  # config without the TPU knob
            dtype_name = "bf16"
        index = cls.build(
            vectors, config,
            precursor_mz=np.asarray(lib.precursor_mz, np.float32),
            storage_dtype=dtype_by_name[dtype_name],
        )
        index.save(filename)
        return index

    def save(self, filename: str) -> None:
        with h5py.File(filename, "w") as f:
            f.create_dataset("centroids", data=np.asarray(self.centroids))
            vectors = np.asarray(self.padded_vectors)
            if vectors.dtype == ml_dtypes.bfloat16:
                ds = f.create_dataset(
                    "padded_vectors_bf16", data=vectors.view(np.uint16)
                )
                ds.attrs["dtype"] = "bfloat16"
            else:
                f.create_dataset("padded_vectors", data=vectors)
            f.create_dataset(
                "padded_ids", data=np.asarray(self.padded_ids)
            )
            f.create_dataset(
                "padded_prec", data=np.asarray(self.padded_prec)
            )
            f.create_dataset(
                "padded_scales", data=np.asarray(self.padded_scales)
            )

    @classmethod
    def load(cls, filename: str, num_probe: int) -> "IvfIndex":
        with h5py.File(filename, "r") as f:
            if "padded_vectors_bf16" in f:
                vectors = (
                    f["padded_vectors_bf16"][()].view(ml_dtypes.bfloat16)
                )
            else:
                vectors = f["padded_vectors"][()]
            return cls(
                f["centroids"][()],
                vectors,
                f["padded_ids"][()],
                num_probe,
                f["padded_prec"][()] if "padded_prec" in f else None,
                f["padded_scales"][()] if "padded_scales" in f else None,
            )

    # ------------------------------------------------------------------ #

    def search(
        self,
        queries: np.ndarray,
        k: int,
        num_probe: Optional[int] = None,
        q_prec: Optional[np.ndarray] = None,
        charge: float = 1.0,
        tol_val: float = 0.0,
        tol_mode: str = "Da",
    ) -> np.ndarray:
        """Top-k neighbor row ids per query ((B, k) int32, -1 padded).

        Queries are sorted by their nearest centroid so tiles probe
        coherent list unions; results return in input order.  When
        `tol_val` > 0, the precursor window (|q - l| * charge <= tol in
        Da mode, ppm otherwise) is fused into the scan mask.  Per-query
        probe semantics are exact: tile-budget overflow is detected on
        device and the affected queries re-run alone, where the scanned
        set equals their own top-num_probe lists.
        """
        ids, _ = self.search_with_scores(
            queries, k, num_probe, q_prec, charge, tol_val, tol_mode,
            return_scores=False,
        )
        return ids

    def search_with_scores(
        self,
        queries: np.ndarray,
        k: int,
        num_probe: Optional[int] = None,
        q_prec: Optional[np.ndarray] = None,
        charge: float = 1.0,
        tol_val: float = 0.0,
        tol_mode: str = "Da",
        return_scores: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Like `search` but also returns the inner-product scores.

        `queries` may be a device array: the sticky-degenerate fast path
        then runs without any host round-trip of the query vectors
        (tunneled TPUs pay ~10-20ms per avoidable MB each way).  With
        `return_scores=False` the (B, k) score download is skipped too.
        """
        num_probe = int(num_probe or self.num_probe)
        b = len(queries)
        if b == 0:
            return (
                np.zeros((0, k), np.int32),
                np.zeros((0, k), np.float32),
            )
        if q_prec is None:
            q_prec = np.zeros(b, np.float32)
            tol_val = 0.0
        vectors_d, ids_d, prec_d, scales_d, centroids_d = (
            self.device_arrays()
        )
        charge_d = jnp.float32(charge)
        l = self.num_list
        budget = min(l, max(_TILE_LIST_SLACK * num_probe, num_probe + 8))
        # (budget >= l tiles scan everything masked: nothing can drop and
        # the shared scan beats per-query gathers -- keep tiles then.)
        if self._tiles_degenerate and budget < l:
            # Device-resident fast path: all queries through the exact
            # per-query gather scan, one program, one download.
            scores, ids = _ivf_search_perquery(
                vectors_d, ids_d, prec_d, scales_d, centroids_d,
                jnp.asarray(queries, jnp.float32),
                jnp.asarray(q_prec, jnp.float32),
                charge_d, num_probe, k, tol_val, tol_mode,
            )
            return (
                np.asarray(ids),
                np.asarray(scores) if return_scores else None,
            )

        queries = np.asarray(queries, np.float32)
        q_prec = np.asarray(q_prec, np.float32)
        out_ids = np.full((b, k), -1, np.int32)
        out_scores = np.full((b, k), -np.inf, np.float32)
        tiles_degenerate = False
        top1 = np.asarray(
            jnp.argmax(
                jnp.dot(jnp.asarray(queries), centroids_d.T,
                        preferred_element_type=jnp.float32),
                axis=1,
            )
        )
        order = np.argsort(top1, kind="stable")
        retry_rows = []
        for start in range(0, b, _TILE_Q):
            rows = order[start : start + _TILE_Q]
            if tiles_degenerate:
                # The query set shares too few lists for tile-level
                # sharing (first tile dropped most rows): skip straight
                # to the exact per-query gather scan.
                retry_rows.extend(rows)
                continue
            tile = queries[rows]
            tile_prec = q_prec[rows]
            if len(tile) < _TILE_Q:  # pad tail tile to the compiled shape
                pad = _TILE_Q - len(tile)
                tile = np.concatenate(
                    [tile, np.zeros((pad, tile.shape[1]), np.float32)]
                )
                tile_prec = np.concatenate(
                    [tile_prec, np.zeros(pad, np.float32)]
                )
            scores, ids, dropped = _ivf_search_tile(
                vectors_d, ids_d, prec_d, scales_d, centroids_d,
                tile, tile_prec, charge_d,
                num_probe, budget, _LIST_CHUNK, k, tol_val, tol_mode,
            )
            dropped = np.asarray(dropped)[: len(rows)]
            out_ids[rows] = np.asarray(ids)[: len(rows)]
            out_scores[rows] = np.asarray(scores)[: len(rows)]
            retry_rows.extend(rows[dropped])
            if start == 0 and budget < l and dropped.mean() > 0.5:
                tiles_degenerate = True
                self._tiles_degenerate = True
        if retry_rows and budget < l:
            # Exact batched fallback: queries whose probes overflowed the
            # tile budget re-run through the per-query gather scan (their
            # own top-num_probe lists, nothing shared, nothing dropped).
            logger.debug(
                "IVF probe-budget overflow for %d/%d queries; "
                "per-query rerun", len(retry_rows), b,
            )
            retry_rows = np.asarray(retry_rows)
            # Pad the retry set to a power of two: bounded recompiles.
            n_retry = len(retry_rows)
            n_pad = 1
            while n_pad < n_retry:
                n_pad *= 2
            padded_rows = np.concatenate(
                [retry_rows, np.full(n_pad - n_retry, retry_rows[0])]
            )
            scores, ids = _ivf_search_perquery(
                vectors_d, ids_d, prec_d, scales_d, centroids_d,
                jnp.asarray(queries[padded_rows]),
                jnp.asarray(q_prec[padded_rows]),
                charge_d, num_probe, k, tol_val, tol_mode,
            )
            out_ids[retry_rows] = np.asarray(ids)[:n_retry]
            out_scores[retry_rows] = np.asarray(scores)[:n_retry]
        return out_ids, out_scores


def bruteforce_search(
    library_vectors: np.ndarray,
    queries: np.ndarray,
    k: int,
    block: int = 16384,
) -> np.ndarray:
    """Exact max-inner-product top-k (oracle for IVF recall tests)."""
    queries = jnp.asarray(queries, jnp.float32)
    n = library_vectors.shape[0]
    k = min(k, n)
    top_scores = jnp.full((queries.shape[0], k), -jnp.inf, jnp.float32)
    top_ids = jnp.full((queries.shape[0], k), -1, jnp.int32)
    for start in range(0, n, block):
        chunk = jnp.asarray(
            library_vectors[start : start + block], jnp.float32
        )
        scores = jnp.dot(
            queries, chunk.T, preferred_element_type=jnp.float32
        )
        ids = jnp.arange(start, start + chunk.shape[0], dtype=jnp.int32)
        merged_scores = jnp.concatenate([top_scores, scores], axis=1)
        merged_ids = jnp.concatenate(
            [top_ids,
             jnp.broadcast_to(ids[None, :],
                              (queries.shape[0], chunk.shape[0]))],
            axis=1,
        )
        top_scores, pos = jax.lax.top_k(merged_scores, k)
        top_ids = jnp.take_along_axis(merged_ids, pos, axis=1)
    return np.asarray(top_ids)
