"""TPU-native IVF (inverted file) approximate-nearest-neighbor index.

From-scratch replacement for the FAISS IndexIVFFlat dependency
(reference spectral_library.py:133-183, 457-500):

* **Train/add**: on-device spherical k-means (ops/kmeans.py) assigns every
  library vector to a list; lists are stored *list-major* as a padded
  (num_list, list_pad, D) block plus original-row id maps -- scanning a list
  is one contiguous MXU matmul, no pointer chasing.
* **Search**: queries are sorted by their top coarse centroid so nearby
  queries share lists, then processed in tiles: each tile scans the union of
  its members' probed lists (top `tile_lists` by votes) as blocked matmuls
  with a per-query probed-list mask, maintaining a running top-k.  This
  trades FAISS's per-query list walks for tile-coherent MXU scans -- the
  idiomatic TPU formulation.
* **Persistence**: one .h5 file per charge, named with the hyperparameter
  hash like the reference's .idxann files (spectral_library.py:98-116).

Recall parity is measured against brute force (BASELINE.md: 75.1% of
brute-force SSMs at k=1024), which tests/test_ivf.py checks on synthetic
data.
"""

from __future__ import annotations

import logging
import os
from functools import partial
from typing import Optional

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from ann_solo_tpu.ops.kmeans import spherical_kmeans

logger = logging.getLogger(__name__)

_TILE_Q = 128  # queries per search tile
_LIST_CHUNK = 8  # lists scanned per inner step
_TILE_LIST_SLACK = 4  # tile scans up to slack * num_probe voted lists


def ivf_index_filename(
    library_filename: str, config_hash: str, charge: int
) -> str:
    base = os.path.splitext(library_filename)[0]
    return f"{base}_{config_hash[:7]}_{charge}.ivf.h5"


@partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _ivf_search_tile(
    padded_vectors: jnp.ndarray,  # (L, P, D)
    padded_ids: jnp.ndarray,  # (L, P) int32, -1 = padding
    centroids: jnp.ndarray,  # (L, D)
    queries: jnp.ndarray,  # (TQ, D)
    num_probe: int,
    tile_lists: int,
    list_chunk: int,
    k: int,
):
    l, p, d = padded_vectors.shape
    tq = queries.shape[0]
    coarse = jnp.dot(
        queries, centroids.T, preferred_element_type=jnp.float32
    )  # (TQ, L)
    _, probe_ids = jax.lax.top_k(coarse, min(num_probe, l))  # (TQ, probes)
    # Per-query probed mask + tile-level votes.
    probed = jnp.zeros((tq, l), bool)
    rows = jnp.arange(tq)[:, None]
    probed = probed.at[rows, probe_ids].set(True)
    votes = jnp.sum(probed, axis=0)  # (L,)
    n_tile_lists = min(tile_lists, l)
    _, tile_list_ids = jax.lax.top_k(votes, n_tile_lists)  # (T_L,)

    n_chunks = -(-n_tile_lists // list_chunk)
    pad_lists = n_chunks * list_chunk
    tile_list_ids = jnp.concatenate(
        [tile_list_ids,
         jnp.zeros(pad_lists - n_tile_lists, tile_list_ids.dtype)]
    )
    chunk_valid = (
        jnp.arange(pad_lists) < n_tile_lists
    )  # padding chunks masked

    def body(c, state):
        top_scores, top_ids = state
        lists = jax.lax.dynamic_slice(
            tile_list_ids, (c * list_chunk,), (list_chunk,)
        )
        lists_valid = jax.lax.dynamic_slice(
            chunk_valid, (c * list_chunk,), (list_chunk,)
        )
        vecs = padded_vectors[lists]  # (C, P, D)
        ids = padded_ids[lists]  # (C, P)
        scores = jnp.einsum(
            "qd,cpd->qcp", queries, vecs,
            preferred_element_type=jnp.float32,
        )  # (TQ, C, P)
        # Mask: query probed this list AND the row is a real vector AND the
        # chunk slot is a real list.
        q_probes_list = probed[:, lists]  # (TQ, C)
        mask = (
            q_probes_list[:, :, None]
            & (ids >= 0)[None, :, :]
            & lists_valid[None, :, None]
        )
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
    return top_scores, jnp.where(top_scores > -jnp.inf, top_ids, -1)


class IvfIndex:
    """Inverted-file index over one charge partition."""

    def __init__(
        self,
        centroids: np.ndarray,
        padded_vectors: np.ndarray,
        padded_ids: np.ndarray,
        num_probe: int,
    ):
        self.centroids = centroids
        self.padded_vectors = padded_vectors
        self.padded_ids = padded_ids
        self.num_probe = num_probe
        self._device = None

    def device_arrays(self):
        """Index blocks resident on the default device (uploaded once)."""
        if self._device is None:
            self._device = (
                jnp.asarray(self.padded_vectors),
                jnp.asarray(self.padded_ids),
                jnp.asarray(self.centroids),
            )
        return self._device

    # ------------------------------------------------------------------ #

    @classmethod
    def build(
        cls,
        vectors,
        config,
        seed: int = 42,
    ) -> "IvfIndex":
        """Train the quantizer and pack lists (reference's train/add,
        spectral_library.py:163-181).

        Accepts NumPy or device arrays; the vector matrix never leaves the
        device -- only the (N,) assignment vector is downloaded to compute
        the list layout, and the padded list-major blocks are built with an
        on-device gather.
        """
        num_list = int(config.num_list)
        logger.info(
            "Train IVF index: %d vectors, %d lists", len(vectors), num_list
        )
        vectors_d = jnp.asarray(vectors, jnp.float32)
        centroids, assignments = spherical_kmeans(
            vectors_d, num_list, seed=seed
        )
        assignments = np.asarray(assignments)  # (N,) int32: small download
        counts = np.bincount(assignments, minlength=num_list)
        list_pad = max(8, int(-(-counts.max() // 8) * 8))
        padded_ids = np.full((num_list, list_pad), -1, np.int32)
        for list_id in range(num_list):
            members = np.nonzero(assignments == list_id)[0]
            padded_ids[list_id, : len(members)] = members
        ids_d = jnp.asarray(padded_ids)
        padded_vectors_d = jnp.where(
            (ids_d >= 0)[:, :, None],
            vectors_d[jnp.clip(ids_d, 0, len(assignments) - 1)],
            0.0,
        )
        logger.debug(
            "IVF lists: max=%d mean=%.1f pad=%d fill=%.2f",
            counts.max(), counts.mean(), list_pad,
            counts.mean() / max(list_pad, 1),
        )
        return cls(
            centroids, padded_vectors_d, ids_d, int(config.num_probe)
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
        tables = vparams.tables()
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
        index = cls.build(vectors, config)
        index.save(filename)
        return index

    def save(self, filename: str) -> None:
        with h5py.File(filename, "w") as f:
            f.create_dataset("centroids", data=np.asarray(self.centroids))
            f.create_dataset(
                "padded_vectors", data=np.asarray(self.padded_vectors)
            )
            f.create_dataset(
                "padded_ids", data=np.asarray(self.padded_ids)
            )

    @classmethod
    def load(cls, filename: str, num_probe: int) -> "IvfIndex":
        with h5py.File(filename, "r") as f:
            return cls(
                f["centroids"][()],
                f["padded_vectors"][()],
                f["padded_ids"][()],
                num_probe,
            )

    # ------------------------------------------------------------------ #

    def search(
        self,
        queries: np.ndarray,
        k: int,
        num_probe: Optional[int] = None,
    ) -> np.ndarray:
        """Top-k neighbor row ids per query ((B, k) int32, -1 padded).

        Queries are sorted by their nearest centroid so tiles probe
        coherent list unions; results are returned in input order.
        """
        num_probe = num_probe or self.num_probe
        b = len(queries)
        if b == 0:
            return np.zeros((0, k), np.int32)
        queries = np.asarray(queries, np.float32)
        vectors_d, ids_d, centroids_d = self.device_arrays()
        top1 = np.asarray(
            jnp.argmax(
                jnp.dot(jnp.asarray(queries), centroids_d.T,
                        preferred_element_type=jnp.float32),
                axis=1,
            )
        )
        order = np.argsort(top1, kind="stable")
        n_lists = self.padded_vectors.shape[0]
        # Budget of lists scanned per tile: covers the tile's probe union
        # in the sparse-probe regime; degrades to a full (masked) scan when
        # num_probe is a large fraction of num_list, where a full MXU scan
        # is the faster plan anyway.
        tile_lists = min(
            n_lists,
            max(_TILE_LIST_SLACK * num_probe, num_probe + 8),
        )
        out = np.full((b, k), -1, np.int32)
        for start in range(0, b, _TILE_Q):
            rows = order[start : start + _TILE_Q]
            tile = queries[rows]
            if len(tile) < _TILE_Q:  # pad tail tile to the compiled shape
                tile = np.concatenate(
                    [tile,
                     np.zeros((_TILE_Q - len(tile), tile.shape[1]),
                              np.float32)]
                )
            _, ids = _ivf_search_tile(
                vectors_d, ids_d, centroids_d,
                tile, num_probe, tile_lists, _LIST_CHUNK, k,
            )
            out[rows] = np.asarray(ids)[: len(rows)]
        return out


def bruteforce_search(
    library_vectors: np.ndarray,
    queries: np.ndarray,
    k: int,
    block: int = 16384,
) -> np.ndarray:
    """Exact max-inner-product top-k (oracle for IVF recall tests).

    Also the fast path when num_probe is a large fraction of num_list: one
    tiled MXU matmul beats gather-based list scans at moderate library
    sizes.
    """
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
