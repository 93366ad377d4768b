"""On-device spherical k-means for IVF coarse quantizer training.

Replaces FAISS's CPU/GPU k-means (`IndexIVFFlat.train`,
reference spectral_library.py:174-179).  Vectors are unit-norm (hashed
spectra), so inner-product assignment == L2 assignment; centroids are
re-normalized every iteration (spherical k-means), keeping the train-time
metric identical to the search-time IP quantizer.

The update step is a segment-sum over assignments and the whole training
loop is one `lax.fori_loop` under jit; assignment runs as blocked MXU
matmuls.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_BLOCK = 4096


def blocked_assign_sums(vectors_padded, centroids):
    """Per-cluster (sums (L, D), counts (L,)) of a zero-row-padded block
    under nearest-centroid assignment, as blocked MXU matmuls.

    This is the k-means accumulation step shared by the single-device
    fit and the sharded trainer (parallel/sharded.sharded_kmeans_step):
    a (B, L) masked one-hot assignment matrix per 4096-row block,
    `onehot.T @ block` on the MXU -- a segment-sum would
    scatter-serialize (measured on the sharded trainer: the
    segment-sum formulation took 1,004 s of a 1,044 s born-sharded
    2.1M-row build on one v5e chip; this formulation trains the same
    subsample inside the 40 s single-chip build).  Zero-padded rows
    carry weight 0 and contribute nothing.  Requires
    ``vectors_padded.shape[0] % _BLOCK == 0``.
    """
    n_pad, d = vectors_padded.shape
    l = centroids.shape[0]
    starts = jnp.arange(0, n_pad, _BLOCK, dtype=jnp.int32)
    cluster_iota = jnp.arange(l, dtype=jnp.int32)[None, :]

    def body(carry, start):
        sums, counts = carry
        vec_block = jax.lax.dynamic_slice_in_dim(
            vectors_padded, start, _BLOCK
        )
        scores = jnp.dot(
            vec_block, centroids.T, preferred_element_type=jnp.float32
        )
        ids = jnp.argmax(scores, axis=1).astype(jnp.int32)
        # Zero-padded rows contribute nothing (row-norm mask).
        w = (
            jnp.sum(vec_block * vec_block, axis=1) > 0
        ).astype(jnp.float32)
        onehot = (
            (ids[:, None] == cluster_iota).astype(jnp.float32)
            * w[:, None]
        )  # (B, L)
        sums = sums + jnp.dot(
            onehot.T, vec_block, preferred_element_type=jnp.float32
        )
        counts = counts + jnp.sum(onehot, axis=0)
        return (sums, counts), None

    (sums, counts), _ = jax.lax.scan(
        body,
        (jnp.zeros((l, d), jnp.float32), jnp.zeros((l,), jnp.float32)),
        starts,
    )
    return sums, counts


@partial(jax.jit, static_argnums=(2,))
def _kmeans_fit(
    vectors_padded: jnp.ndarray,  # (N_pad, D) unit-norm, zero rows padded
    init_centroids: jnp.ndarray,  # (L, D)
    n_iter: int,
):
    """Blocked spherical k-means: nothing (N, L)-shaped is ever
    materialized, so training scales to millions of rows -- the (B, L)
    score block and the (L, D) partial sums are the only transients.

    Blocks are cut with `dynamic_slice` on the 2D source, NOT a
    (n_blocks, B, D) reshape: with TPU tiled layouts XLA materializes
    that reshape as a loop-carried COPY of the whole training block
    (measured: a 2M x 800 f32 fit held 2 x 6.4 GB and OOMed the 4M-row
    streaming build's training step)."""
    n_pad, d = vectors_padded.shape
    starts = jnp.arange(0, n_pad, _BLOCK, dtype=jnp.int32)

    def assign_block(vec_block, centroids):
        scores = jnp.dot(
            vec_block, centroids.T, preferred_element_type=jnp.float32
        )  # (B, L)
        return jnp.argmax(scores, axis=1).astype(jnp.int32)

    def step(_, centroids):
        sums, counts = blocked_assign_sums(vectors_padded, centroids)
        counts = counts[:, None]
        new_centroids = sums / jnp.maximum(counts, 1.0)
        # Keep the previous centroid for empty clusters.
        new_centroids = jnp.where(counts > 0, new_centroids, centroids)
        norms = jnp.linalg.norm(new_centroids, axis=1, keepdims=True)
        return new_centroids / jnp.maximum(norms, 1e-30)

    centroids = jax.lax.fori_loop(0, n_iter, step, init_centroids)

    def final_assign(carry, start):
        vec_block = jax.lax.dynamic_slice_in_dim(
            vectors_padded, start, _BLOCK
        )
        return carry, assign_block(vec_block, centroids)

    _, assignments = jax.lax.scan(final_assign, 0, starts)
    return centroids, assignments.reshape(-1)


@partial(jax.jit, static_argnums=(2,))
def _assign_topk_block(vectors, centroids, k_choices: int):
    scores = jnp.dot(
        vectors, centroids.T, preferred_element_type=jnp.float32
    )
    _, ids = jax.lax.top_k(scores, k_choices)
    return ids.astype(jnp.int32)


def assign_topk_blocked(
    vectors, centroids, k_choices: int, block: int = 65536
):
    """Top-`k_choices` nearest centroids per vector ((N, A) int32).

    Blocked MXU matmuls over the row axis; inputs may be device arrays
    (f32 or bf16; results stay on device).
    """
    vectors = jnp.asarray(vectors)
    n = vectors.shape[0]
    if n <= block:
        return _assign_topk_block(vectors, centroids, k_choices)
    outs = [
        _assign_topk_block(
            vectors[start : start + block], centroids, k_choices
        )
        for start in range(0, n, block)
    ]
    return jnp.concatenate(outs, axis=0)


@partial(jax.jit, static_argnums=(3,))
def _soar_rerank_block(vectors, centroids, choices, lam: float):
    v = vectors.astype(jnp.float32)
    c = centroids[choices]  # (B, A, D)
    s = jnp.einsum(
        "bd,bad->ba", v, c, preferred_element_type=jnp.float32
    )
    r1 = v - c[:, 0, :]
    r1 = r1 / jnp.maximum(
        jnp.linalg.norm(r1, axis=1, keepdims=True), 1e-9
    )
    proj = jnp.einsum(
        "bad,bd->ba", v[:, None, :] - c, r1,
        preferred_element_type=jnp.float32,
    )
    obj = s - (lam / 2.0) * proj * proj
    # The primary (rank-0) list is excluded: argsort pushes it last and
    # the caller drops the final column.
    obj = obj.at[:, 0].set(-jnp.inf)
    order = jnp.argsort(-obj, axis=1, stable=True)
    return jnp.take_along_axis(choices, order, axis=1)[:, :-1]


def soar_round2_choices(
    vectors, centroids, choices, lam: float, block: int = 8192
):
    """Secondary-copy candidate ranking under the SOAR objective.

    ScaNN/SOAR (Sun et al., "SOAR: improved indexing for approximate
    nearest neighbor search", NeurIPS 2023) places a vector's redundant
    copy in the list minimizing quantization loss ALONG the primary
    residual direction: queries that miss the primary list are exactly
    those displaced along that residual, so the second copy should
    cover it.  For spherical lists the objective per candidate list l
    reduces to

        v . c_l  -  (lam / 2) * ((v - c_l) . r1_hat)^2

    maximized over the non-primary candidates (r1_hat = normalized
    primary residual).  Round-4 measurement on the 200k-spectrum
    corpus (tools/probe_diag.py methodology, capacity-unconstrained):
    probed-list recall@256 probes 0.9780 (rank-2 assignment) ->
    0.9828 (lam=1.0), at identical storage and scan cost.

    Returns (N, A-1) int32: candidate lists for the second balanced
    fill round, best first, primary excluded.  The default block keeps
    the (B, A, D) gather transients a few hundred MB at D=800, A=16
    (multi-million-row builds run next to the packed index block).
    Per-row math is blocking-independent, so any block size produces
    identical rankings (the sharded build relies on this).
    """
    vectors = jnp.asarray(vectors)
    choices = jnp.asarray(choices, jnp.int32)
    centroids = jnp.asarray(centroids, jnp.float32)
    n = vectors.shape[0]
    if n <= block:
        return _soar_rerank_block(vectors, centroids, choices, lam)
    outs = [
        _soar_rerank_block(
            vectors[start : start + block], centroids,
            choices[start : start + block], lam,
        )
        for start in range(0, n, block)
    ]
    return jnp.concatenate(outs, axis=0)


def spherical_kmeans(
    vectors,
    n_clusters: int,
    n_iter: int = 25,
    seed: int = 42,
    max_points_per_centroid: int = 0,
):
    """Train spherical k-means; returns (centroids (L, D), assignments (N,)).

    Accepts a NumPy or device array; all heavy data stays on device (only
    the small centroid/init blocks cross the host boundary).
    Initialization samples distinct vectors (FAISS-style random init).
    With `max_points_per_centroid` > 0 the fit runs on a random subsample
    of at most `n_clusters * max_points_per_centroid` vectors (FAISS's
    subsampling rule) and only the returned assignments cover all rows.
    """
    vectors = jnp.asarray(vectors)  # f32 or bf16; MXU accumulates f32
    n, d = vectors.shape
    cap = (
        n_clusters * max_points_per_centroid
        if max_points_per_centroid > 0
        else n
    )
    if n > cap:
        rng_sub = np.random.RandomState(seed + 1)
        sub_idx = rng_sub.choice(n, size=cap, replace=False)
        centroids, _ = spherical_kmeans(
            vectors[jnp.asarray(np.sort(sub_idx))], n_clusters,
            n_iter=n_iter, seed=seed,
        )
        assignments = assign_topk_blocked(vectors, centroids, 1)[:, 0]
        return centroids, assignments
    rng = np.random.RandomState(seed)
    init_idx = rng.choice(n, size=min(n_clusters, n), replace=False)
    init = vectors[jnp.asarray(init_idx)]
    if init.shape[0] < n_clusters:
        # Fewer vectors than clusters: tile with small jitter.
        reps = -(-n_clusters // init.shape[0])
        init = jnp.tile(init, (reps, 1))[:n_clusters]
        init = init + jnp.asarray(
            rng.normal(0, 1e-4, init.shape), jnp.float32
        )
    # Centroids always live in f32 (the fori_loop carry dtype must be
    # stable even for bf16 source vectors).
    init = init.astype(jnp.float32)
    init = init / jnp.maximum(
        jnp.linalg.norm(init, axis=1, keepdims=True), 1e-30
    )

    n_pad = max(_BLOCK, -(-n // _BLOCK) * _BLOCK)
    if n_pad == n:
        padded = vectors  # no copy for block-aligned inputs
    else:
        padded = jnp.zeros((n_pad, d), vectors.dtype).at[:n].set(vectors)
    centroids, assignments = _kmeans_fit(padded, init, n_iter)
    return centroids, assignments[:n]
