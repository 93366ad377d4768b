"""ICI-sharded library search and index build (shard_map + collectives).

TPU-native equivalents of what the reference cannot do at all (it is
single-device, SURVEY.md §2.3):

* `sharded_topk_search`: library vectors sharded over the 'lib' mesh axis,
  query batches sharded over 'dp'; each shard computes masked local scores
  on its MXU, takes a local top-k, and the per-shard top-k blocks are
  all-gathered over ICI and merged -- communication is O(k), never O(N).
* `sharded_kmeans_step`: one k-means update with library rows sharded over
  the whole mesh; partial sums reduce with psum (index build at 100M+ scale).
* `sharded_search_step`: the framework's "training step" analog -- a single
  jitted program combining a sharded k-means update (index build) with a
  sharded masked top-k search, used by the multi-chip dry run.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def _masked_local_scores(
    queries, query_prec, lib_vectors, lib_prec, charge, tol
):
    """Local MXU scan with the precursor window mask fused in."""
    scores = jnp.dot(
        queries, lib_vectors.T, preferred_element_type=jnp.float32
    )
    window = (
        jnp.abs(query_prec[:, None] - lib_prec[None, :]) * charge <= tol
    )
    valid = jnp.sum(lib_vectors * lib_vectors, axis=1) > 0  # pad rows
    return jnp.where(window & valid[None, :], scores, -jnp.inf)


def sharded_topk_search(
    mesh: Mesh,
    lib_vectors,  # (N, D) to shard over 'lib'
    lib_prec,  # (N,)
    queries,  # (B, D) to shard over 'dp'
    query_prec,  # (B,)
    k: int,
    charge: float,
    tol: float,
):
    """Masked top-k candidate selection over a (dp, lib) mesh.

    Returns (ids, scores): (B, k) global library row ids per query.
    """
    n = lib_vectors.shape[0]
    lib_shards = mesh.shape["lib"]
    assert n % lib_shards == 0, "library must pad to the shard count"
    shard_size = n // lib_shards

    def local(queries_l, query_prec_l, lib_l, lib_prec_l):
        scores = _masked_local_scores(
            queries_l, query_prec_l, lib_l, lib_prec_l, charge, tol
        )
        local_scores, local_ids = jax.lax.top_k(
            scores, min(k, shard_size)
        )
        shard_idx = jax.lax.axis_index("lib")
        global_ids = local_ids + shard_idx * shard_size
        # Merge per-shard top-k over the ICI ring.
        all_scores = jax.lax.all_gather(
            local_scores, "lib", axis=0, tiled=False
        )  # (S, B_l, k)
        all_ids = jax.lax.all_gather(global_ids, "lib", axis=0)
        s, b_l, kk = all_scores.shape
        merged_scores = jnp.transpose(all_scores, (1, 0, 2)).reshape(
            b_l, s * kk
        )
        merged_ids = jnp.transpose(all_ids, (1, 0, 2)).reshape(
            b_l, s * kk
        )
        top_scores, pos = jax.lax.top_k(merged_scores, k)
        top_ids = jnp.take_along_axis(merged_ids, pos, axis=1)
        top_ids = jnp.where(top_scores > -jnp.inf, top_ids, -1)
        return top_ids, top_scores

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("dp", None), P("dp"), P("lib", None), P("lib")),
        out_specs=(P("dp", None), P("dp", None)),
        check_vma=False,
    )
    return fn(queries, query_prec, lib_vectors, lib_prec)


def sharded_kmeans_step(
    mesh: Mesh,
    lib_vectors,  # (N, D) sharded over the full mesh
    centroids,  # (L, D) replicated
):
    """One spherical k-means update with library rows sharded over the
    WHOLE mesh -- every axis, including 'dcn' on multi-slice meshes (the
    per-iteration reduction is one small (L, D+1) psum, so the DCN leg
    carries centroids only, never rows).

    The shard-local accumulation is the same blocked one-hot MXU
    formulation as the single-device fit (ops/kmeans.py
    blocked_assign_sums) -- the earlier segment-sum local step
    scatter-serialized on TPU and was measured at 1,004 s of a 1,044 s
    born-sharded 2.1M-row build on one v5e chip."""
    from ann_solo_tpu.ops.kmeans import _BLOCK, blocked_assign_sums

    axes = tuple(mesh.axis_names)

    def local(lib_l, centroids_l):
        n_l = lib_l.shape[0]
        n_pad = max(_BLOCK, -(-n_l // _BLOCK) * _BLOCK)
        if n_pad != n_l:  # zero rows carry weight 0 in the block sums
            lib_l = jnp.pad(lib_l, ((0, n_pad - n_l), (0, 0)))
        sums, counts = blocked_assign_sums(lib_l, centroids_l)
        counts = counts[:, None]
        sums = jax.lax.psum(sums, axes)
        counts = jax.lax.psum(counts, axes)
        new_centroids = jnp.where(
            counts > 0, sums / jnp.maximum(counts, 1.0), centroids_l
        )
        norms = jnp.linalg.norm(new_centroids, axis=1, keepdims=True)
        return new_centroids / jnp.maximum(norms, 1e-30)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axes, None), P(None, None)),
        out_specs=P(None, None),
        check_vma=False,
    )
    return fn(lib_vectors, centroids)


@partial(jax.jit, static_argnums=(0, 6, 7, 8))
def _search_step_impl(
    mesh,
    lib_vectors,
    lib_prec,
    centroids,
    queries,
    query_prec,
    k: int,
    charge: float,
    tol: float,
):
    ids, scores = sharded_topk_search(
        mesh, lib_vectors, lib_prec, queries, query_prec, k, charge, tol
    )
    new_centroids = sharded_kmeans_step(mesh, lib_vectors, centroids)
    return ids, scores, new_centroids


def sharded_search_step(
    mesh: Mesh,
    lib_vectors,
    lib_prec,
    centroids,
    queries,
    query_prec,
    k: int,
    charge: float = 2.0,
    tol: float = 500.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The full jitted multi-chip step: index update + sharded search.

    Inputs are placed with NamedShardings (library over 'lib'/full mesh,
    queries over 'dp', centroids replicated) so XLA lays collectives on ICI.
    """
    lib_sharding = NamedSharding(mesh, P("lib", None))
    dp_sharding = NamedSharding(mesh, P("dp", None))
    repl = NamedSharding(mesh, P())
    lib_vectors = jax.device_put(jnp.asarray(lib_vectors), lib_sharding)
    lib_prec = jax.device_put(
        jnp.asarray(lib_prec), NamedSharding(mesh, P("lib"))
    )
    queries = jax.device_put(jnp.asarray(queries), dp_sharding)
    query_prec = jax.device_put(
        jnp.asarray(query_prec), NamedSharding(mesh, P("dp"))
    )
    centroids = jax.device_put(jnp.asarray(centroids), repl)
    return _search_step_impl(
        mesh, lib_vectors, lib_prec, centroids, queries, query_prec,
        k, charge, tol,
    )
