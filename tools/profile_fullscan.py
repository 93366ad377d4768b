"""On-device stage breakdown of the bench-regime fullscan select path.

Round-4 profiling harness for the ann-select stage at the shipped bench
operating point (131k x 800 int8, auto num_list -> 4096, num_probe 256,
redundancy 2, k = 1024, k_scan = 2048, fused +/-500 Da window).  Builds
the index once and times, at batch granularity (B = 4096, pipelined
reps, 1-element device syncs), a ladder of cumulative formulations that
mirrors `_ivf_search_fullscan.tile_fn`:

  coarse      coarse matmul + top_k(P) + probe-id sort
  einsum      + the (T, L, cap) library einsum
  gather      + the probed-score take_along_axis
  mask        + ids/prec gathers, validity & window mask, flat reshape
  topk        + the canonical top-k_scan (int16 keys)
  dedup=full  + min-rank-copy dedup + re-selection (the shipped path)

Usage: python tools/profile_fullscan.py [--b 4096]
"""

import argparse
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    np.asarray(x.ravel()[:1])


def timeit(fn, *args, reps=4):
    out = fn(*args)
    sync(out[0] if isinstance(out, (tuple, list)) else out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out[0] if isinstance(out, (tuple, list)) else out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=4096)
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--num-probe", type=int, default=256)
    ap.add_argument("--k", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ann_solo_tpu.index import ivf
    from ann_solo_tpu.index.ivf import (
        IvfIndex,
        _canonical_topk,
        _dedup_topk,
        _pad_topk,
        _scan_queries,
        _window_mask,
    )

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(42)
    d = 800
    vecs = rng.normal(0, 1, (args.n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    prec = np.sort(rng.uniform(400, 1200, args.n).astype(np.float32))

    class Cfg:
        num_list = 0
        num_probe = args.num_probe
        ivf_redundancy = 2

        def __getitem__(self, key):
            return getattr(self, key)

    index = IvfIndex.build(
        jnp.asarray(vecs), Cfg(), precursor_mz=prec,
        storage_dtype=np.int8,
    )
    vectors_d, ids_d, prec_d, scales_d, centroids_d = (
        index.device_arrays()
    )
    l, cap, dp = vectors_d.shape
    p = min(args.num_probe, l)
    k = args.k
    k_scan = index.redundancy * k
    tile = ivf._TILE_Q
    log(f"L={l} cap={cap} D={dp} P={p} k={k} k_scan={k_scan} "
        f"lanes={p * cap} tile={tile}")

    q_rows = rng.choice(args.n, args.b, replace=False)
    queries = jnp.asarray(
        vecs[q_rows] + rng.normal(0, 0.05, (args.b, d)).astype(np.float32)
    )
    q_prec = jnp.asarray(prec[q_rows])
    charge_d = jnp.float32(2.0)
    tol_val, tol_mode = 500.0, "Da"

    def make_tiled(stage: str):
        cast = vectors_d.dtype != jnp.float32

        def tile_fn(inp, vecs_s, cents, ids_t, prec_t, scales_t):
            qt, qpt = inp
            coarse = jnp.dot(
                qt, cents.T, preferred_element_type=jnp.float32
            )
            _, probe_ids = jax.lax.top_k(coarse, p)
            probe_ids = jnp.sort(probe_ids, axis=1)
            if stage == "coarse":
                return probe_ids
            scores = jnp.einsum(
                "td,lcd->tlc", _scan_queries(qt, cast), vecs_s,
                preferred_element_type=jnp.float32,
            )
            scores = scores * scales_t[None]
            if stage == "einsum":
                return scores.sum(axis=(1, 2)) + probe_ids.sum(-1)
            sel = jnp.take_along_axis(
                scores, probe_ids[:, :, None], axis=1
            )
            if stage == "gather":
                return sel.sum(axis=(1, 2))
            ids_g = ids_t[probe_ids]
            mask = ids_g >= 0
            precs = prec_t[probe_ids]
            mask &= _window_mask(
                qpt[:, None, None], precs, charge_d, tol_val, tol_mode
            )
            flat = jnp.where(mask, sel, -jnp.inf).reshape(
                tile, p * cap
            )
            if stage == "mask":
                return flat.max(axis=1)
            k_sel = min(k_scan, p * cap)
            top_s, pos = _canonical_topk(flat, k_sel, cast)
            top_i = jnp.take_along_axis(
                ids_g.reshape(tile, p * cap), pos, axis=1
            )
            top_i = jnp.where(top_s > -jnp.inf, top_i, -1)
            if stage == "topk":
                return top_s, top_i
            top_s, top_i = _dedup_topk(top_s, top_i, k)
            return _pad_topk(top_s, top_i, k)

        @jax.jit
        def run(queries, q_prec, vecs_in, cents, ids_t, prec_t,
                scales_t):
            vecs_s = vecs_in
            if vecs_s.dtype == jnp.int8:
                vecs_s = vecs_s.astype(jnp.bfloat16)
            qs = queries.reshape(-1, tile, dp)
            ps = q_prec.reshape(-1, tile)
            return jax.lax.map(
                partial(
                    tile_fn, vecs_s=vecs_s, cents=cents, ids_t=ids_t,
                    prec_t=prec_t, scales_t=scales_t,
                ),
                (qs, ps),
            )

        return run

    for stage in ["coarse", "einsum", "gather", "mask", "topk", "full"]:
        fn = make_tiled(stage)
        ms = timeit(
            fn, queries, q_prec, vectors_d, centroids_d, ids_d,
            prec_d, scales_d,
        )
        log(f"{stage:8s} {ms:8.1f} ms/batch")

    def full_search(queries, q_prec):
        return index.search_device(
            queries, k, q_prec=q_prec, charge=2.0,
            tol_val=tol_val, tol_mode=tol_mode,
        )

    ms = timeit(full_search, queries, q_prec)
    log(f"{'search_device':8s} {ms:8.1f} ms/batch (shipped entry)")


if __name__ == "__main__":
    main()
