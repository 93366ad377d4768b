"""Fullscan select-stage redesign ladder: epilogue-fused window mask.

The shipped `_ivf_search_fullscan.tile_fn` gathers (T, P, cap) blocks of
`padded_ids` (validity) and `padded_prec` (window) per tile to build the
selection mask AFTER the probed-score gather.  This ladder measures two
reformulations at the bench operating point (131k x 800 int8, L=4096,
P=256, k=1024, k_scan=2048, fused +/-500 Da window):

  shipped   the current tile_fn (uint16 epilogue, probed ids/prec
            row-gathers, mask at (T, P, cap))
  fusedB    validity+window folded into the einsum epilogue at
            (T, L, cap) via a build-time prec-with-inf-padding table
            (one broadcast operand, no gathers); ids still row-gathered
            at (T, P, cap) for the post-top-k id lookup
  fusedA    like fusedB, but the ids row-gather is gone too: top_k
            positions are decoded to GLOBAL slot positions (arithmetic
            on probe_ids) and ids come from one (T, k_sel) element
            gather of the flat id table

Outputs must be bit-identical across all three (asserted).

Usage: python tools/exp_fullscan_fused.py [--b 4096]
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
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=4096)
    ap.add_argument("--n", type=int, default=131072)
    ap.add_argument("--num-probe", type=int, default=256)
    ap.add_argument("--k", type=int, default=1024)
    ap.add_argument("--decompose", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ann_solo_tpu.index import ivf
    from ann_solo_tpu.index.ivf import (
        IvfIndex,
        _KEY16_NINF,
        _canonical_topk_u16,
        _dedup_topk,
        _key16,
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
    k_sel = min(k_scan, p * cap)
    tile = ivf._TILE_Q
    log(f"L={l} cap={cap} D={dp} P={p} k={k} k_scan={k_scan} "
        f"lanes={p * cap} tile={tile}")

    # Build-time fused-mask table: invalid slots get prec=+inf so ONE
    # |qp - prec| compare covers validity + window.
    prec_inf = jnp.where(
        ids_d >= 0, prec_d, jnp.inf
    )  # (L, cap) f32

    q_rows = rng.choice(args.n, args.b, replace=False)
    queries = jnp.asarray(
        vecs[q_rows] + rng.normal(0, 0.05, (args.b, d)).astype(np.float32)
    )
    q_prec = jnp.asarray(prec[q_rows])
    charge_d = jnp.float32(2.0)
    tol_val, tol_mode = 500.0, "Da"
    cast = True

    def coarse_probe(qt, cents):
        coarse = jnp.dot(qt, cents.T, preferred_element_type=jnp.float32)
        _, probe_ids = jax.lax.top_k(coarse, p)
        return jnp.sort(probe_ids, axis=1)

    def tile_shipped(inp, vecs_s, cents, ids_t, prec_t, scales_t,
                     prec_inf_t):
        qt, qpt = inp
        probe_ids = coarse_probe(qt, cents)
        scores = jnp.einsum(
            "td,lcd->tlc", _scan_queries(qt, cast), vecs_s,
            preferred_element_type=jnp.float32,
        )
        scores = scores * scales_t[None]
        scores = _key16(scores).astype(jnp.uint16)
        sel = jnp.take_along_axis(scores, probe_ids[:, :, None], axis=1)
        ids_g = ids_t[probe_ids]
        mask = ids_g >= 0
        precs = prec_t[probe_ids]
        mask &= _window_mask(
            qpt[:, None, None], precs, charge_d, tol_val, tol_mode
        )
        flat = jnp.where(mask, sel, _KEY16_NINF).reshape(tile, p * cap)
        top_s, pos = _canonical_topk_u16(flat, k_sel)
        top_i = jnp.take_along_axis(
            ids_g.reshape(tile, p * cap), pos, axis=1
        )
        top_i = jnp.where(top_s > -jnp.inf, top_i, -1)
        top_s, top_i = _dedup_topk(top_s, top_i, k)
        return _pad_topk(top_s, top_i, k)

    def fused_scores(qt, qpt, vecs_s, scales_t, prec_inf_t):
        scores = jnp.einsum(
            "td,lcd->tlc", _scan_queries(qt, cast), vecs_s,
            preferred_element_type=jnp.float32,
        )
        scores = scores * scales_t[None]
        mask = (
            jnp.abs(qpt[:, None, None] - prec_inf_t[None])
            * charge_d <= tol_val
        )
        return jnp.where(
            mask, _key16(scores), _KEY16_NINF
        ).astype(jnp.uint16)

    def tile_fusedB(inp, vecs_s, cents, ids_t, prec_t, scales_t,
                    prec_inf_t):
        qt, qpt = inp
        probe_ids = coarse_probe(qt, cents)
        keys = fused_scores(qt, qpt, vecs_s, scales_t, prec_inf_t)
        sel = jnp.take_along_axis(keys, probe_ids[:, :, None], axis=1)
        ids_g = ids_t[probe_ids]
        flat = sel.reshape(tile, p * cap)
        top_s, pos = _canonical_topk_u16(flat, k_sel)
        top_i = jnp.take_along_axis(
            ids_g.reshape(tile, p * cap), pos, axis=1
        )
        top_i = jnp.where(top_s > -jnp.inf, top_i, -1)
        top_s, top_i = _dedup_topk(top_s, top_i, k)
        return _pad_topk(top_s, top_i, k)

    def tile_fusedA(inp, vecs_s, cents, ids_t, prec_t, scales_t,
                    prec_inf_t):
        qt, qpt = inp
        probe_ids = coarse_probe(qt, cents)
        keys = fused_scores(qt, qpt, vecs_s, scales_t, prec_inf_t)
        sel = jnp.take_along_axis(keys, probe_ids[:, :, None], axis=1)
        flat = sel.reshape(tile, p * cap)
        top_s, pos = _canonical_topk_u16(flat, k_sel)
        lst = jnp.take_along_axis(probe_ids, pos // cap, axis=1)
        gpos = lst * cap + pos % cap
        top_i = ids_t.reshape(-1)[gpos]
        top_i = jnp.where(top_s > -jnp.inf, top_i, -1)
        top_s, top_i = _dedup_topk(top_s, top_i, k)
        return _pad_topk(top_s, top_i, k)

    def tile_nodedup(inp, vecs_s, cents, ids_t, prec_t, scales_t,
                     prec_inf_t):
        qt, qpt = inp
        probe_ids = coarse_probe(qt, cents)
        scores = jnp.einsum(
            "td,lcd->tlc", _scan_queries(qt, cast), vecs_s,
            preferred_element_type=jnp.float32,
        )
        scores = scores * scales_t[None]
        scores = _key16(scores).astype(jnp.uint16)
        sel = jnp.take_along_axis(scores, probe_ids[:, :, None], axis=1)
        ids_g = ids_t[probe_ids]
        mask = ids_g >= 0
        precs = prec_t[probe_ids]
        mask &= _window_mask(
            qpt[:, None, None], precs, charge_d, tol_val, tol_mode
        )
        flat = jnp.where(mask, sel, _KEY16_NINF).reshape(tile, p * cap)
        top_s, pos = _canonical_topk_u16(flat, k_sel)
        top_i = jnp.take_along_axis(
            ids_g.reshape(tile, p * cap), pos, axis=1
        )
        top_i = jnp.where(top_s > -jnp.inf, top_i, -1)
        return top_s, top_i

    def tile_noid(inp, vecs_s, cents, ids_t, prec_t, scales_t,
                  prec_inf_t):
        qt, qpt = inp
        probe_ids = coarse_probe(qt, cents)
        scores = jnp.einsum(
            "td,lcd->tlc", _scan_queries(qt, cast), vecs_s,
            preferred_element_type=jnp.float32,
        )
        scores = scores * scales_t[None]
        scores = _key16(scores).astype(jnp.uint16)
        sel = jnp.take_along_axis(scores, probe_ids[:, :, None], axis=1)
        ids_g = ids_t[probe_ids]
        mask = ids_g >= 0
        precs = prec_t[probe_ids]
        mask &= _window_mask(
            qpt[:, None, None], precs, charge_d, tol_val, tol_mode
        )
        flat = jnp.where(mask, sel, _KEY16_NINF).reshape(tile, p * cap)
        top_s, pos = _canonical_topk_u16(flat, k_sel)
        return top_s, pos + ids_g.reshape(tile, p * cap)[:, :1]

    def make(tile_fn):
        @jax.jit
        def run(queries, q_prec, vecs_in, cents, ids_t, prec_t,
                scales_t, prec_inf_t):
            vecs_s = vecs_in
            if vecs_s.dtype == jnp.int8:
                vecs_s = vecs_s.astype(jnp.bfloat16)
            qs = queries.reshape(-1, tile, dp)
            ps = q_prec.reshape(-1, tile)
            return jax.lax.map(
                partial(
                    tile_fn, vecs_s=vecs_s, cents=cents, ids_t=ids_t,
                    prec_t=prec_t, scales_t=scales_t,
                    prec_inf_t=prec_inf_t,
                ),
                (qs, ps),
            )

        return run

    variants = [
        ("shipped", tile_shipped),
        ("fusedB", tile_fusedB),
        ("fusedA", tile_fusedA),
    ]
    if args.decompose:
        # Cumulative decomposition of the shipped path: noid stops at
        # the canonical top-k (positions only), nodedup adds the id
        # row-gather but skips _dedup_topk.  Their outputs differ from
        # the full path by construction; timings locate the tail cost.
        variants = [
            ("noid", tile_noid),
            ("nodedup", tile_nodedup),
            ("shipped", tile_shipped),
        ]

    ref = None
    for name, fn in variants:
        ms, out = timeit(
            make(fn), queries, q_prec, vectors_d, centroids_d, ids_d,
            prec_d, scales_d, prec_inf,
        )
        host = (np.asarray(out[0]), np.asarray(out[1]))
        if args.decompose:
            ok = "n/a"
        elif ref is None:
            ref = host
            ok = "ref"
        else:
            ok = (
                "identical"
                if np.array_equal(ref[0], host[0], equal_nan=True)
                and np.array_equal(ref[1], host[1])
                else "MISMATCH"
            )
        log(f"{name:8s} {ms:8.1f} ms/batch  [{ok}]")


if __name__ == "__main__":
    main()
