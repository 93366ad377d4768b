"""On-device stage breakdown of the 2.1M-row probe-gather select path.

Round-4 profiling harness for VERDICT r3 missing #1 (big-library select
regime).  Builds the SCALE operating point (2.1M x 800 int8, 4096 lists,
num_probe 64, redundancy 1) and times, at batch granularity with
1-element device syncs (tunnel discipline):

  * search_device end-to-end (the production select path -- candidates
    chain into device-side rescoring, no host download),
  * the jitted probe-scan tile alone,
  * the Pallas probe-gather kernel alone (raw score block),
  * coarse probing alone,
  * the canonical top_k alone (int32 keys) and an int16-key variant.

Usage: python tools/profile_scale_select.py [--n 2097152]
"""

import argparse
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

D = 800


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    np.asarray(x.ravel()[:1])


def timeit(fn, reps=4):
    out = fn()
    sync(out if not isinstance(out, tuple) else out[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out if not isinstance(out, tuple) else out[0])
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_097_152)
    ap.add_argument("--num-list", type=int, default=4096)
    ap.add_argument("--num-probe", type=int, default=64)
    ap.add_argument("--k", type=int, default=1024)
    ap.add_argument("--b", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import jax.random as jrandom

    from ann_solo_tpu.index.ivf import (
        IvfIndex,
        _canonical_topk,
        _ivf_probe_scan_tile,
    )
    from ann_solo_tpu.ops.ivf_probe_pallas import (
        ivf_probe_scan,
        probe_scan_bt,
    )
    from ann_solo_tpu.ops.ivf_scan_pallas import _key16

    log(f"devices: {jax.devices()}")
    n = args.n
    rng = np.random.default_rng(7)
    prec = np.sort(rng.uniform(400, 1200, n)).astype(np.float32)

    class Cfg:
        num_list = args.num_list
        num_probe = args.num_probe
        ivf_redundancy = 1

        def __getitem__(self, key):
            return getattr(self, key)

    t0 = time.perf_counter()
    key = jrandom.key(7, impl="rbg")
    chunk = 1 << 18
    parts = []
    for i in range(-(-n // chunk)):
        rows = min(chunk, n - i * chunk)
        sub = jrandom.normal(jrandom.fold_in(key, i), (rows, D),
                             jnp.float32)
        sub = sub / jnp.linalg.norm(sub, axis=1, keepdims=True)
        parts.append(sub.astype(jnp.bfloat16))
    vectors_d = jnp.concatenate(parts)
    del parts
    sync(vectors_d)
    log(f"gen: {time.perf_counter() - t0:.1f}s")

    b = args.b
    query_rows = rng.choice(n, b, replace=False)
    qsrc = vectors_d[jnp.asarray(query_rows)].astype(jnp.float32)
    qn = qsrc + 0.02 * jrandom.normal(
        jrandom.fold_in(key, 1 << 20), (b, D), jnp.float32)
    qn = qn / jnp.linalg.norm(qn, axis=1, keepdims=True)
    queries = np.asarray(qn)
    q_prec = prec[query_rows]

    t0 = time.perf_counter()
    index = IvfIndex.build(vectors_d, Cfg(), precursor_mz=prec,
                           storage_dtype=np.int8)
    sync(index.padded_vectors[-1, -1:])
    log(f"build: {time.perf_counter() - t0:.1f}s")
    vectors_d.delete()

    vecs_d, ids_d, prec_d, scales_d, cents_d = index.device_arrays()
    l, cap, dp = vecs_d.shape
    log(f"L={l} cap={cap} Dp={dp} dtype={vecs_d.dtype} "
        f"bt={probe_scan_bt(-(-cap // 128) * 128, dp, 1, b)}")
    charge_d = jnp.float32(2.0)
    queries_d = jnp.asarray(queries, jnp.float32)
    if queries_d.shape[-1] != dp:
        queries_d = jnp.pad(queries_d,
                            ((0, 0), (0, dp - queries_d.shape[-1])))
    q_prec_d = jnp.asarray(q_prec, jnp.float32)
    k = args.k
    p = min(args.num_probe, l)

    # 1. end-to-end search_device
    ms = timeit(lambda: index.search_device(
        queries_d, k, q_prec=q_prec_d, charge=2.0, tol_val=500.0,
        tol_mode="Da"))
    log(f"search_device: {ms:.1f} ms  ({b / ms * 1e3:.0f} q/s)")

    # 2. probe-scan tile jit alone
    ms = timeit(lambda: _ivf_probe_scan_tile(
        vecs_d, ids_d, prec_d, scales_d, None, cents_d, queries_d,
        q_prec_d, charge_d, args.num_probe, k, k, 500.0, "Da", False))
    log(f"_ivf_probe_scan_tile: {ms:.1f} ms")

    # 3. coarse probe alone
    @jax.jit
    def coarse_fn(q):
        c = jnp.dot(q, cents_d.T, preferred_element_type=jnp.float32)
        _, pid = jax.lax.top_k(c, p)
        return jnp.sort(pid, axis=1)

    ms = timeit(lambda: coarse_fn(queries_d))
    log(f"coarse+sort: {ms:.1f} ms")
    probe_ids = coarse_fn(queries_d)

    # 4. kernel alone (meta precomputed, matching the tile path)
    meta = jnp.concatenate(
        [prec_d.astype(jnp.float32), scales_d.astype(jnp.float32),
         (ids_d >= 0).astype(jnp.float32)], axis=1)
    cap128 = -(-cap // 128) * 128
    vecs_k, meta_k, ids_k = vecs_d, meta, ids_d
    if cap128 != cap:
        vecs_k = jnp.pad(vecs_d, ((0, 0), (0, cap128 - cap), (0, 0)))
        ids_k = jnp.pad(ids_d, ((0, 0), (0, cap128 - cap)),
                        constant_values=-1)
        meta_k = jnp.concatenate(
            [jnp.pad(prec_d, ((0, 0), (0, cap128 - cap))),
             jnp.pad(scales_d, ((0, 0), (0, cap128 - cap))),
             jnp.pad((ids_d >= 0).astype(jnp.float32),
                     ((0, 0), (0, cap128 - cap)))], axis=1)

    @partial(jax.jit, static_argnums=())
    def kern_fn(vk, mk, q, qp, pid):
        return ivf_probe_scan(vk, mk, q, qp, charge_d, pid,
                              500.0, "Da")

    ms = timeit(
        lambda: kern_fn(vecs_k, meta_k, queries_d, q_prec_d, probe_ids)
    )
    log(f"probe kernel: {ms:.1f} ms "
        f"({b * p * cap128 * dp / ms / 1e6:.0f} GB/s effective)")
    flat = kern_fn(vecs_k, meta_k, queries_d, q_prec_d, probe_ids)
    log(f"flat block: {flat.shape} {flat.dtype} "
        f"{flat.nbytes / 1e6:.0f} MB")

    # 5. canonical top_k (int32 keys) alone
    @jax.jit
    def topk_fn(f):
        return _canonical_topk(f, k, cast=True)

    ms = timeit(lambda: topk_fn(flat))
    log(f"canonical top_k int32: {ms:.1f} ms")

    # 6. int16-key top_k variant
    @jax.jit
    def topk16_fn(f):
        k16 = _key16(f)  # int32 in [0, 0xFFFF]
        k16 = (k16 - 0x8000).astype(jnp.int16)
        v, pos = jax.lax.top_k(k16, k)
        return v, pos

    ms = timeit(lambda: topk16_fn(flat))
    log(f"int16-key top_k: {ms:.1f} ms")

    # 7. finalize (id gather) alone
    _, pos = topk_fn(flat)

    @jax.jit
    def fin_fn(pos_):
        lp = pos_ // cap128
        slot = pos_ - lp * cap128
        lists = jnp.take_along_axis(probe_ids, lp, axis=1)
        return ids_k[lists, slot]

    ms = timeit(lambda: fin_fn(pos))
    log(f"finalize gather: {ms:.1f} ms")
    log("DONE")


if __name__ == "__main__":
    main()
