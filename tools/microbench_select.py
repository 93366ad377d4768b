"""Selection-formulation microbenchmark: lax.top_k vs packed sort.

The canonical top-k was the named open formulation problem in both scan
regimes (bench fullscan: top-2048-of-24,576 x 4096 rows; SCALE
probe-gather: top-1024-of-49,152 x 1024 rows).  Round-4 ladder results
on v5e (this tool):

  * lax.top_k (int16 keys + its internal int32 iota payload, 6 B/lane):
    94.4 ms bench shape / 57.2 ms SCALE shape.
  * packed sort (key16 << 16 | bit-flipped position, ONE uint32
    payload-free operand, 4 B/lane; descending numeric order == the
    canonical (key desc, pos asc) order, all values unique): 64.0 /
    40.2 ms, output bit-identical.  SHIPPED (`ivf._canonical_topk`).
  * exact threshold selection (binary search for the k-th key +
    cumsum compaction): the threshold passes cost 8.4 ms, but ANY
    row-gather compaction runs at ~18 ns/gathered element on TPU --
    2.3 s with vmapped searchsorted, ~1.1 s with manual binary-search
    take_along_axis steps.  Row-gather compaction is the wall, not the
    threshold search.  REJECTED; kept here as the measured dead end.

Usage: python tools/microbench_select.py
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def sync(x):
    np.asarray(x.ravel()[:1])


def timeit(fn, *args, reps=6):
    out = fn(*args)
    sync(out[0] if isinstance(out, (tuple, list)) else out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out[0] if isinstance(out, (tuple, list)) else out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    @partial(jax.jit, static_argnums=(1,))
    def ref_topk(keys, k):
        return jax.lax.top_k(keys, k)

    def pack(keys):
        # (key asc <-> packed asc, pos asc <-> packed desc): descending
        # packed order == canonical (key desc, pos asc).  All values
        # unique, so no stability requirement survives the packing.
        b, n = keys.shape
        ku = (keys.astype(jnp.int32) + 32768).astype(jnp.uint32)
        pos_rev = jnp.arange(n - 1, -1, -1, dtype=jnp.uint32)[None, :]
        return (ku << 16) | pos_rev

    @partial(jax.jit, static_argnums=(1,))
    def packed_sort(keys, k):
        b, n = keys.shape
        packed = pack(keys)
        s = jax.lax.sort(packed, dimension=1, is_stable=False)
        top = jnp.flip(s[:, n - k :], axis=1)
        pos = (n - 1) - (top & 0xFFFF).astype(jnp.int32)
        out_k = ((top >> 16).astype(jnp.int32) - 32768).astype(jnp.int16)
        return out_k, pos

    @partial(jax.jit, static_argnums=(1,))
    def packed_threshold(keys, k):
        # Unique packed values: exactly k survivors at the threshold,
        # no tie handling.  Compaction = manual binary search over the
        # survivor cumsum with take_along_axis steps.
        b, n = keys.shape
        packed = pack(keys)
        lo = jnp.zeros((b, 1), jnp.uint32)  # cnt(>= 0) = n >= k
        span = jnp.uint32(1) << 31
        for _ in range(32):
            mid = lo + span
            cnt = jnp.sum(
                (packed >= mid).astype(jnp.int32), axis=1, keepdims=True
            )
            lo = jnp.where(cnt >= k, mid, lo)
            span = span >> 1
        surv = packed >= lo
        idx = jnp.cumsum(surv.astype(jnp.int32), axis=1)
        # lower-bound binary search: pos[j] = first lane with
        # idx == j+1 (idx nondecreasing, +1 exactly at survivors).
        # Track last = largest lane with idx[last] < j+1, from -1.
        targets = jnp.arange(1, k + 1, dtype=jnp.int32)[None, :]
        last = jnp.full((b, k), -1, jnp.int32)
        step = 1 << ((n - 1).bit_length() - 1)
        while step >= 1:
            cand = last + step
            v = jnp.take_along_axis(
                idx, jnp.clip(cand, 0, n - 1), axis=1
            )
            ok = (cand <= n - 1) & (v < targets)
            last = jnp.where(ok, cand, last)
            step >>= 1
        pos = last + 1
        pk = jnp.take_along_axis(packed, pos, axis=1)
        out_pos = pos
        out_k = (
            (pk >> 16).astype(jnp.int32) - 32768
        ).astype(jnp.int16)
        # survivors are in position order; canonical order needs the
        # final (B, k) sort -- measured separately as packed_thr_sorted.
        return out_k, out_pos

    shapes = [
        ("bench fullscan", 4096, 24576, 2048),
        ("bench fullscan k=1024", 4096, 24576, 1024),
        ("SCALE probe-gather", 1024, 49152, 1024),
    ]
    for name, b, n, k in shapes:
        keys = jnp.asarray(
            rng.integers(-32768, 32767, (b, n), dtype=np.int16)
        )
        t_ref = timeit(ref_topk, keys, k)
        t_ps = timeit(packed_sort, keys, k)
        rk, rp = ref_topk(keys, k)
        pk_, pp_ = packed_sort(keys, k)
        ok_ps = bool(jnp.array_equal(rk, pk_)) and bool(
            jnp.array_equal(rp, pp_)
        )
        t_pt = timeit(packed_threshold, keys, k)
        tk, tp = packed_threshold(keys, k)
        # set equality (position order, not canonical order)
        ok_pt = bool(
            jnp.array_equal(jnp.sort(tp, axis=1), jnp.sort(rp, axis=1))
        )
        log(
            f"{name}: ({b}, {n}) k={k}  lax.top_k {t_ref:.1f}  "
            f"packed_sort {t_ps:.1f} (exact={ok_ps})  "
            f"packed_threshold {t_pt:.1f} (set={ok_pt})"
        )


if __name__ == "__main__":
    main()
