"""Decompose the bench vectorize stage: upload vs compute vs sync.

The round-3 driver bench measured vectorize at 0.54 s for a 4096x50
query batch -- yet the jitted kernel's HBM traffic bound is ~3 ms.  This
tool separates the three candidate costs on the tunneled backend:

  1. host->device upload of the (B, K) f32 peak arrays (~1.6 MB),
  2. the jitted accumulate kernel itself (device-resident inputs),
  3. the dispatch/sync RPC floor.

Run: python tools/profile_vectorize.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ann_solo_tpu.models.vectorize import VectorizeParams, vectorize_batch

B, K = 4096, 50
REPS = 6


def timeit(fn, reps=REPS):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(0)
    vparams = VectorizeParams(11.0, 2010.0, 0.04, 800)
    tables = vparams.device_tables()

    mz = np.sort(rng.uniform(101, 1500, (B, K)).astype(np.float32), axis=1)
    inten = rng.uniform(0.1, 1, (B, K)).astype(np.float32)
    n = np.full(B, K, np.int32)

    # 1. pure upload (device_put + 1-elem sync)
    def upload():
        a = jax.device_put(mz)
        b = jax.device_put(inten)
        c = jax.device_put(n)
        np.asarray(a[-1, -1:]), np.asarray(b[-1, -1:]), np.asarray(c[-1:])

    t_up = timeit(upload)
    print(f"upload (1.6 MB peaks + sync): {t_up*1e3:.1f} ms")

    # 2. kernel on device-resident inputs
    mz_d, int_d, n_d = jax.device_put(mz), jax.device_put(inten), jax.device_put(n)

    def kernel():
        v = vectorize_batch(vparams, tables, mz_d, int_d, n_d)
        np.asarray(v[-1, -1:])

    t_k = timeit(kernel)
    print(f"kernel (device inputs + sync): {t_k*1e3:.1f} ms")

    # 3. full stage as bench runs it (numpy inputs each call)
    def stage():
        v = vectorize_batch(vparams, tables, mz, inten, n)
        np.asarray(v[-1, -1:])

    t_s = timeit(stage)
    print(f"stage (numpy inputs + sync):   {t_s*1e3:.1f} ms")

    # 4. RPC floor: trivial jitted op + sync
    one = jnp.zeros(8, jnp.float32)
    f = jax.jit(lambda x: x + 1)

    def floor():
        np.asarray(f(one)[:1])

    t_f = timeit(floor)
    print(f"rpc floor (tiny op + sync):    {t_f*1e3:.1f} ms")


if __name__ == "__main__":
    main()
