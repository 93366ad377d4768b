"""Warmup program census at bench shapes (VERDICT r3 weak #4 / task 7).

Reproduces bench.py's setup, then times each pipeline program's FIRST
call (compile + first execution) separately with a forced host sync, so
the 21.2 s warmup budget can be attributed per program.  Run on the real
TPU: `python tools/warmup_census.py`.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402  (reuses its synth + constants)


def main() -> int:
    import jax.numpy as jnp

    from ann_solo_tpu.index.ivf import IvfIndex
    from ann_solo_tpu.models.vectorize import (
        VectorizeParams,
        vectorize_batch,
    )
    from ann_solo_tpu.ops.rescore import rescore_candidate_matrix
    from ann_solo_tpu.ops.shifted_dot_pallas import use_pallas_default

    rng = np.random.default_rng(7)
    lib_mz, lib_int, lib_ann, lib_n, lib_prec = bench.synth_processed(
        rng, bench.N_LIBRARY
    )

    class C:
        min_mz, max_mz = 11.0, 2010.0
        bin_size = bench.FRAG_TOL
        hash_len = bench.HASH_LEN
        scaling = "rank"

    vparams = VectorizeParams.from_config(C)
    tables = vparams.device_tables()

    def sync(x):
        np.asarray(x.ravel()[-1:])

    marks = {}

    def mark(name, fn):
        t0 = time.perf_counter()
        out = fn()
        sync(out if not isinstance(out, tuple) else out[0])
        dt = time.perf_counter() - t0
        marks[name] = dt
        print(f"{name:<28} {dt:7.2f}s", flush=True)
        return out

    b = bench.N_QUERIES
    k_peaks = bench.K_PEAKS
    q_mz = np.sort(
        rng.uniform(200, 1800, (b, k_peaks)).astype(np.float32), axis=1
    )
    q_int = np.abs(rng.normal(0, 1, (b, k_peaks))).astype(np.float32)
    q_int /= np.linalg.norm(q_int, axis=1, keepdims=True)
    q_n = np.full(b, k_peaks, np.int32)
    q_prec = rng.uniform(300, 1500, b).astype(np.float32)

    # 1. vectorize (query batch shape)
    q_vec = mark(
        "vectorize(B=4096)",
        lambda: vectorize_batch(vparams, tables, q_mz, q_int, q_n),
    )

    # library vectors (reuses the already-compiled 8192 program ladder)
    t0 = time.perf_counter()
    chunks = [
        vectorize_batch(
            vparams, tables,
            lib_mz[s : s + 8192], lib_int[s : s + 8192],
            lib_n[s : s + 8192],
        )
        for s in range(0, bench.N_LIBRARY, 8192)
    ]
    lib_vectors = jnp.concatenate(chunks)
    sync(lib_vectors)
    print(f"{'lib vectorize (8192 ladder)':<28} "
          f"{time.perf_counter() - t0:7.2f}s", flush=True)

    class BC:
        num_list = bench.NUM_LIST
        num_probe = bench.NUM_PROBE

    t0 = time.perf_counter()
    index = IvfIndex.build(
        lib_vectors, BC(), precursor_mz=lib_prec.astype(np.float32)
    )
    sync(index.padded_vectors)
    print(f"{'IVF build (cold)':<28} {time.perf_counter() - t0:7.2f}s",
          flush=True)

    # 2. select (fullscan program)
    cand = mark(
        "select fullscan(k=1024)",
        lambda: index.search_device(
            q_vec, bench.NUM_CANDIDATES,
            q_prec=q_prec, charge=float(bench.CHARGE),
            tol_val=bench.OPEN_TOL_DA, tol_mode="Da",
        )[0],
    )

    # 3. rescore (stage1 + stage2 + pallas)
    lib_mz_d = jnp.asarray(lib_mz)
    lib_int_d = jnp.asarray(lib_int)
    lib_ann_d = jnp.asarray(lib_ann)
    lib_prec_d = jnp.asarray(lib_prec, jnp.float32)
    mark(
        "rescore(B=4096,C=1024)",
        lambda: rescore_candidate_matrix(
            jnp.asarray(q_mz), jnp.asarray(q_int),
            jnp.asarray(q_prec, jnp.float32),
            lib_mz_d, lib_int_d, lib_ann_d, lib_prec_d,
            jnp.asarray(cand, jnp.int32),
            bench.FRAG_TOL, bench.CHARGE + 1, True,
            use_pallas_default(),
        )[0],
    )

    # steady-state per-program seconds for comparison
    for name, fn in [
        ("vectorize warm", lambda: vectorize_batch(
            vparams, tables, q_mz, q_int, q_n)),
        ("select warm", lambda: index.search_device(
            q_vec, bench.NUM_CANDIDATES, q_prec=q_prec,
            charge=float(bench.CHARGE), tol_val=bench.OPEN_TOL_DA,
            tol_mode="Da")[0]),
    ]:
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        print(f"{name:<28} {time.perf_counter() - t0:7.2f}s", flush=True)
    total = sum(marks.values())
    print(f"{'TOTAL first-call':<28} {total:7.2f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
