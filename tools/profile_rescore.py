"""Rescore stage-floor audit (VERDICT r4 weak #1 / next-round #4).

Decomposes the bench rescore stage (rescore_candidate_matrix at
B=4096, C=1024, top_t=32) into:
  * query upload
  * stage-1 bounds (the 64-chunk lax.map pass)
  * stage-2 dense (top_k(ub, 32) + 131k-pair greedy + winner/cert)
  * result downloads (the four (B,) np.asarray round trips)
and times the packed-download formulation against the shipped one.

Run on the real chip: PYTHONPATH=/root/repo:/root/.axon_site python
tools/profile_rescore.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from ann_solo_tpu.ops import rescore as R
from ann_solo_tpu.ops.shifted_dot_pallas import use_pallas_default

B, C, K, T = 4096, 1024, 50, 32
N_LIB = 131072
FRAG_TOL = 0.02
CHARGE = 2


def timeit(fn, reps=4):
    fn()  # warm
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def synth(rng, n):
    mz = np.sort(
        rng.uniform(150.0, 1800.0, (n, K)).astype(np.float32), axis=1
    )
    inten = rng.uniform(0.05, 1.0, (n, K)).astype(np.float32)
    inten /= np.linalg.norm(inten, axis=1, keepdims=True)
    ann = rng.integers(0, 3, (n, K)).astype(np.int32)
    prec = rng.uniform(400.0, 1200.0, n).astype(np.float32)
    return mz, inten, ann, prec


def main():
    print("devices:", jax.devices())
    use_pallas = use_pallas_default()
    print("pallas:", use_pallas)
    rng = np.random.default_rng(3)
    lib_mz, lib_int, lib_ann, lib_prec = synth(rng, N_LIB)
    q_rows = rng.choice(N_LIB, B, replace=False)
    q_mz = lib_mz[q_rows] + rng.normal(0, 0.005, (B, K)).astype(np.float32)
    q_int = lib_int[q_rows]
    q_prec = lib_prec[q_rows]
    cand = rng.integers(0, N_LIB, (B, C)).astype(np.int32)
    cand[:, 0] = q_rows  # plant the true match

    lm, li, la, lp = (
        jnp.asarray(lib_mz), jnp.asarray(lib_int),
        jnp.asarray(lib_ann), jnp.asarray(lib_prec),
    )
    qm_d, qi_d = jnp.asarray(q_mz), jnp.asarray(q_int)
    qp_d = jnp.asarray(q_prec, jnp.float32)
    cand_d = jnp.asarray(cand, jnp.int32)
    np.asarray(lm[-1, -1:])

    c_chunk = max(8, min(C, 65536 // B))
    num_shifts = CHARGE + 1

    # --- upload leg (what stage_rescore pays per batch on fresh numpy)
    def upload():
        a = jnp.asarray(q_mz)
        b = jnp.asarray(q_int)
        c = jnp.asarray(q_prec, jnp.float32)
        d = jnp.asarray(cand, jnp.int32)
        np.asarray(d[:1, :1])
        return a, b, c, d

    t_up = timeit(upload)
    print(f"upload (q_mz/q_int/q_prec/cand): {t_up * 1e3:7.1f} ms")

    # --- stage 1 alone
    def s1():
        ub = R._stage1_bounds(
            qm_d, qi_d, qp_d, lm, li, la, lp, cand_d,
            FRAG_TOL, num_shifts, True, c_chunk,
        )
        np.asarray(ub[-1, -1:])
        return ub

    t_s1 = timeit(s1)
    ub_d = s1()
    print(f"stage-1 bounds ({B}x{C}, chunk {c_chunk}): {t_s1 * 1e3:7.1f} ms"
          f"  ({B * C / t_s1 / 1e6:.1f}M bounded pairs/s)")

    # --- stage 2 alone (given bounds resident)
    def s2():
        out = R._stage2_dense(
            qm_d, qi_d, qp_d, lm, li, la, lp, ub_d, cand_d, T,
            FRAG_TOL, num_shifts, True, use_pallas,
        )
        np.asarray(out[0][-1:])
        return out

    t_s2 = timeit(s2)
    print(f"stage-2 dense (top_k + {B * T // 1000}k greedy + cert): "
          f"{t_s2 * 1e3:7.1f} ms")

    # --- download leg: 4 serial (B,) np.asarray round trips
    outs = R._stage2_dense(
        qm_d, qi_d, qp_d, lm, li, la, lp, ub_d, cand_d, T,
        FRAG_TOL, num_shifts, True, use_pallas,
    )

    def dl4():
        for o in outs:
            np.asarray(o)

    t_dl4 = timeit(dl4)
    print(f"downloads, 4 serial (B,) asarray: {t_dl4 * 1e3:7.1f} ms")

    @jax.jit
    def pack(best_idx, best_score, cert, n_cands):
        return jnp.stack([
            best_idx.astype(jnp.int32),
            best_score.view(jnp.int32) if best_score.dtype == jnp.float32
            else jnp.asarray(best_score, jnp.float32).view(jnp.int32),
            cert.astype(jnp.int32),
            n_cands.astype(jnp.int32),
        ])

    def dl1():
        np.asarray(pack(*outs))

    t_dl1 = timeit(dl1)
    print(f"downloads, 1 packed (4, B) asarray: {t_dl1 * 1e3:7.1f} ms")

    # --- shipped end-to-end
    def full():
        return R.rescore_candidate_matrix(
            qm_d, qi_d, qp_d, lm, li, la, lp, cand_d,
            FRAG_TOL, num_shifts, True, use_pallas,
        )

    t_full = timeit(full)
    best_idx, best_score, n_cands = full()
    hit = float(np.mean(best_idx == q_rows))
    print(f"rescore_candidate_matrix end-to-end: {t_full * 1e3:7.1f} ms "
          f"({B * C / t_full / 1e6:.1f}M pairs/s, hit {hit:.3f})")
    print(f"accounted: upload {t_up * 1e3:.0f} + s1 {t_s1 * 1e3:.0f} + "
          f"s2 {t_s2 * 1e3:.0f} + dl {t_dl4 * 1e3:.0f} = "
          f"{(t_up + t_s1 + t_s2 + t_dl4) * 1e3:.0f} ms "
          f"(uploads excluded from end-to-end: inputs pre-resident)")


if __name__ == "__main__":
    main()
