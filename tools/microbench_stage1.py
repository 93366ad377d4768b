"""Stage-1 rescore-bound chunk ladder: pairs/step vs wall time.

`rescore_candidate_matrix` picks c_chunk so each `lax.map` step covers
~64k pairs (measured 2.8x faster than 16k in round 4).  This ladder
measures LARGER steps at the bench shape (B=4096, C=1024, K=50,
131k-row library) to check whether 64k is the knee or just where the
round-4 ladder stopped.

ANSWER (measured on v5e, end of round 4): 64k IS the knee.
c_chunk=16 (64k pairs/step) 207.2 ms/batch, c_chunk=64 (262k)
243.7 ms, c_chunk=128 (524k) 248.6 ms — bigger steps push the fused
(P, K, K) working set past what the VPU pipeline hides and lose ~18%.
The shipped 65536 // B default stands.

Usage: python tools/microbench_stage1.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

B = 4096
C = 1024
K = 50
N_LIB = 131072
CHARGE = 2
FRAG_TOL = 0.04


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax.numpy as jnp

    from ann_solo_tpu.ops.rescore import _stage1_bounds

    rng = np.random.default_rng(7)

    def spectra(n):
        mz = np.sort(
            rng.uniform(101, 1500, (n, K)).astype(np.float32), axis=1
        )
        it = rng.uniform(0.1, 1, (n, K)).astype(np.float32)
        it /= np.linalg.norm(it, axis=1, keepdims=True)
        ann = rng.integers(0, CHARGE + 1, (n, K)).astype(np.int32)
        prec = rng.uniform(400, 1200, n).astype(np.float32)
        return mz, it, ann, prec

    lm, li, la, lp = spectra(N_LIB)
    qm, qi, _, qp = spectra(B)
    cand = rng.integers(0, N_LIB, (B, C)).astype(np.int32)

    lm_d, li_d, la_d, lp_d = map(jnp.asarray, (lm, li, la, lp))
    qm_d, qi_d, qp_d = map(jnp.asarray, (qm, qi, qp))
    cand_d = jnp.asarray(cand)

    ref = None
    for c_chunk in (16, 64, 128):
        args = (
            qm_d, qi_d, qp_d, lm_d, li_d, la_d, lp_d, cand_d,
            FRAG_TOL, CHARGE + 1, True, c_chunk,
        )
        out = _stage1_bounds(*args)
        host = np.asarray(out)  # compile + full sync
        if ref is None:
            ref = host
        else:
            assert np.allclose(ref, host, rtol=1e-6), c_chunk
        reps = 4
        t0 = time.perf_counter()
        for _ in range(reps):
            out = _stage1_bounds(*args)
        np.asarray(out[:1, :1])
        dt = (time.perf_counter() - t0) / reps
        log(
            f"c_chunk={c_chunk:4d} ({B * c_chunk:7d} pairs/step): "
            f"{dt * 1e3:7.1f} ms/batch"
        )


if __name__ == "__main__":
    main()
