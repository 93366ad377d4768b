"""ANN hyperparameter sweep: the iprg2012_ann_hyperparameters analog.

The reference picked its operating point from a num_list x num_probe
Pareto sweep (notebooks/iprg2012_ann_hyperparameters.ipynb: num_list in
{64..16384}, num_probe in {1..1024}, SSMs@FDR vs runtime).  This CLI
reproduces the methodology against exact brute force on an
iPRG2012-scale hashed-vector corpus: for every grid point it reports
candidate recall@k and select throughput, so an operating point can be
chosen per deployment (the bench default 2048/128 came from this).

Usage: python -m ann_solo_tpu.sweep --out SWEEP.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

D = 800


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main(args=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=131072)
    parser.add_argument("--n-queries", type=int, default=1024)
    parser.add_argument(
        "--num-list", type=int, nargs="+", default=[1024, 2048, 4096]
    )
    parser.add_argument(
        "--num-probe", type=int, nargs="+", default=[32, 64, 128, 256]
    )
    parser.add_argument("--k", type=int, default=1024)
    parser.add_argument("--seed", type=int, default=11)
    parser.add_argument("--out", default="SWEEP.json")
    parsed = parser.parse_args(args)

    import jax
    import jax.numpy as jnp

    from ann_solo_tpu.index.ivf import IvfIndex, bruteforce_search

    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(parsed.seed)
    n, b = parsed.n, parsed.n_queries
    vectors = rng.standard_normal((n, D), dtype=np.float32)
    vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)
    prec = np.sort(rng.uniform(400, 1200, n)).astype(np.float32)
    rows = rng.choice(n, b, replace=False)
    queries = vectors[rows] + 0.05 * rng.standard_normal(
        (b, D), dtype=np.float32
    )
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    q_prec = prec[rows]
    vectors_d = jnp.asarray(vectors)

    log("brute-force ground truth...")
    exact = bruteforce_search(vectors, queries, parsed.k)
    exact_sets = [set(row[row >= 0].tolist()) for row in exact]
    ks = sorted({1, 10, 128, parsed.k})

    results = []
    for num_list in parsed.num_list:
        class Cfg:
            pass

        cfg = Cfg()
        cfg.num_list = num_list
        cfg.num_probe = max(parsed.num_probe)
        t0 = time.perf_counter()
        index = IvfIndex.build(vectors_d, cfg, precursor_mz=prec)
        np.asarray(index.padded_vectors[-1, -1:])  # real sync (block_until_ready is a no-op on tunneled backends)
        t_build = time.perf_counter() - t0
        for num_probe in parsed.num_probe:
            if num_probe > num_list:
                continue
            cand = index.search(queries, parsed.k, num_probe=num_probe)
            t0 = time.perf_counter()
            n_runs = 3
            for _ in range(n_runs):
                cand = index.search(
                    queries, parsed.k, num_probe=num_probe
                )
            qps = b / ((time.perf_counter() - t0) / n_runs)
            recalls = {}
            for k in ks:
                hits = [
                    len(set(cand[i][:k][cand[i][:k] >= 0].tolist())
                        & exact_sets[i]) / min(k, len(exact_sets[i]))
                    for i in range(b)
                ]
                recalls[f"recall@{k}"] = round(float(np.mean(hits)), 4)
            scan_frac = round(num_probe / num_list, 4)
            entry = {
                "num_list": num_list,
                "num_probe": num_probe,
                "scan_fraction": scan_frac,
                "build_sec": round(t_build, 2),
                "select_queries_per_sec": round(qps, 1),
                **recalls,
            }
            results.append(entry)
            log(json.dumps(entry))
        # Per-config indexes are large; free before the next num_list.
        index._device = None
        del index

    out = {
        "corpus": {"n_vectors": n, "dims": D, "n_queries": b,
                   "seed": parsed.seed},
        "note": "i.i.d. Gaussian vectors are the adversarial WORST case "
        "for deep-k recall (the true top-k spreads uniformly over "
        "lists); real hashed spectra cluster by peptide similarity, "
        "where probed-list recall is far higher (see "
        "QUALITY_r02.json ann_candidate_recall on spectrum corpora). "
        "recall@1/@10 reflect the operating regime that matters for "
        "best-match search.",
        "grid": results,
    }
    with open(parsed.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
