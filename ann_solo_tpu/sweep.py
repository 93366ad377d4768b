"""ANN hyperparameter sweep: the iprg2012_ann_hyperparameters analog.

The reference picked its operating point from a num_list x num_probe
Pareto sweep (notebooks/iprg2012_ann_hyperparameters.ipynb: num_list in
{64..16384}, num_probe in {1..1024}, SSMs@FDR vs runtime).  Two modes:

* default: candidate recall@k + select throughput per grid point against
  exact brute force on an iPRG2012-scale hashed-vector corpus (fast, but
  i.i.d. Gaussian vectors are the adversarial worst case for deep-k
  recall -- see the emitted note).
* ``--spectrum``: the reference notebook's actual metric -- IDs@FDR per
  grid point on a `synthdata` hashed-SPECTRUM corpus (the operating
  distribution), with one brute-force cascade as the quality ceiling,
  producing an identifications-per-second Pareto.  This is what
  justifies the default 2048/128 operating point.

Usage: python -m ann_solo_tpu.sweep [--spectrum] --out SWEEP.json
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


def sweep_spectrum(parsed) -> int:
    """IDs@FDR per (num_list, num_probe) on a hashed-spectrum corpus.

    Methodology of notebooks/iprg2012_ann_hyperparameters.ipynb on the
    synthetic ground-truth corpus (ann_solo_tpu.synthdata): one
    brute-force cascade fixes the quality ceiling, then every grid point
    runs the full ann cascade (same store, per-num_list index built and
    persisted by the engine) and reports SSMs@FDR, the ratio to brute
    force, and identifications/second -- the Pareto that picks the
    operating point.
    """
    import logging
    import os
    import tempfile

    from ann_solo_tpu import rndm
    from ann_solo_tpu.quality import _cli_args, _mztab_stats

    logging.basicConfig(
        level=logging.INFO, stream=sys.stderr,
        format="{asctime} {levelname} {module}.{funcName} : {message}",
        style="{",
    )
    rndm.set_seeds()
    from ann_solo_tpu.cli import main as cli_main
    from ann_solo_tpu.io.mgf import write_mgf
    from ann_solo_tpu.io.splib import write_splib
    from ann_solo_tpu.synthdata import make_corpus

    workdir = parsed.workdir or tempfile.mkdtemp(prefix="annsolo_sweep_")
    os.makedirs(workdir, exist_ok=True)
    rng = np.random.default_rng(parsed.seed)
    log(
        f"corpus: {parsed.n_peptides} peptides x 2 charges, "
        f"{parsed.n_queries} queries"
    )
    library, queries, truth = make_corpus(
        rng, parsed.n_peptides, parsed.n_queries
    )
    lib_path = os.path.join(workdir, "library.splib")
    query_path = os.path.join(workdir, "queries.mgf")
    write_splib(library, lib_path)
    write_mgf(queries, query_path)

    # Quality ceiling: one brute-force cascade.
    parsed.model = getattr(parsed, "model", "none")
    grid_lists = list(parsed.num_list)
    grid_probes = list(parsed.num_probe)
    # bf ignores the ANN knobs but the CLI still parses them: pin
    # scalars (parsed still holds the grid lists at this point).
    parsed.num_list = grid_lists[0]
    parsed.num_probe = grid_probes[0]
    bf_stats = None
    if not parsed.skip_bf:
        bf_path = os.path.join(workdir, "bf.mztab")
        t0 = time.perf_counter()
        cli_main(_cli_args(lib_path, query_path, bf_path, "bf", parsed))
        bf_stats = _mztab_stats(bf_path, truth, parsed)
        bf_stats["search_seconds"] = round(time.perf_counter() - t0, 1)
        log(f"bf ceiling: {json.dumps(bf_stats)}")

    grid = []
    for num_list in grid_lists:
        for num_probe in grid_probes:
            if num_probe > num_list:
                continue
            parsed.num_list = num_list
            parsed.num_probe = num_probe
            out_path = os.path.join(
                workdir, f"ann_{num_list}_{num_probe}.mztab"
            )
            t0 = time.perf_counter()
            cli_main(
                _cli_args(lib_path, query_path, out_path, "ann", parsed)
            )
            elapsed = time.perf_counter() - t0
            stats = _mztab_stats(out_path, truth, parsed)
            entry = {
                "num_list": num_list,
                "num_probe": num_probe,
                "scan_fraction": round(num_probe / num_list, 4),
                "ids_at_fdr": stats["n_confident"],
                "accuracy": round(stats["accuracy"], 4),
                "search_seconds": round(elapsed, 1),
                "ids_per_sec": round(
                    stats["n_confident"] / max(elapsed, 1e-9), 1
                ),
                "queries_per_sec": round(
                    parsed.n_queries / max(elapsed, 1e-9), 1
                ),
            }
            if bf_stats:
                entry["ids_vs_bf_ratio"] = round(
                    stats["n_confident"]
                    / max(bf_stats["n_confident"], 1),
                    4,
                )
            grid.append(entry)
            log(json.dumps(entry))

    out = {
        "corpus": {
            "n_library_spectra": len(library),
            "n_library_spectra_with_decoys": 2 * len(library),
            "n_queries": len(queries),
            "seed": parsed.seed,
            "distribution": "synthdata hashed spectra (operating regime)",
        },
        "config": {
            "fdr": parsed.fdr,
            "model": parsed.model,
            "open_tolerance_da": parsed.open_tolerance,
            "num_candidates": parsed.num_candidates,
        },
        "bf_ceiling": bf_stats,
        "grid": grid,
    }
    with open(parsed.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


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
    parser.add_argument(
        "--spectrum", action="store_true",
        help="IDs@FDR sweep on a hashed-spectrum corpus (the "
        "iprg2012_ann_hyperparameters metric) instead of raw recall "
        "on Gaussian vectors",
    )
    parser.add_argument("--workdir", default=None)
    parser.add_argument("--n-peptides", type=int, default=25000)
    parser.add_argument("--fdr", type=float, default=0.01)
    parser.add_argument("--model", default="none")
    parser.add_argument("--open-tolerance", type=float, default=300.0)
    parser.add_argument("--num_candidates", type=int, default=1024)
    parser.add_argument("--index_dtype", default="bf16",
                        choices=["bf16", "f32", "int8"])
    parser.add_argument("--skip-bf", action="store_true")
    parsed = parser.parse_args(args)
    if parsed.spectrum:
        parsed.n_queries = (
            parsed.n_queries if parsed.n_queries != 1024 else 4096
        )
        return sweep_spectrum(parsed)

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
