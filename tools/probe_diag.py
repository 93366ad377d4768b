"""Offline probe-ordering diagnostic on a QUALITY workdir.

For every brute-force-identified SSM, finds the IVF lists that hold the
matched library vector's copies and asks: at probe depth p, is at least
one of those lists probed?  Compares orderings:

  * plain      -- top-p by q . c                 (shipped)
  * radius     -- top-p by q . c + r_l           (IP upper bound;
                  r_l = max residual norm in list l)
  * radius-q90 -- top-p by q . c + 0.5 * r_l     (less conservative)

This is the *probed-list* recall, an upper bound on candidate recall@k:
if no copy's list is probed the vector is unreachable at any k.  Run on
CPU; reads a QUALITY workdir (only the mzTab files are committed in
.quality_r04 -- regenerate the corpus/index with
`python -m ann_solo_tpu.quality --workdir .quality_r04 --seed 42`).

Usage: JAX_PLATFORMS=cpu python tools/probe_diag.py .quality_r04
"""

from __future__ import annotations

import sys

import numpy as np


def main(workdir: str) -> int:
    from ann_solo_tpu.config import config
    from ann_solo_tpu.models.vectorize import (
        VectorizeParams,
        vectorize_batch,
    )
    from ann_solo_tpu.quality import _bf_matches, _cli_args
    from ann_solo_tpu.search import SpectralLibrary

    class P:
        open_tolerance = 300.0
        model = "none"
        num_list = 0
        num_probe = 256
        num_candidates = 1024
        index_dtype = "bf16"
        fdr = 0.01

    lib_path = f"{workdir}/library.splib"
    config.parse(
        _cli_args(lib_path, f"{workdir}/queries.mgf", "unused", "ann", P)
    )
    bf = _bf_matches(f"{workdir}/bf.mztab", P)
    library = SpectralLibrary(lib_path)
    queries = library._read_and_process_queries(f"{workdir}/queries.mgf")
    ident_to_row = {
        str(ident): row
        for row, ident in enumerate(library._store.identifiers)
    }

    probes = [64, 128, 192, 256, 384, 512]
    tallies = {}  # name -> found_rank list
    for charge, spectra in queries.items():
        if charge not in library._ann_indexes:
            continue
        lib = library._get_charge_lib(charge)
        row_to_pos = {int(r): i for i, r in enumerate(lib.rows)}
        wanted = [
            (i, row_to_pos.get(
                ident_to_row.get(bf.get(s.identifier, ""), -1), -1))
            for i, s in enumerate(spectra)
            if s.identifier in bf
        ]
        wanted = [(i, pos) for i, pos in wanted if pos >= 0]
        if not wanted:
            continue
        idx = library._ann_indexes[charge]
        centroids = np.asarray(idx.centroids, np.float32)
        padded_ids = np.asarray(idx.padded_ids)
        vecs = np.asarray(idx.padded_vectors, np.float32)
        scales = np.asarray(idx.padded_scales, np.float32)
        l, cap = padded_ids.shape
        vecs = vecs * scales[:, :, None]
        # max residual norm per list over valid slots
        res = vecs - centroids[:, None, :]
        rn = np.linalg.norm(res, axis=2)
        rn[padded_ids < 0] = 0.0
        r_max = rn.max(axis=1)
        print(f"charge {charge}: L={l} cap={cap} "
              f"r_max mean={r_max.mean():.3f} std={r_max.std():.3f} "
              f"min={r_max.min():.3f} max={r_max.max():.3f}")

        # lists holding each position's copies
        pos_lists = {}
        for li in range(l):
            for s_ in padded_ids[li]:
                if s_ >= 0:
                    pos_lists.setdefault(int(s_), []).append(li)

        k_peaks = library._query_params.max_peaks_used
        rows = [i for i, _ in wanted]
        q_mz = np.zeros((len(rows), k_peaks), np.float32)
        q_int = np.zeros((len(rows), k_peaks), np.float32)
        n_peaks = np.zeros(len(rows), np.int32)
        for j, i in enumerate(rows):
            s = spectra[i]
            n = min(s.n_peaks, k_peaks)
            q_mz[j, :n] = s.mz[:n]
            q_int[j, :n] = s.intensity[:n]
            n_peaks[j] = n
        vparams = VectorizeParams.from_config(config)
        qv = np.asarray(vectorize_batch(
            vparams, vparams.device_tables(), q_mz, q_int, n_peaks
        ))
        coarse = qv @ centroids.T  # (B, L)
        for name, bias in [
            ("plain", None),
            ("radius", r_max),
            ("radius-half", 0.5 * r_max),
        ]:
            sc = coarse if bias is None else coarse + bias[None, :]
            # rank of each list per query (dense ranks via argsort)
            order = np.argsort(-sc, axis=1)
            rank = np.empty_like(order)
            np.put_along_axis(
                rank, order,
                np.broadcast_to(np.arange(l), order.shape), axis=1)
            found = tallies.setdefault(name, [])
            for j, (_, pos) in enumerate(wanted):
                ls = pos_lists.get(pos, [])
                found.append(
                    min(rank[j, li] for li in ls) if ls else 10**9)

    n = len(next(iter(tallies.values())))
    print(f"n_checked={n}")
    hdr = "ordering    " + "".join(f"  p<={p:4d}" for p in probes)
    print(hdr)
    for name, found in tallies.items():
        found = np.asarray(found)
        row = "".join(
            f"  {float((found < p).mean()):.4f}" for p in probes)
        print(f"{name:<12}{row}")
    library.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
