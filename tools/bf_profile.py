"""Stage breakdown of the brute-force (bf) cascade on a QUALITY corpus.

VERDICT r3 weak #5 / task 8: the bf oracle leg costs ~10 min per
QUALITY cycle.  This instruments one bf search over the first N queries
of an existing QUALITY workdir and attributes wall time to:

  * std-pass vs open-pass window rescoring (narrow vs wide leg),
  * per-leg pair counts (how much shifted-dot work each leg does),
  * best-pair match extraction,
  * everything else (IO, preprocessing, SSM assembly, FDR).

Usage: python tools/bf_profile.py [workdir] [n_queries]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main(workdir: str = ".quality_r04", n_queries: int = 2048) -> int:
    import logging

    logging.basicConfig(level=logging.INFO, stream=sys.stderr)

    from ann_solo_tpu.config import config
    from ann_solo_tpu.quality import _cli_args
    from ann_solo_tpu import search as search_mod

    class P:
        open_tolerance = 300.0
        model = "none"
        num_list = 0
        num_probe = 256
        num_candidates = 1024
        index_dtype = "bf16"
        fdr = 0.01

    # Slice the first N queries into a temp mgf.
    src = f"{workdir}/queries.mgf"
    dst = "/tmp/bf_profile_queries.mgf"
    n_copied, block = 0, []
    with open(src) as fin, open(dst, "w") as fout:
        for line in fin:
            block.append(line)
            if line.startswith("END IONS"):
                fout.writelines(block)
                block = []
                n_copied += 1
                if n_copied >= n_queries:
                    break
    print(f"{n_copied} queries sliced", file=sys.stderr)

    config.parse(
        _cli_args(f"{workdir}/library.splib", dst, "unused", "bf", P)
    )

    # Wrap the rescore legs with timers + pair counters.
    stats = {}

    def wrap(name, fn, pair_count):
        def inner(self, *args, **kwargs):
            t0 = time.perf_counter()
            out = fn(self, *args, **kwargs)
            # Host-sync'ed already (all legs return NumPy).
            dt = time.perf_counter() - t0
            e = stats.setdefault(name, [0.0, 0, 0])
            e[0] += dt
            e[1] += 1
            e[2] += pair_count(*args, **kwargs)
            return out

        return inner

    orig_win = search_mod.SpectralLibrary._rescore_window_ranges
    orig_match = search_mod.SpectralLibrary._best_pair_matches

    def win_pairs(q_mz, q_int, q_prec, lib, lo, hi, charge):
        return int(np.sum(hi - lo))

    def match_pairs(q_mz, q_int, q_prec, lib, rows, cand_idx, charge):
        return len(rows)

    search_mod.SpectralLibrary._rescore_window_ranges = wrap(
        "window_rescore", orig_win, win_pairs
    )
    search_mod.SpectralLibrary._best_pair_matches = wrap(
        "best_pair_matches", orig_match, match_pairs
    )

    # Split the window leg further: narrow vs wide run() calls.
    leg = {}
    orig_rcm = search_mod.SpectralLibrary._rescore_window_ranges

    t_all = time.perf_counter()
    library = search_mod.SpectralLibrary(f"{workdir}/library.splib")
    t_init = time.perf_counter() - t_all

    t0 = time.perf_counter()
    ssms = library.search(dst)
    t_search = time.perf_counter() - t0
    library.shutdown()

    print(f"\ninit(store load): {t_init:.1f}s")
    print(f"search total: {t_search:.1f}s for {n_copied} queries "
          f"({n_copied / t_search:.0f} q/s), {len(ssms)} SSMs")
    for name, (dt, calls, pairs) in stats.items():
        rate = pairs / dt / 1e6 if dt else 0.0
        print(f"  {name:<22} {dt:7.1f}s  calls={calls:<4d} "
              f"pairs={pairs / 1e6:8.1f}M  ({rate:.2f}M pairs/s)")
    other = t_search - sum(v[0] for v in stats.values())
    print(f"  {'other (IO/host/FDR)':<22} {other:7.1f}s")
    return 0


if __name__ == "__main__":
    args = sys.argv[1:]
    sys.exit(main(
        args[0] if args else ".quality_r04",
        int(args[1]) if len(args) > 1 else 2048,
    ))
