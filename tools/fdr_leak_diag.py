"""Foreign-query FDR leak diagnostic (VERDICT r4 weak #4).

QUALITY_r04 measured foreign_leak_rate ~0.07 at the 1% FDR threshold in
BOTH the bf and ann legs (identical, so ann/bf ratios are unaffected) --
out-of-library queries accepted as confident at ~7x the nominal rate.
This tool diagnoses WHY on a QUALITY workdir (needs truth.json, written
by quality.py since round 5):

1. **Calibration curve**: ground-truth false-discovery proportion among
   accepted target SSMs vs the nominal q-value threshold.  TDC
   estimates FDR as (#decoy wins)/(#target wins) above threshold; if
   the curve sits above y=x the decoy competition under-models the
   incorrect-match score distribution.
2. **Score distributions**: the decoy-win score distribution vs the
   foreign-query target-win score distribution.  Exchangeability (the
   TDC assumption) demands an incorrect match be equally likely to top
   out on a decoy or a target of equal score; if foreign queries'
   TARGET wins stochastically dominate decoy wins, shuffled decoys are
   systematically easier to beat than wrong-but-real peptides -- the
   known optimistic bias of shuffle decoys on homologous libraries
   (the reference inherits the same scheme, decoy_generator.py).

Usage: JAX_PLATFORMS=cpu python tools/fdr_leak_diag.py <workdir> [fdr]
Writes <workdir>/fdr_leak_diag.json and prints a summary.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def diagnose(workdir: str, fdr: float = 0.01) -> dict:
    from ann_solo_tpu.io.mztab import read_mztab_ssms

    with open(os.path.join(workdir, "truth.json")) as f:
        truth = json.load(f)
    out = {}
    for mode in ("bf", "ann"):
        path = os.path.join(workdir, f"{mode}.mztab")
        if not os.path.isfile(path):
            continue
        ssms = read_mztab_ssms(path)
        is_decoy = ssms["opt_ms_run[1]_cv_MS:1002217_decoy_peptide"]
        q = ssms["search_engine_score[2]"].astype(float)
        score = ssms["search_engine_score[1]"].astype(float)
        qid = [str(i) for i in ssms.index]
        is_foreign = np.array(
            [truth.get(i, "") is None for i in qid]
        )
        correct = np.array([
            truth.get(i, "") == row_seq
            for i, row_seq in zip(qid, ssms["sequence"])
        ])

        # 1. calibration: empirical FDP among accepted targets vs the
        # nominal threshold.
        curve = []
        for thr in (0.005, 0.01, 0.02, 0.05, 0.1):
            acc = (~is_decoy) & (q.values < thr)
            n = int(acc.sum())
            fdp = float((~correct[acc]).mean()) if n else 0.0
            leak = (
                float(is_foreign[acc].sum() / max(is_foreign.sum(), 1))
            )
            curve.append({
                "nominal_q": thr, "n_accepted": n,
                "empirical_fdp": round(fdp, 4),
                "foreign_leak_rate": round(leak, 4),
            })

        # 2. exchangeability: decoy-win scores vs foreign target-win
        # scores.  Under the TDC assumption these distributions should
        # be near-identical (a foreign query is exactly the
        # incorrect-match null the decoys are supposed to emulate).
        dec_scores = score.values[is_decoy.values]
        foreign_tgt = score.values[is_foreign & ~is_decoy.values]
        qs = [50, 75, 90, 95, 99]
        quant = {
            "decoy_win_score": {
                f"p{p}": round(float(np.percentile(dec_scores, p)), 4)
                for p in qs
            } if len(dec_scores) else {},
            "foreign_target_win_score": {
                f"p{p}": round(float(np.percentile(foreign_tgt, p)), 4)
                for p in qs
            } if len(foreign_tgt) else {},
            "n_decoy_wins": int(is_decoy.sum()),
            "n_foreign_target_wins": int((is_foreign & ~is_decoy).sum()),
        }
        # Mann-Whitney-style dominance: P(foreign target win > random
        # decoy win).  0.5 = exchangeable; >> 0.5 = decoys too easy.
        if len(dec_scores) and len(foreign_tgt):
            sample = np.random.default_rng(0).choice(
                dec_scores, size=min(len(dec_scores), 5000),
                replace=False,
            )
            f = np.sort(foreign_tgt)
            dominance = float(
                np.mean(np.searchsorted(f, sample) / len(f))
            )
            quant["p_foreign_beats_decoy"] = round(1.0 - dominance, 4)
        out[mode] = {"calibration": curve, "scores": quant}
    return out


def main() -> int:
    workdir = sys.argv[1]
    fdr = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
    result = diagnose(workdir, fdr)
    out_path = os.path.join(workdir, "fdr_leak_diag.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    print(f"written: {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
