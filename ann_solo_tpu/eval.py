"""Result-file statistics (the reference's notebooks-style evaluation).

The reference validates end-to-end behavior through analysis notebooks that
parse mzTab outputs (SURVEY.md §4, §6: iprg2012_fdr.ipynb etc.).  This
module provides the same aggregations as a library/CLI: SSM counts at an
FDR threshold, modified/unmodified splits, and mass-difference histograms
for open-search results.
"""

from __future__ import annotations

import argparse
import json
from typing import Dict, Optional

import numpy as np
import pandas as pd

from ann_solo_tpu.io.mztab import read_mztab_ssms


def ssm_stats(
    ssms: pd.DataFrame,
    fdr: float = 0.01,
    tol_mass: float = 0.1,
) -> Dict:
    """Summary statistics over an mzTab SSM table.

    `tol_mass` separates unmodified SSMs (|mass diff| <= tol) from modified
    ones, as the reference notebooks do for open searches.
    """
    targets = ssms[~ssms["opt_ms_run[1]_cv_MS:1002217_decoy_peptide"]]
    q = targets["search_engine_score[2]"].astype(float)
    confident = targets[q < fdr]
    mass_diff = (
        confident["exp_mass_to_charge"].astype(float)
        - confident["calc_mass_to_charge"].astype(float)
    ) * confident["charge"].astype(float)
    n_unmodified = int((mass_diff.abs() <= tol_mass).sum())
    return {
        "n_ssms": int(len(ssms)),
        "n_targets": int(len(targets)),
        "n_decoy_matches": int(len(ssms) - len(targets)),
        "fdr_threshold": fdr,
        "n_confident": int(len(confident)),
        "n_unmodified": n_unmodified,
        "n_modified": int(len(confident) - n_unmodified),
        "n_unique_peptides": int(confident["sequence"].nunique()),
    }


def mass_diff_histogram(
    ssms: pd.DataFrame,
    fdr: float = 0.01,
    bin_width: float = 0.01,
    min_mass: Optional[float] = None,
    max_mass: Optional[float] = None,
):
    """Histogram of precursor mass differences of confident SSMs
    (the open-search modification profile)."""
    targets = ssms[~ssms["opt_ms_run[1]_cv_MS:1002217_decoy_peptide"]]
    confident = targets[
        targets["search_engine_score[2]"].astype(float) < fdr
    ]
    mass_diff = (
        confident["exp_mass_to_charge"].astype(float)
        - confident["calc_mass_to_charge"].astype(float)
    ) * confident["charge"].astype(float)
    if min_mass is None:
        min_mass = float(np.floor(mass_diff.min())) if len(mass_diff) \
            else -1.0
    if max_mass is None:
        max_mass = float(np.ceil(mass_diff.max())) if len(mass_diff) \
            else 1.0
    bins = np.arange(min_mass, max_mass + bin_width, bin_width)
    hist, edges = np.histogram(mass_diff, bins=bins)
    return hist, edges


def main(args=None) -> int:
    parser = argparse.ArgumentParser(
        description="Summarize an ANN-SoLo-TPU mzTab result file "
        "(or run the full quality benchmark: "
        "`... eval quality [options]`, see ann_solo_tpu.quality)"
    )
    parser.add_argument("mztab_filename")
    parser.add_argument("--fdr", type=float, default=0.01)
    import sys

    argv = list(sys.argv[1:] if args is None else args)
    if argv and argv[0] == "quality":
        # Full bf-vs-ann quality benchmark on a synthetic ground-truth
        # corpus (IDs@FDR, accuracy, ANN candidate recall curve).
        from ann_solo_tpu.quality import main as quality_main

        return quality_main(argv[1:])
    parsed = parser.parse_args(argv)
    ssms = read_mztab_ssms(parsed.mztab_filename)
    print(json.dumps(ssm_stats(ssms, parsed.fdr), indent=2))
    return 0


if __name__ == "__main__":
    main()
