"""Spectrum-corpus IDs@FDR sweep smoke test (iprg2012 hyperparameter
methodology, ann_solo_tpu/sweep.py --spectrum)."""

import json
import os

from ann_solo_tpu.sweep import main


def test_spectrum_sweep_smoke(tmp_path):
    out = str(tmp_path / "SWEEP.json")
    rc = main([
        "--spectrum",
        "--n-peptides", "60",
        "--n-queries", "40",
        "--num-list", "8",
        "--num-probe", "2", "4",
        "--num_candidates", "16",
        "--fdr", "0.05",
        "--seed", "3",
        "--workdir", str(tmp_path / "work"),
        "--out", out,
    ])
    assert rc == 0
    result = json.load(open(out))
    assert result["bf_ceiling"]["n_confident"] > 0
    grid = result["grid"]
    assert len(grid) == 2
    for entry in grid:
        assert entry["ids_at_fdr"] >= 0
        assert entry["ids_per_sec"] >= 0
        assert 0.0 <= entry["ids_vs_bf_ratio"] <= 1.5
    # More probes can only widen the candidate set: IDs monotone
    # non-decreasing along the probe axis (tiny-corpus tolerance of 1).
    assert grid[1]["ids_at_fdr"] >= grid[0]["ids_at_fdr"] - 1
    # mztab outputs for every grid point exist alongside the bf ceiling.
    work = str(tmp_path / "work")
    assert os.path.exists(os.path.join(work, "bf.mztab"))
    assert os.path.exists(os.path.join(work, "ann_8_4.mztab"))
