"""Mirror-plot CLI and eval-stats tests (reference: plot_ssm.py)."""

import os

import numpy as np
import pytest

from ann_solo_tpu.io.mgf import write_mgf
from ann_solo_tpu.io.mztab import read_mztab_ssms
from ann_solo_tpu.io.splib import write_splib

from synth import make_library, noisy_query


@pytest.fixture(scope="module")
def result(tmp_path_factory):
    from ann_solo_tpu.cli import main

    tmp = tmp_path_factory.mktemp("plot")
    rng = np.random.default_rng(53)
    peptides, spectra = make_library(rng, n_peptides=25)
    lib_path = str(tmp / "lib.splib")
    write_splib(spectra, lib_path)
    queries = [
        noisy_query(s, rng, f"q_{i}") for i, s in enumerate(spectra[:15])
    ]
    query_path = str(tmp / "queries.mgf")
    write_mgf(queries, query_path)
    out_path = str(tmp / "out.mztab")
    assert main([
        lib_path, query_path, out_path,
        "--precursor_tolerance_mass", "20",
        "--precursor_tolerance_mode", "ppm",
        "--fragment_mz_tolerance", "0.02",
        "--min_mz_range", "200", "--min_peaks", "5",
        "--model", "none", "--mode", "bf",
        "--fdr", "0.2", "--add_decoys",
    ]) == 0
    return tmp, out_path


def test_plot_ssm(result):
    from ann_solo_tpu.plot import main as plot_main

    tmp, out_path = result
    ssms = read_mztab_ssms(out_path)
    query_id = str(ssms.index[0])
    assert plot_main([out_path, query_id]) == 0
    png = f"{os.path.splitext(out_path)[0]}_{query_id}.png"
    assert os.path.isfile(png)
    assert os.path.getsize(png) > 1000


def test_eval_stats(result):
    from ann_solo_tpu.eval import main as eval_main, ssm_stats

    _, out_path = result
    ssms = read_mztab_ssms(out_path)
    stats = ssm_stats(ssms, fdr=0.2)
    assert stats["n_targets"] >= 10
    assert stats["n_confident"] >= 10
    assert stats["n_unmodified"] == stats["n_confident"]
    assert eval_main([out_path, "--fdr", "0.2"]) == 0
