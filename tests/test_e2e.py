"""End-to-end cascade search tests on synthetic data.

Coverage the reference lacks (SURVEY.md §4): full CLI -> readers -> store
build -> cascade search -> FDR -> mzTab round trip, including open-search
identification of modified peptides via the shifted dot product.
"""

import numpy as np
import pytest

from ann_solo_tpu.io.mgf import write_mgf
from ann_solo_tpu.io.mztab import read_mztab_metadata, read_mztab_ssms
from ann_solo_tpu.io.splib import write_splib

from synth import make_library, modified_query, noisy_query


@pytest.fixture(scope="module")
def search_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(23)
    peptides, spectra = make_library(rng, n_peptides=60)
    lib_path = str(tmp / "lib.splib")
    write_splib(spectra, lib_path)

    unmodified, modified = [], []
    for i, spectrum in enumerate(spectra[:40]):
        unmodified.append(
            noisy_query(spectrum, rng, f"q_std_{i}")
        )
    for i, spectrum in enumerate(spectra[40:52]):
        modified.append(
            modified_query(
                peptides[40 + i], spectrum, rng, f"q_open_{i}"
            )
        )
    queries = unmodified + modified
    query_path = str(tmp / "queries.mgf")
    write_mgf(queries, query_path)
    return {
        "tmp": tmp,
        "peptides": peptides,
        "spectra": spectra,
        "lib_path": lib_path,
        "query_path": query_path,
        "n_std": len(unmodified),
        "n_open": len(modified),
    }


def _run_search(setup, out_name, **kwargs):
    from ann_solo_tpu.cli import main

    out_path = str(setup["tmp"] / out_name)
    args = [
        setup["lib_path"],
        setup["query_path"],
        out_path,
        "--precursor_tolerance_mass", "20",
        "--precursor_tolerance_mode", "ppm",
        "--fragment_mz_tolerance", "0.02",
        "--min_mz_range", "200",
        "--min_peaks", "5",
        "--model", "none",
        "--batch_size", "512",
        "--fdr", "0.05",
        "--add_decoys",
    ]
    for key, value in kwargs.items():
        if value is True:
            args.append(f"--{key}")
        else:
            args.extend([f"--{key}", str(value)])
    assert main(args) == 0
    return out_path


def test_standard_search(search_setup):
    out = _run_search(search_setup, "std.mztab", mode="bf")
    ssms = read_mztab_ssms(out)
    targets = ssms[~ssms["opt_ms_run[1]_cv_MS:1002217_decoy_peptide"]]
    confident = targets[targets["search_engine_score[2]"] < 0.05]
    # Standard search should identify most unmodified queries correctly.
    std_hits = [
        idx for idx in confident.index if str(idx).startswith("q_std")
    ]
    assert len(std_hits) >= 0.8 * search_setup["n_std"]
    peptides = search_setup["peptides"]
    for idx, row in confident.iterrows():
        if str(idx).startswith("q_std"):
            i = int(str(idx).split("_")[-1])
            assert row["sequence"] == peptides[i]
    # Modified queries cannot match in the standard pass.
    assert not any(str(i).startswith("q_open") for i in confident.index)


def test_cascade_open_search_shifted_dot(search_setup):
    out = _run_search(
        search_setup,
        "open.mztab",
        mode="bf",
        precursor_tolerance_mass_open=30,
        precursor_tolerance_mode_open="Da",
        allow_peak_shifts=True,
    )
    ssms = read_mztab_ssms(out)
    targets = ssms[~ssms["opt_ms_run[1]_cv_MS:1002217_decoy_peptide"]]
    # Tiny synthetic sets floor q at 1/group_size; use a loose gate and
    # check the assigned sequences exactly.
    confident = targets[targets["search_engine_score[2]"] < 0.2]
    peptides = search_setup["peptides"]
    open_hits = 0
    for idx, row in confident.iterrows():
        name = str(idx)
        if name.startswith("q_open"):
            i = int(name.split("_")[-1])
            if row["sequence"] == peptides[40 + i]:
                open_hits += 1
    # The shifted dot product should recover most modified queries.
    assert open_hits >= 0.6 * search_setup["n_open"]
    # Standard identifications are preserved through the cascade.
    std_hits = [
        i for i in confident.index if str(i).startswith("q_std")
    ]
    assert len(std_hits) >= 0.8 * search_setup["n_std"]


def test_mztab_metadata_roundtrip(search_setup):
    out = _run_search(search_setup, "meta.mztab", mode="bf")
    settings = read_mztab_metadata(out)
    assert settings["fragment_mz_tolerance"] == "0.02"
    assert settings["mode"] == "bf"
    assert settings["precursor_tolerance_mode"] == "ppm"
