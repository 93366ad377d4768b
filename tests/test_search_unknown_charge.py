"""Unknown precursor charge: duplication for charges 2/3 + best-score dedup
(reference spectral_library.py:217-223,309-316)."""

import numpy as np

from ann_solo_tpu.io.mgf import read_mgf, write_mgf
from ann_solo_tpu.io.mztab import read_mztab_ssms
from ann_solo_tpu.io.splib import write_splib

from synth import make_library, noisy_query


def test_unknown_charge_queries(tmp_path):
    from ann_solo_tpu.cli import main

    rng = np.random.default_rng(61)
    peptides, spectra = make_library(rng, n_peptides=30, charges=(2, 3))
    lib_path = str(tmp_path / "lib.splib")
    write_splib(spectra, lib_path)
    queries = []
    for i, spectrum in enumerate(spectra[:12]):
        query = noisy_query(spectrum, rng, f"q_{i}")
        query.precursor_charge = None  # strip the charge
        queries.append(query)
    query_path = str(tmp_path / "queries.mgf")
    write_mgf(queries, query_path)
    # Round-trip keeps the unknown charge.
    assert all(
        s.precursor_charge is None for s in read_mgf(query_path)
    )
    out_path = str(tmp_path / "out.mztab")
    assert main([
        lib_path, query_path, out_path,
        "--precursor_tolerance_mass", "20",
        "--precursor_tolerance_mode", "ppm",
        "--fragment_mz_tolerance", "0.02",
        "--min_mz_range", "200", "--min_peaks", "5",
        "--model", "none", "--mode", "bf", "--fdr", "0.3",
        "--add_decoys",
    ]) == 0
    ssms = read_mztab_ssms(out_path)
    # One SSM per query (duplicates deduplicated), assigned the charge of
    # its best-scoring expansion = the true library charge.
    assert ssms.index.nunique() == len(ssms)
    correct = 0
    for idx, row in ssms.iterrows():
        i = int(str(idx).split("_")[-1])
        true_charge = spectra[i].precursor_charge
        if (
            int(row["charge"]) == true_charge
            and row["sequence"] == peptides[i]
        ):
            correct += 1
    assert correct >= 9
