"""End-to-end searches through the less-traveled IO paths.

The mgf-library + mgf-query path is covered by test_e2e*; these runs
exercise the mzML query reader and the FASTA -> locally-predicted
spectral library path inside the FULL cascade engine.
"""

import numpy as np
import pytest

from ann_solo_tpu.io.mgf import write_mgf
from ann_solo_tpu.io.mztab import read_mztab_ssms
from ann_solo_tpu.io.mzml import write_mzml
from ann_solo_tpu.io.splib import write_splib

from synth import make_library, noisy_query


def _base_args(lib, query, out):
    return [
        lib, query, out,
        "--precursor_tolerance_mass", "20",
        "--precursor_tolerance_mode", "ppm",
        "--fragment_mz_tolerance", "0.02",
        "--min_mz_range", "200",
        "--min_peaks", "5",
        "--model", "none",
        "--mode", "bf",
        "--fdr", "0.05",
        "--add_decoys",
    ]


def test_mzml_query_cascade(tmp_path):
    from ann_solo_tpu.cli import main

    rng = np.random.default_rng(91)
    peptides, spectra = make_library(rng, n_peptides=30)
    lib_path = str(tmp_path / "lib.splib")
    write_splib(spectra, lib_path)
    queries = [
        noisy_query(s, rng, f"q{i}") for i, s in enumerate(spectra[:12])
    ]
    query_path = str(tmp_path / "queries.mzML")
    write_mzml(queries, query_path)
    out = str(tmp_path / "out.mztab")
    assert main(_base_args(lib_path, query_path, out)) == 0
    ssms = read_mztab_ssms(out)
    assert len(ssms) == 12
    correct = sum(
        row["sequence"] == peptides[int(str(qid).lstrip("q"))]
        for qid, row in ssms.iterrows()
    )
    assert correct >= 10


def test_fasta_library_cascade(tmp_path):
    """FASTA library: tryptic digestion + local fragment-ion prediction
    (the zero-egress Prosit fallback), then a full search against it."""
    from ann_solo_tpu.cli import main
    from ann_solo_tpu.config import config
    from ann_solo_tpu.io.reader import read_library_file

    # A protein whose tryptic peptides are the search targets.
    peptides = ["ACDEFGHIK", "LMNPQSTVWYK", "GGEEDDNNR", "AAILVVFFK"]
    protein = "".join(peptides)
    fasta_path = tmp_path / "prot.fasta"
    fasta_path.write_text(f">sp|TEST|TEST test protein\n{protein}\n")

    out = str(tmp_path / "out.mztab")
    query_path = str(tmp_path / "queries.mgf")
    args = _base_args(str(fasta_path), query_path, out)
    # Parse config first so the FASTA reader sees charge/energy settings.
    config.parse(args)
    library = list(read_library_file(str(fasta_path), config))
    assert len(library) > 0
    by_peptide = {}
    for s in library:
        if s.peptide in peptides and not s.is_decoy:
            by_peptide.setdefault(s.peptide, s)
    assert len(by_peptide) >= 3  # digestion found the constituents

    rng = np.random.default_rng(93)
    queries = [
        noisy_query(s, rng, f"q_{p}")
        for p, s in sorted(by_peptide.items())
    ]
    write_mgf(queries, query_path)
    assert main(args) == 0
    ssms = read_mztab_ssms(out)
    assert len(ssms) == len(queries)
    correct = sum(
        str(qid) == f"q_{row['sequence']}" for qid, row in ssms.iterrows()
    )
    assert correct == len(queries)
