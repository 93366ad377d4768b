"""I/O round-trip tests: mgf, splib, sptxt, mzML, mzXML, mzTab, store."""

import numpy as np
import pytest

from ann_solo_tpu.io import masses
from ann_solo_tpu.io.mgf import mgf_seq_to_proforma, read_mgf, write_mgf
from ann_solo_tpu.io.mzml import (
    read_mzml,
    read_mzxml,
    write_mzml,
    write_mzxml,
)
from ann_solo_tpu.io.splib import read_splib, read_sptxt, write_splib

from synth import make_library, noisy_query


@pytest.fixture
def library(request):
    rng = np.random.default_rng(17)
    peptides, spectra = make_library(rng, n_peptides=12)
    return peptides, spectra, rng


def test_mgf_roundtrip(tmp_path, library):
    peptides, spectra, rng = library
    queries = [
        noisy_query(s, rng, f"query_{i}") for i, s in enumerate(spectra)
    ]
    path = str(tmp_path / "queries.mgf")
    write_mgf(queries, path)
    back = list(read_mgf(path))
    assert len(back) == len(queries)
    for original, parsed in zip(queries, back):
        assert parsed.identifier == original.identifier
        assert parsed.precursor_charge == original.precursor_charge
        np.testing.assert_allclose(
            parsed.precursor_mz, original.precursor_mz, rtol=1e-9
        )
        np.testing.assert_allclose(parsed.mz, original.mz, rtol=1e-9)
        np.testing.assert_allclose(
            parsed.retention_time, original.retention_time, rtol=1e-9
        )


def test_splib_roundtrip(tmp_path, library):
    _, spectra, _ = library
    spectra[3].is_decoy = True
    path = str(tmp_path / "lib.splib")
    write_splib(spectra, path)
    back = list(read_splib(path))
    assert len(back) == len(spectra)
    for original, parsed in zip(spectra, back):
        assert parsed.identifier == original.identifier
        assert parsed.peptide == original.peptide
        assert parsed.precursor_charge == original.precursor_charge
        assert parsed.is_decoy == original.is_decoy
        np.testing.assert_allclose(
            parsed.precursor_mz, original.precursor_mz, rtol=1e-12
        )
        np.testing.assert_allclose(parsed.mz, original.mz, rtol=1e-6)
        np.testing.assert_array_equal(parsed.ann_type, original.ann_type)
        np.testing.assert_array_equal(
            parsed.ann_charge, original.ann_charge
        )


def test_sptxt(tmp_path):
    content = (
        "Name: PEPTIDEK/2\n"
        "LibID: 1\n"
        "MW: 1000.5\n"
        "PrecursorMZ: 450.7312\n"
        "Status: Normal\n"
        "FullName: X.PEPTIDEK.X/2\n"
        "Comment: Spec=Consensus Mods=1/3,T,Phospho Parent=450.7312\n"
        "NumPeaks: 4\n"
        "200.1\t55.2\tb2/0.002\n"
        "300.2\t99.9\ty3^2/0.001\n"
        "400.3\t12.0\t?\n"
        "500.4\t77.0\ty4/0.003\n"
        "\n"
        "Name: DECOY_OTHERR/3\n"
        "PrecursorMZ: 300.2\n"
        "Comment: DECOY Spec=Consensus\n"
        "NumPeaks: 2\n"
        "150.0\t10.0\tb1/0.001\n"
        "250.0\t20.0\ty2/0.001\n"
    )
    path = tmp_path / "lib.sptxt"
    path.write_text(content)
    spectra = list(read_sptxt(str(path)))
    assert len(spectra) == 2
    first = spectra[0]
    assert first.peptide == "PEPT[Phospho]IDEK"
    assert first.precursor_charge == 2
    assert first.precursor_mz == pytest.approx(450.7312)
    np.testing.assert_array_equal(first.ann_charge, [1, 2, 0, 1])
    assert not first.is_decoy
    assert spectra[1].is_decoy


def test_mzml_roundtrip(tmp_path, library):
    _, spectra, rng = library
    queries = [noisy_query(s, rng, str(i + 1)) for i, s in
               enumerate(spectra[:3])]
    queries[1].precursor_charge = None
    path = str(tmp_path / "queries.mzml")
    write_mzml(queries, path)
    back = list(read_mzml(path))
    assert len(back) == 3
    for original, parsed in zip(queries, back):
        assert parsed.precursor_charge == original.precursor_charge
        np.testing.assert_allclose(parsed.mz, original.mz, rtol=1e-12)
        np.testing.assert_allclose(
            parsed.intensity, original.intensity, rtol=1e-12
        )


def test_mzxml_roundtrip(tmp_path, library):
    _, spectra, rng = library
    queries = [noisy_query(s, rng, str(i + 1)) for i, s in
               enumerate(spectra[:3])]
    path = str(tmp_path / "queries.mzxml")
    write_mzxml(queries, path)
    back = list(read_mzxml(path))
    assert len(back) == 3
    for original, parsed in zip(queries, back):
        np.testing.assert_allclose(parsed.mz, original.mz, rtol=1e-12)
        assert parsed.precursor_charge == original.precursor_charge


def test_mgf_seq_to_proforma():
    assert mgf_seq_to_proforma("PEPTIDEK") == "PEPTIDEK"
    assert (
        mgf_seq_to_proforma("PEPM+15.995TIDEK") == "PEPM[+15.995]TIDEK"
    )
    assert mgf_seq_to_proforma("+42.011PEPTIDEK") == "[+42.011]-PEPTIDEK"


def test_masses():
    # Known monoisotopic mass: PEPTIDE = 799.35997.
    assert masses.peptide_mass("PEPTIDE") == pytest.approx(
        799.35997, abs=1e-4
    )
    proteoform = masses.parse_proforma("PEPM[+15.994915]TIDEK")
    assert proteoform.sequence == "PEPMTIDEK"
    assert proteoform.mods == {3: pytest.approx(15.994915)}
    # b2 of PEPTIDE: P+E + proton.
    frags = masses.theoretical_fragments(
        masses.parse_proforma("PEPTIDE"), "by", 1
    )
    assert frags["b2^1"] == pytest.approx(227.10263, abs=1e-4)
    assert frags["y1^1"] == pytest.approx(148.06044, abs=1e-4)


def test_cleave():
    peptides = masses.cleave(
        "MKWVTFISLLLLFSSAYSRGVFRRDTHKSEIAHRFK", "trypsin", 0,
        min_length=4, max_length=30,
    )
    assert "WVTFISLLLLFSSAYSR" in peptides
    for peptide in peptides:
        # Internal K/R only allowed before P (none here with 0 missed).
        assert not any(
            aa in "KR" for aa in peptide[:-1]
        ) or "P" in peptide
