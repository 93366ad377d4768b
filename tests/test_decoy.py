"""Decoy generation tests (reference: decoy_generator_test.py)."""

import unittest.mock

import numpy as np
import pytest

from ann_solo_tpu import decoy
from ann_solo_tpu.io import masses
from synth import peptide_spectrum


@pytest.fixture(autouse=True)
def _config():
    with unittest.mock.patch(
        "ann_solo_tpu.config.config._namespace",
        {"fragment_mz_tolerance": 0.02, "fragment_tol_mode": "Da"},
    ):
        yield


def test_shuffle_keeps_tryptic_residues():
    np.random.seed(3)
    peptide = "ALSPKCDEFGHR"
    shuffled, mapping = decoy._shuffle(peptide)
    # Same residue multiset, different order.
    assert sorted(shuffled) == sorted(peptide)
    assert shuffled != peptide
    # K, R, P and the final residue stay fixed.
    assert shuffled[4] == "K"
    assert shuffled[3] == "P"
    assert shuffled[-1] == "R"
    # Mapping is a permutation old->new.
    assert sorted(mapping.keys()) == list(range(len(peptide)))
    assert sorted(mapping.values()) == list(range(len(peptide)))


def test_shuffle_and_reposition():
    rng = np.random.default_rng(9)
    np.random.seed(11)
    peptide = "ALSYCDEFGHTNR"
    spectrum = peptide_spectrum(peptide, 2, "1", rng)
    decoy_spectrum = decoy.shuffle_and_reposition(spectrum)

    assert decoy_spectrum.is_decoy
    assert decoy_spectrum.identifier == "DECOY_1"
    assert decoy_spectrum.precursor_mz == spectrum.precursor_mz
    assert decoy_spectrum.precursor_charge == spectrum.precursor_charge
    assert decoy_spectrum.n_peaks == spectrum.n_peaks
    # Same residues, different sequence.
    decoy_seq = masses.parse_proforma(decoy_spectrum.peptide).sequence
    assert sorted(decoy_seq) == sorted(peptide)
    assert decoy_seq != peptide
    # Intensities preserved (multiset), m/z repositioned but sorted.
    np.testing.assert_allclose(
        np.sort(decoy_spectrum.intensity), np.sort(spectrum.intensity)
    )
    assert (np.diff(decoy_spectrum.mz) >= 0).all()
    # Repositioned peaks sit at the decoy's theoretical fragment m/z
    # (mass error is zero here because synth peaks are exact).
    decoy_frags = masses.theoretical_fragments(
        masses.parse_proforma(decoy_spectrum.peptide), "abpy", 2,
        neutral_losses=True,
    )
    frag_mzs = np.asarray(sorted(decoy_frags.values()))
    matched = 0
    for mz in decoy_spectrum.mz:
        if np.min(np.abs(frag_mzs - mz)) < 1e-6:
            matched += 1
    assert matched >= 0.9 * decoy_spectrum.n_peaks


def test_shuffle_and_reposition_with_modification():
    rng = np.random.default_rng(5)
    np.random.seed(7)
    peptide = "ALSYCDEM[+15.994915]FGHTNR"
    spectrum = peptide_spectrum(peptide, 2, "2", rng)
    decoy_spectrum = decoy.shuffle_and_reposition(spectrum)
    decoy_form = masses.parse_proforma(decoy_spectrum.peptide)
    # The modification is carried to the shuffled M position.
    assert len(decoy_form.mods) == 1
    (pos, mass), = decoy_form.mods.items()
    assert decoy_form.sequence[pos] == "M"
    assert mass == pytest.approx(15.994915)
    # Total precursor mass is conserved.
    assert decoy_form.mass == pytest.approx(
        masses.parse_proforma(peptide).mass, abs=1e-6
    )


def test_decoy_requires_peptide():
    from ann_solo_tpu.models.spectrum import Spectrum

    spectrum = Spectrum("1", 500.0, 2, np.asarray([100.0, 200.0]),
                        np.asarray([1.0, 1.0]))
    with pytest.raises(ValueError):
        decoy.shuffle_and_reposition(spectrum)
