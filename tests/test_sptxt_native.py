"""Native C++ .sptxt parser vs the pure-Python reader (parity oracle)."""

import numpy as np
import pytest

from ann_solo_tpu.io import sptxt_native
from ann_solo_tpu.io.splib import read_sptxt, write_splib

pytestmark = pytest.mark.skipif(
    not sptxt_native.available(), reason="native toolchain unavailable"
)

_FIXTURE = (
    "Name: PEPTIDEK/2\n"
    "LibID: 1\n"
    "MW: 1000.5\n"
    "PrecursorMZ: 450.7312\n"
    "Status: Normal\n"
    "FullName: X.PEPTIDEK.X/2\n"
    "Comment: Spec=Consensus Mods=1/3,T,Phospho Parent=450.0000\n"
    "NumPeaks: 4\n"
    "200.1\t55.2\tb2/0.002\n"
    "300.2\t99.9\ty3^2/0.001\n"
    "400.3\t12.0\t?\n"
    "500.4\t77.0\ty4/0.003\n"
    "\n"
    "Name: DECOY_OTHERR/3\n"
    "Parent= 300.2\n"
    "Comment: Spec=Consensus\n"
    "Num Peaks: 2\n"
    "150.0\t10.0\tb1/0.001\n"
    "250.0\t20.0\ta2^3/0.001\n"
)


def _compare(filename):
    native = list(sptxt_native.read_sptxt_native(filename))
    python = list(read_sptxt(filename))
    assert len(native) == len(python)
    for a, b in zip(native, python):
        assert a.identifier == b.identifier
        assert a.peptide == b.peptide
        assert a.precursor_charge == b.precursor_charge
        assert a.precursor_mz == pytest.approx(b.precursor_mz, abs=1e-12)
        assert a.is_decoy == b.is_decoy
        np.testing.assert_array_equal(a.mz, b.mz)
        np.testing.assert_array_equal(a.intensity, b.intensity)
        np.testing.assert_array_equal(a.ann_type, b.ann_type)
        np.testing.assert_array_equal(a.ann_index, b.ann_index)
        np.testing.assert_array_equal(a.ann_charge, b.ann_charge)


def test_fixture_parity_and_semantics(tmp_path):
    path = tmp_path / "lib.sptxt"
    path.write_text(_FIXTURE)
    _compare(str(path))
    native = list(sptxt_native.read_sptxt_native(str(path)))
    first, second = native
    assert first.peptide == "PEPT[Phospho]IDEK"  # Mods -> ProForma
    # PrecursorMZ: beats the Comment's Parent= value.
    assert first.precursor_mz == pytest.approx(450.7312)
    np.testing.assert_array_equal(first.ann_charge, [1, 2, 0, 1])
    assert not first.is_decoy
    # Decoy marked only via the DECOY_ name; Parent= fallback; "Num
    # Peaks:" spelling with a space.
    assert second.is_decoy
    assert second.precursor_mz == pytest.approx(300.2)
    np.testing.assert_array_equal(second.ann_type, [2, 1])  # b, a ions
    np.testing.assert_array_equal(second.ann_charge, [1, 3])


def test_synthetic_library_parity(tmp_path):
    """A larger synthetic library through the sptxt writer round-trip."""
    import sys

    sys.path.insert(0, "tests")
    from synth import make_library

    from ann_solo_tpu.io.splib import write_sptxt

    rng = np.random.default_rng(97)
    _, spectra = make_library(rng, n_peptides=40)
    path = str(tmp_path / "lib.sptxt")
    write_sptxt(spectra, path)
    _compare(path)


def test_write_sptxt_mods_roundtrip(tmp_path):
    """ProForma-modified peptides survive the write -> read round trip
    (Mods= inversion) in both parsers."""
    from ann_solo_tpu.io.splib import write_sptxt
    from ann_solo_tpu.models.spectrum import Spectrum

    spectrum = Spectrum(
        identifier="1",
        precursor_mz=450.7312,
        precursor_charge=2,
        mz=np.asarray([200.1, 300.2]),
        intensity=np.asarray([55.2, 99.9]),
        peptide="PEPT[Phospho]IDE[-18.011]K",
    )
    path = str(tmp_path / "mods.sptxt")
    write_sptxt([spectrum], path)
    _compare(path)
    back = list(sptxt_native.read_sptxt_native(path))
    assert back[0].peptide == "PEPT[Phospho]IDE[-18.011]K"


def test_empty_sptxt(tmp_path):
    path = tmp_path / "empty.sptxt"
    path.write_text("")
    assert list(sptxt_native.read_sptxt_native(str(path))) == []
