"""Native C++ splib parser parity with the Python parser."""

import numpy as np
import pytest

from ann_solo_tpu.io import splib_native
from ann_solo_tpu.io.splib import read_splib, write_splib

from synth import make_library


@pytest.mark.skipif(
    not splib_native.available(), reason="native toolchain unavailable"
)
def test_native_matches_python(tmp_path):
    rng = np.random.default_rng(31)
    _, spectra = make_library(rng, n_peptides=20)
    spectra[5].is_decoy = True
    spectra[11].is_decoy = True
    path = str(tmp_path / "lib.splib")
    write_splib(spectra, path)

    py_spectra = list(read_splib(path))
    native_spectra = list(splib_native.read_splib_native(path))
    assert len(native_spectra) == len(py_spectra)
    for py, nat in zip(py_spectra, native_spectra):
        assert nat.identifier == py.identifier
        assert nat.peptide == py.peptide
        assert nat.precursor_charge == py.precursor_charge
        assert nat.is_decoy == py.is_decoy
        np.testing.assert_allclose(
            nat.precursor_mz, py.precursor_mz, rtol=1e-12
        )
        np.testing.assert_allclose(nat.mz, py.mz, rtol=1e-6)
        np.testing.assert_allclose(nat.intensity, py.intensity, rtol=1e-6)
        np.testing.assert_array_equal(nat.ann_type, py.ann_type)
        np.testing.assert_array_equal(nat.ann_index, py.ann_index)
        np.testing.assert_array_equal(nat.ann_charge, py.ann_charge)
