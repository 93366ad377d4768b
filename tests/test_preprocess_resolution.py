"""Resolution rounding with duplicate-peak merging
(reference spectrum.py:84-89 / spectrum_utils round('sum'))."""

import numpy as np

from ann_solo_tpu.models.preprocess import (
    PreprocessParams,
    preprocess_batch,
)
from ann_solo_tpu.models.spectrum import Spectrum, pack_spectra


def test_resolution_rounding_merges_peaks():
    params = PreprocessParams(
        min_peaks=2, min_mz_range=50.0, resolution=1,
        min_intensity=0.0, max_peaks_used=10, scaling=None,
    )
    # 100.04 and 100.11 round to 100.0 and 100.1; 200.31 / 200.33 / 200.28
    # all round to 200.3 and merge by intensity sum.
    mz = np.asarray([100.04, 100.11, 200.28, 200.31, 200.33, 300.0])
    intensity = np.asarray([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    spec = Spectrum("a", 500.0, 2, mz, intensity)
    batch = pack_spectra([spec])
    out = preprocess_batch(
        params, batch.mz, batch.intensity, batch.ann_charge,
        batch.n_peaks, batch.precursor_mz, batch.precursor_charge,
    )
    n = int(out.n_peaks[0])
    got_mz = np.asarray(out.mz[0, :n])
    got_int = np.asarray(out.intensity[0, :n])
    np.testing.assert_allclose(got_mz, [100.0, 100.1, 200.3, 300.0],
                               atol=1e-4)
    expected = np.asarray([1.0, 2.0, 12.0, 6.0])
    np.testing.assert_allclose(
        got_int, expected / np.linalg.norm(expected), rtol=1e-5
    )
