"""Preprocessing pipeline tests against a NumPy oracle of the reference
semantics (ann_solo/spectrum.py:57-119)."""

import numpy as np
import pytest

from ann_solo_tpu.models.preprocess import (
    PreprocessParams,
    preprocess_batch,
)
from ann_solo_tpu.models.spectrum import Spectrum, pack_spectra


def oracle_process(
    mz, intensity, precursor_mz, precursor_charge, params: PreprocessParams
):
    """Reference-faithful scalar implementation (returns None if invalid)."""
    mz = np.asarray(mz, np.float64)
    intensity = np.asarray(intensity, np.float64)
    order = np.argsort(mz, kind="stable")
    mz, intensity = mz[order], intensity[order]

    def check(m):
        return (
            len(m) >= params.min_peaks
            and (m[-1] - m[0]) >= params.min_mz_range
        )

    mask = (mz >= params.min_mz) & (mz <= params.max_mz)
    mz, intensity = mz[mask], intensity[mask]
    if not check(mz):
        return None
    if params.remove_precursor:
        # spectrum_utils remove_precursor_peak(tol, "Da", isotope=2):
        # precursor fragments at every charge 1..precursor_charge.
        proton = 1.00727646677
        neutron = 1.00335483507
        neutral = (precursor_mz - proton) * precursor_charge
        keep = np.ones(len(mz), bool)
        for c in range(1, precursor_charge + 1):
            for iso in range(3):
                target = (neutral + iso * neutron) / c + proton
                keep &= (
                    np.abs(mz - target) > params.remove_precursor_tolerance
                )
        mz, intensity = mz[keep], intensity[keep]
        if not check(mz):
            return None
    # Intensity filter: relative noise floor + top-N.
    keep = intensity > params.min_intensity * intensity.max()
    mz, intensity = mz[keep], intensity[keep]
    rank = np.zeros(len(intensity), int)
    rank[np.argsort(-intensity, kind="stable")] = np.arange(len(intensity))
    keep = rank < params.max_peaks_used
    mz, intensity = mz[keep], intensity[keep]
    if not check(mz):
        return None
    if params.scaling in ("sqrt", "root"):
        intensity = np.sqrt(intensity)
    elif params.scaling == "rank":
        rank = np.zeros(len(intensity), int)
        rank[np.argsort(-intensity, kind="stable")] = np.arange(
            len(intensity)
        )
        intensity = (params.max_peaks_used - rank).astype(np.float64)
    intensity = intensity / np.linalg.norm(intensity)
    return mz, intensity


def _random_spectrum(rng, n_peaks=120, charge=2):
    mz = np.sort(rng.uniform(100.0, 1500.0, n_peaks))
    intensity = rng.uniform(0.001, 1.0, n_peaks)
    return Spectrum("q", 600.0, charge, mz, intensity)


@pytest.mark.parametrize("scaling", ["rank", "sqrt"])
def test_matches_oracle(scaling):
    rng = np.random.default_rng(7)
    params = PreprocessParams(scaling=scaling, max_peaks_used=50)
    spectra = [_random_spectrum(rng, n) for n in (120, 45, 300, 10, 80)]
    batch = pack_spectra(spectra)
    out = preprocess_batch(
        params, batch.mz, batch.intensity, batch.ann_charge, batch.n_peaks,
        batch.precursor_mz, batch.precursor_charge,
    )
    for i, s in enumerate(spectra):
        expected = oracle_process(
            s.mz, batch.intensity[i, : s.n_peaks], s.precursor_mz,
            s.precursor_charge, params,
        )
        if expected is None:
            assert not bool(out.is_valid[i])
            continue
        exp_mz, exp_int = expected
        n = int(out.n_peaks[i])
        assert bool(out.is_valid[i])
        assert n == len(exp_mz)
        np.testing.assert_allclose(
            np.asarray(out.mz[i, :n]), exp_mz, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out.intensity[i, :n]), exp_int, rtol=1e-5
        )
        # Padding lanes are zeroed.
        assert np.all(np.asarray(out.mz[i, n:]) == 0)
        assert np.all(np.asarray(out.intensity[i, n:]) == 0)


def test_quality_gates():
    params = PreprocessParams(min_peaks=10, min_mz_range=250.0)
    # Too few peaks.
    few = Spectrum("a", 500.0, 2, np.linspace(100, 900, 5),
                   np.ones(5))
    # Too narrow mass range.
    narrow = Spectrum("b", 500.0, 2, np.linspace(400, 500, 30),
                      np.ones(30))
    # Good spectrum.
    good = Spectrum("c", 500.0, 2, np.linspace(100, 900, 30),
                    np.linspace(1, 30, 30))
    batch = pack_spectra([few, narrow, good])
    out = preprocess_batch(
        params, batch.mz, batch.intensity, batch.ann_charge, batch.n_peaks,
        batch.precursor_mz, batch.precursor_charge,
    )
    assert list(np.asarray(out.is_valid)) == [False, False, True]


def test_remove_precursor():
    params = PreprocessParams(
        remove_precursor=True, remove_precursor_tolerance=0.5,
        min_peaks=5, min_mz_range=100.0,
    )
    mz = np.asarray([100.0, 200.0, 499.8, 500.2, 600.0, 700.0, 800.0])
    spec = Spectrum("a", 500.0, 1, mz, np.ones(len(mz)))
    batch = pack_spectra([spec])
    out = preprocess_batch(
        params, batch.mz, batch.intensity, batch.ann_charge, batch.n_peaks,
        batch.precursor_mz, batch.precursor_charge,
    )
    kept = np.asarray(out.mz[0, : int(out.n_peaks[0])])
    assert 499.8 not in kept and 500.2 not in kept
    assert int(out.n_peaks[0]) == 5


def test_remove_precursor_reduced_charges():
    # A charge-2 precursor at 500 m/z also has a singly-charged precursor
    # fragment at (500 - proton) * 2 + proton ~= 998.993; with
    # --remove_precursor both must go (ADVICE r1: only the precursor's own
    # charge was removed).
    proton = 1.00727646677
    params = PreprocessParams(
        remove_precursor=True, remove_precursor_tolerance=0.5,
        min_peaks=5, min_mz_range=100.0,
    )
    singly = (500.0 - proton) * 2 + proton
    mz = np.sort(np.asarray(
        [100.0, 200.0, 300.0, 500.2, singly + 0.1, 700.0, 800.0, 900.0]
    ))
    spec = Spectrum("a", 500.0, 2, mz, np.ones(len(mz)))
    batch = pack_spectra([spec])
    out = preprocess_batch(
        params, batch.mz, batch.intensity, batch.ann_charge, batch.n_peaks,
        batch.precursor_mz, batch.precursor_charge,
    )
    kept = np.asarray(out.mz[0, : int(out.n_peaks[0])])
    assert not np.any(np.abs(kept - 500.2) < 1e-3)
    assert not np.any(np.abs(kept - (singly + 0.1)) < 1e-3)
    assert int(out.n_peaks[0]) == 6


def test_top_n_and_noise_filter():
    params = PreprocessParams(
        min_peaks=2, min_mz_range=10.0, max_peaks_used=3,
        min_intensity=0.1, scaling=None,
    )
    mz = np.asarray([100.0, 200.0, 300.0, 400.0, 500.0])
    intensity = np.asarray([1.0, 0.05, 0.5, 0.3, 0.2])
    spec = Spectrum("a", 900.0, 2, mz, intensity)
    batch = pack_spectra([spec])
    out = preprocess_batch(
        params, batch.mz, batch.intensity, batch.ann_charge, batch.n_peaks,
        batch.precursor_mz, batch.precursor_charge,
    )
    n = int(out.n_peaks[0])
    kept_mz = np.asarray(out.mz[0, :n])
    # Noise peak (0.05 <= 0.1*1.0) dropped; top-3 of the rest by intensity.
    np.testing.assert_array_equal(kept_mz, [100.0, 300.0, 400.0])
    # L2 normalized.
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out.intensity[0])), 1.0, rtol=1e-6
    )
