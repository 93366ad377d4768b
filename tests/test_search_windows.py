"""Precursor-window candidate ranges vs the reference's dense-mask filter
(spectral_library.py:417-429)."""

import numpy as np

from ann_solo_tpu.search import precursor_window_bounds


def _dense_mask(query_mz, charge, lib_mz, tol_val, tol_mode):
    q = query_mz[:, None]
    l = lib_mz[None, :]
    if tol_mode == "Da":
        return np.abs(q - l) * charge <= tol_val
    return np.abs(q - l) / l * 10**6 <= tol_val


def test_window_bounds_match_dense_mask():
    rng = np.random.default_rng(9)
    lib_mz = np.sort(rng.uniform(300, 1500, 500))
    query_mz = rng.uniform(300, 1500, 64)
    for tol_val, tol_mode in [(0.1, "Da"), (2.5, "Da"), (20.0, "ppm"),
                              (500.0, "Da")]:
        lo, hi = precursor_window_bounds(
            query_mz, 2, lib_mz, tol_val, tol_mode
        )
        dense = _dense_mask(query_mz, 2, lib_mz, tol_val, tol_mode)
        for i in range(len(query_mz)):
            expected = np.nonzero(dense[i])[0]
            got = np.arange(lo[i], hi[i])
            np.testing.assert_array_equal(got, expected, err_msg=(
                f"tol={tol_val}{tol_mode} query={query_mz[i]}"
            ))


def test_window_empty_when_out_of_range():
    lib_mz = np.asarray([500.0, 600.0, 700.0])
    lo, hi = precursor_window_bounds(
        np.asarray([100.0]), 2, lib_mz, 0.1, "Da"
    )
    assert lo[0] == hi[0]
