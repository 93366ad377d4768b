"""Pallas shifted-dot kernel (interpret mode) vs the XLA path and oracle."""

import numpy as np
import pytest

from ann_solo_tpu.ops.shifted_dot import (
    shifted_dot_best_match,
    shifted_dot_scores,
)
from ann_solo_tpu.ops.shifted_dot_pallas import (
    PAIR_BLOCK,
    shifted_dot_pallas_full,
    shifted_dot_scores_pallas,
)

from test_shifted_dot import _pad, _random_pair


@pytest.mark.parametrize("allow_shift", [False, True])
def test_pallas_matches_xla(allow_shift):
    rng = np.random.default_rng(19)
    charge = 3
    pairs = [
        _random_pair(rng, 30, charge, mod_mass=rng.choice([0.0, 16.0]))
        for _ in range(PAIR_BLOCK)
    ]
    k = 32
    q_mz = _pad([p[0] for p in pairs], k)
    q_int = _pad([p[1] for p in pairs], k)
    c_mz = _pad([p[2] for p in pairs], k)
    c_int = _pad([p[3] for p in pairs], k)
    c_ann = _pad([p[4] for p in pairs], k)
    q_prec = np.asarray([p[5] for p in pairs], np.float32)
    c_prec = np.asarray([p[6] for p in pairs], np.float32)
    charges = np.full(len(pairs), charge, np.int32)
    tol = 0.02

    expected = np.asarray(
        shifted_dot_scores(
            q_mz, q_int, c_mz, c_int, c_ann, q_prec, c_prec, charges,
            np.ones(len(pairs), bool), tol, charge + 1, allow_shift,
        )
    )
    got = np.asarray(
        shifted_dot_scores_pallas(
            q_mz, q_int, c_mz, c_int, c_ann, q_prec, c_prec, charges,
            tol, charge + 1, allow_shift, interpret=True,
        )
    )
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=1e-6)


def test_pallas_unequal_peak_widths():
    """Query and library max_peaks may differ (e.g. --max_peaks_used 24
    vs --max_peaks_used_library 32); the dispatcher pads both sides to a
    common width before the kernel (regression: round-2 review found the
    padded widths could mismatch the kernel BlockSpecs)."""
    rng = np.random.default_rng(37)
    charge = 2
    pairs = [_random_pair(rng, 24, charge) for _ in range(PAIR_BLOCK)]
    kq, kc = 24, 32  # different widths
    q_mz = _pad([p[0] for p in pairs], kq)
    q_int = _pad([p[1] for p in pairs], kq)
    c_mz = _pad([p[2] for p in pairs], kc)
    c_int = _pad([p[3] for p in pairs], kc)
    c_ann = _pad([p[4] for p in pairs], kc)
    q_prec = np.asarray([p[5] for p in pairs], np.float32)
    c_prec = np.asarray([p[6] for p in pairs], np.float32)
    charges = np.full(len(pairs), charge, np.int32)
    # Pad to a common width exactly like shifted_dot_best_match_auto.
    kk = max(kq, kc)
    qm = np.pad(q_mz, [(0, 0), (0, kk - kq)])
    qi = np.pad(q_int, [(0, 0), (0, kk - kq)])
    total, match = shifted_dot_pallas_full(
        qm, qi, c_mz, c_int, c_ann, q_prec, c_prec, charges,
        0.02, 1, False, interpret=True,
    )
    expected = np.asarray(
        shifted_dot_scores(
            qm, qi, c_mz, c_int, c_ann, q_prec, c_prec, charges,
            np.ones(len(pairs), bool), 0.02, 1, False,
        )
    )
    np.testing.assert_allclose(
        np.asarray(total), expected, rtol=2e-5, atol=1e-6
    )


def test_pallas_in_kernel_match_extraction():
    """The kernel's (P, K) match output must encode the same peak-match
    set as the XLA greedy (SpectrumMatch.cpp full return contract)."""
    rng = np.random.default_rng(29)
    charge = 2
    pairs = [
        _random_pair(rng, 30, charge, mod_mass=rng.choice([0.0, 16.0]))
        for _ in range(PAIR_BLOCK)
    ]
    k = 32
    q_mz = _pad([p[0] for p in pairs], k)
    q_int = _pad([p[1] for p in pairs], k)
    c_mz = _pad([p[2] for p in pairs], k)
    c_int = _pad([p[3] for p in pairs], k)
    c_ann = _pad([p[4] for p in pairs], k)
    q_prec = np.asarray([p[5] for p in pairs], np.float32)
    c_prec = np.asarray([p[6] for p in pairs], np.float32)
    charges = np.full(len(pairs), charge, np.int32)
    tol = 0.02

    total, match = shifted_dot_pallas_full(
        q_mz, q_int, c_mz, c_int, c_ann, q_prec, c_prec, charges,
        tol, charge + 1, True, interpret=True,
    )
    total = np.asarray(total)
    match = np.asarray(match)
    exp_total, exp_q, exp_c = shifted_dot_best_match(
        q_mz, q_int, c_mz, c_int, c_ann, q_prec, c_prec, charges,
        tol, charge + 1, True,
    )
    np.testing.assert_allclose(
        total, np.asarray(exp_total), rtol=2e-5, atol=1e-6
    )
    exp_q, exp_c = np.asarray(exp_q), np.asarray(exp_c)
    for p in range(PAIR_BLOCK):
        got_set = {
            (i, int(match[p, i]))
            for i in range(k) if match[p, i] >= 0
        }
        exp_set = {
            (int(a), int(b))
            for a, b in zip(exp_q[p], exp_c[p]) if a >= 0
        }
        assert got_set == exp_set, f"pair {p}"
