"""Windowed (merge-join) scoring vs the dense kernels and the oracle."""

import numpy as np

from ann_solo_tpu.ops.shifted_dot import shifted_dot_scores
from ann_solo_tpu.ops.shifted_dot_windowed import windowed_greedy_scores

from test_shifted_dot import _pad, _random_pair


def _batch(rng, n_pairs, charge, mod_choices, k=30):
    pairs = [
        _random_pair(rng, k, charge, mod_mass=rng.choice(mod_choices))
        for _ in range(n_pairs)
    ]
    kp = 32
    return (
        _pad([p[0] for p in pairs], kp),
        _pad([p[1] for p in pairs], kp),
        _pad([p[2] for p in pairs], kp),
        _pad([p[3] for p in pairs], kp),
        _pad([p[4] for p in pairs], kp),
        np.asarray([p[5] for p in pairs], np.float32),
        np.asarray([p[6] for p in pairs], np.float32),
        np.full(n_pairs, charge, np.int32),
    )


def _check(allow_shift, charge, seed, mods, tol=0.02):
    rng = np.random.default_rng(seed)
    q_mz, q_int, c_mz, c_int, c_ann, q_prec, c_prec, charges = _batch(
        rng, 64, charge, mods
    )
    dense = np.asarray(
        shifted_dot_scores(
            q_mz, q_int, c_mz, c_int, c_ann, q_prec, c_prec, charges,
            np.ones(len(charges), bool), tol, charge + 1, allow_shift,
        )
    )
    total, overflow = windowed_greedy_scores(
        q_mz, q_int, c_mz, c_int, c_ann, q_prec, c_prec, charges,
        tol, charge + 1, allow_shift,
    )
    total = np.asarray(total)
    overflow = np.asarray(overflow)
    ok = ~overflow
    assert ok.mean() > 0.9, "windows should rarely overflow at W=4"
    np.testing.assert_allclose(
        total[ok], dense[ok], rtol=2e-5, atol=1e-6
    )


def test_windowed_matches_dense_no_shift():
    _check(False, 2, 3, [0.0])


def test_windowed_matches_dense_with_shifts():
    _check(True, 3, 7, [0.0, 16.0, 79.97])


def test_windowed_overflow_flags_dense_windows():
    """Many candidate peaks crammed inside one tolerance window must be
    flagged (the caller re-runs those pairs densely)."""
    rng = np.random.default_rng(13)
    k = 16
    q_mz = np.sort(rng.uniform(100, 1500, (4, k)).astype(np.float32), 1)
    # Candidate peaks all within one 0.5-wide window of query peak 3.
    c_mz = np.sort(
        (q_mz[:, 3:4] + rng.uniform(-0.2, 0.2, (4, k))).astype(np.float32),
        axis=1,
    )
    q_int = np.full((4, k), 0.25, np.float32)
    c_int = np.full((4, k), 0.25, np.float32)
    c_ann = np.zeros((4, k), np.int32)
    _, overflow = windowed_greedy_scores(
        q_mz, q_int, c_mz, c_int, c_ann,
        np.full(4, 800.0, np.float32), np.full(4, 800.0, np.float32),
        np.full(4, 2, np.int32), 0.5, 1, False,
    )
    assert np.asarray(overflow).all()


def test_windowed_padded_tail_lanes():
    """Zero-padded tail lanes must not misplace windows near the top of
    the m/z range (regression: pad value 0.0 < real m/z broke the
    searchsorted sorted precondition without setting overflow)."""
    rng = np.random.default_rng(11)
    q_mz, q_int, c_mz, c_int, c_ann, q_prec, c_prec, charges = _batch(
        rng, 64, 2, [0.0], k=30
    )
    # Re-pad candidates to twice the width: half of every row is 0.0 m/z
    # padding, and matches to the LAST real peaks must still be found.
    kp = c_mz.shape[1] * 2
    pad = kp - c_mz.shape[1]
    c_mz = np.pad(c_mz, ((0, 0), (0, pad)))
    c_int = np.pad(c_int, ((0, 0), (0, pad)))
    c_ann = np.pad(c_ann, ((0, 0), (0, pad)), constant_values=-1)
    q_mz = np.pad(q_mz, ((0, 0), (0, pad)))
    q_int = np.pad(q_int, ((0, 0), (0, pad)))
    tol = 0.02
    dense = np.asarray(
        shifted_dot_scores(
            q_mz, q_int, c_mz, c_int, c_ann, q_prec, c_prec, charges,
            np.ones(len(charges), bool), tol, 3, False,
        )
    )
    total, overflow = windowed_greedy_scores(
        q_mz, q_int, c_mz, c_int, c_ann, q_prec, c_prec, charges,
        tol, 3, False,
    )
    total, overflow = np.asarray(total), np.asarray(overflow)
    ok = ~overflow
    assert ok.mean() > 0.9
    np.testing.assert_allclose(total[ok], dense[ok], rtol=2e-5, atol=1e-6)
