"""Shifted-dot-product kernel vs the C++-faithful NumPy oracle."""

import numpy as np

from ann_solo_tpu.ops.shifted_dot import (
    greedy_assignment,
    pair_score_matrix,
    shifted_dot_best_match,
    shifted_dot_oracle,
    shifted_dot_scores,
)


def _random_pair(rng, k=30, charge=2, mod_mass=0.0):
    q_mz = np.sort(rng.uniform(100, 1500, k)).astype(np.float32)
    q_int = rng.uniform(0.05, 1.0, k).astype(np.float32)
    q_int /= np.linalg.norm(q_int)
    c_mz = np.sort(rng.uniform(100, 1500, k)).astype(np.float32)
    # Make some candidate peaks match query peaks directly or shifted.
    c_mz[:10] = q_mz[:10] + rng.uniform(-0.01, 0.01, 10).astype(np.float32)
    if mod_mass:
        c_mz[10:18] = (
            q_mz[10:18]
            - np.float32(mod_mass) / rng.integers(1, charge + 1, 8)
        ).astype(np.float32)
    c_mz = np.sort(c_mz)
    c_int = rng.uniform(0.05, 1.0, k).astype(np.float32)
    c_int /= np.linalg.norm(c_int)
    c_ann = rng.integers(0, charge + 1, k).astype(np.int32)
    q_prec = 800.0
    c_prec = q_prec - mod_mass / charge
    return q_mz, q_int, c_mz, c_int, c_ann, q_prec, c_prec


def _pad(arr, k):
    out = np.zeros((len(arr), k), arr[0].dtype)
    for i, a in enumerate(arr):
        out[i, : len(a)] = a
    return out


def test_matches_oracle_no_shift():
    rng = np.random.default_rng(11)
    charge = 2
    pairs = [_random_pair(rng, 30, charge, 0.0) for _ in range(16)]
    _check_batch(pairs, charge, allow_shift=False)


def test_matches_oracle_with_shift():
    rng = np.random.default_rng(13)
    charge = 3
    pairs = [
        _random_pair(rng, 30, charge, mod_mass=rng.choice([0.0, 16.0, 79.97]))
        for _ in range(16)
    ]
    _check_batch(pairs, charge, allow_shift=True)


def _check_batch(pairs, charge, allow_shift, tol=0.02):
    k = 32
    q_mz = _pad([p[0] for p in pairs], k)
    q_int = _pad([p[1] for p in pairs], k)
    c_mz = _pad([p[2] for p in pairs], k)
    c_int = _pad([p[3] for p in pairs], k)
    c_ann = _pad([p[4] for p in pairs], k)
    q_prec = np.asarray([p[5] for p in pairs], np.float32)
    c_prec = np.asarray([p[6] for p in pairs], np.float32)
    charges = np.full(len(pairs), charge, np.int32)
    valid = np.ones(len(pairs), bool)
    scores = np.asarray(
        shifted_dot_scores(
            q_mz, q_int, c_mz, c_int, c_ann, q_prec, c_prec, charges,
            valid, tol, charge + 1, allow_shift,
        )
    )
    total, match_q, match_c = shifted_dot_best_match(
        q_mz, q_int, c_mz, c_int, c_ann, q_prec, c_prec, charges,
        tol, charge + 1, allow_shift,
    )
    for p, pair in enumerate(pairs):
        # Oracle works in float32 inputs to share tie behavior.
        exp_score, exp_matches = shifted_dot_oracle(
            pair[0], pair[1], pair[2], pair[3], pair[4],
            np.float32(pair[5]), np.float32(pair[6]), charge, tol,
            allow_shift,
        )
        np.testing.assert_allclose(scores[p], exp_score, rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(
            float(total[p]), exp_score, rtol=2e-5, atol=1e-6
        )
        got = {
            (int(i), int(j))
            for i, j in zip(np.asarray(match_q[p]), np.asarray(match_c[p]))
            if i >= 0
        }
        assert got == set(exp_matches)


def test_annotation_multipliers():
    # One query peak at 100; candidate peak shifted by the precursor mass
    # difference; annotation charge decides the multiplier
    # (SpectrumMatch.cpp:57-83).
    tol = 0.02
    charge = 2
    mod = 10.0
    q_prec, c_prec = 500.0, 500.0 - mod / charge
    prec_diff = (q_prec - c_prec) * charge  # = mod
    for ann, expected_mult in [(1, 1.0), (0, 2.0 / 3.0), (2, 0.0)]:
        q_mz = np.asarray([[100.0]], np.float32)
        q_int = np.asarray([[0.5]], np.float32)
        c_mz = np.asarray([[100.0 - prec_diff / 1]], np.float32)
        c_int = np.asarray([[0.8]], np.float32)
        c_ann = np.asarray([[ann]], np.int32)
        score = float(
            shifted_dot_scores(
                q_mz, q_int, c_mz, c_int, c_ann,
                np.asarray([q_prec], np.float32),
                np.asarray([c_prec], np.float32),
                np.asarray([charge], np.int32),
                np.asarray([True]),
                tol, charge + 1, True,
            )[0]
        )
        np.testing.assert_allclose(
            score, expected_mult * 0.5 * 0.8, rtol=1e-6, atol=1e-9
        )


def test_one_to_one_assignment():
    # Two query peaks both within tolerance of one candidate peak: only the
    # higher intensity product is kept.
    tol = 0.5
    q_mz = np.asarray([[100.0, 100.4]], np.float32)
    q_int = np.asarray([[0.3, 0.9]], np.float32)
    c_mz = np.asarray([[100.2, 0.0]], np.float32)
    c_int = np.asarray([[1.0, 0.0]], np.float32)
    c_ann = np.zeros((1, 2), np.int32)
    score = float(
        shifted_dot_scores(
            q_mz, q_int, c_mz, c_int, c_ann,
            np.asarray([500.0], np.float32),
            np.asarray([500.0], np.float32),
            np.asarray([2], np.int32),
            np.asarray([True]),
            tol, 1, False,
        )[0]
    )
    np.testing.assert_allclose(score, 0.9 * 1.0, rtol=1e-6)


def test_greedy_blocking_chain():
    # Greedy (not optimal) assignment: the top entry blocks a row/column even
    # when a different assignment would score higher in total.
    scores = np.zeros((1, 2, 2), np.float32)
    scores[0] = [[1.0, 0.9], [0.9, 0.0]]
    total = float(greedy_assignment(scores)[0])
    # Greedy picks (0,0)=1.0, blocking both 0.9 entries.
    np.testing.assert_allclose(total, 1.0, rtol=1e-6)


def test_dense_pair_exceeds_old_entry_cap():
    # Adversarially dense pair: a huge tolerance puts ALL k*k = 2500
    # entries in-tolerance (far beyond the former 160-entry cap), so the
    # greedy pass must walk deep through blocked entries.  The uncapped
    # iterative-argmax formulation must match the uncapped oracle exactly.
    rng = np.random.default_rng(17)
    k = 50
    q_mz = np.sort(rng.uniform(100, 1500, k)).astype(np.float32)
    c_mz = np.sort(rng.uniform(100, 1500, k)).astype(np.float32)
    q_int = rng.uniform(0.05, 1.0, k).astype(np.float32)
    c_int = rng.uniform(0.05, 1.0, k).astype(np.float32)
    q_int /= np.linalg.norm(q_int)
    c_int /= np.linalg.norm(c_int)
    c_ann = rng.integers(0, 3, k).astype(np.int32)
    tol = 2000.0  # everything matches
    charge = 2
    exp_score, exp_matches = shifted_dot_oracle(
        q_mz, q_int, c_mz, c_int, c_ann,
        np.float32(800.0), np.float32(799.0), charge, tol, True,
    )
    assert len(exp_matches) == k  # fully dense: every peak assigned
    total, match_q, match_c = shifted_dot_best_match(
        q_mz[None], q_int[None], c_mz[None], c_int[None], c_ann[None],
        np.asarray([800.0], np.float32), np.asarray([799.0], np.float32),
        np.asarray([charge], np.int32), tol, charge + 1, True,
    )
    np.testing.assert_allclose(float(total[0]), exp_score, rtol=2e-5)
    got = {
        (int(i), int(j))
        for i, j in zip(np.asarray(match_q[0]), np.asarray(match_c[0]))
        if i >= 0
    }
    assert got == set(exp_matches)


def test_invalid_pairs_get_neg_inf():
    q = np.zeros((2, 4), np.float32)
    scores = np.asarray(
        shifted_dot_scores(
            q, q, q, q, q.astype(np.int32),
            np.zeros(2, np.float32), np.zeros(2, np.float32),
            np.ones(2, np.int32), np.asarray([True, False]),
            0.02, 1, False,
        )
    )
    assert scores[0] == 0.0 and scores[1] == -np.inf
