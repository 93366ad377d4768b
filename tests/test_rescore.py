"""Fused rescoring (upper bound + certificate) vs exhaustive greedy."""

import numpy as np
import jax.numpy as jnp

from ann_solo_tpu.ops.rescore import rescore_candidate_matrix
from ann_solo_tpu.ops.shifted_dot import shifted_dot_scores


def _spectra(rng, n, k=24, conflict=False):
    mz = np.sort(rng.uniform(100, 1500, (n, k)).astype(np.float32), axis=1)
    if conflict:
        # Clusters of near-identical m/z force one-to-one conflicts.
        mz[:, 1::3] = mz[:, 0::3][:, : mz[:, 1::3].shape[1]] + rng.uniform(
            0, 0.015, mz[:, 1::3].shape
        ).astype(np.float32)
        mz = np.sort(mz, axis=1)
    intensity = rng.uniform(0.05, 1.0, (n, k)).astype(np.float32)
    intensity /= np.linalg.norm(intensity, axis=1, keepdims=True)
    ann = rng.integers(0, 3, (n, k)).astype(np.int32)
    prec = rng.uniform(400, 1200, n).astype(np.float32)
    return mz, intensity, ann, prec


def _reference_best(q, lib, cand, frag_tol, num_shifts, allow_shift):
    """Exhaustive greedy over every (query, candidate) pair."""
    q_mz, q_int, _, q_prec = q
    l_mz, l_int, l_ann, l_prec = lib
    b, c = cand.shape
    best_idx = np.full(b, -1, np.int64)
    best_score = np.full(b, -np.inf)
    for i in range(b):
        ids = cand[i][cand[i] >= 0]
        if len(ids) == 0:
            continue
        scores = np.asarray(
            shifted_dot_scores(
                np.repeat(q_mz[i][None], len(ids), 0),
                np.repeat(q_int[i][None], len(ids), 0),
                l_mz[ids], l_int[ids], l_ann[ids],
                np.repeat(q_prec[i], len(ids)),
                l_prec[ids],
                np.full(len(ids), num_shifts - 1 if allow_shift else 1,
                        np.int32),
                np.ones(len(ids), bool),
                frag_tol, num_shifts, allow_shift,
            )
        )
        j = int(np.argmax(scores))
        best_idx[i] = ids[j]
        best_score[i] = scores[j]
    return best_idx, best_score


def _check(conflict, seed, top_t=4):
    rng = np.random.default_rng(seed)
    b, n_lib, c = 24, 200, 16
    q_mz, q_int, _, q_prec = _spectra(rng, b, conflict=conflict)
    lib = _spectra(rng, n_lib, conflict=conflict)
    l_mz, l_int, l_ann, l_prec = lib
    # Candidates: random rows plus a "true match" (same spectrum noised).
    cand = rng.integers(0, n_lib, (b, c)).astype(np.int32)
    cand[rng.random((b, c)) < 0.1] = -1
    for i in range(b):
        row = i % n_lib
        l_mz[row] = q_mz[i] + rng.normal(0, 0.004, q_mz[i].shape).astype(
            np.float32
        )
        l_prec[row] = q_prec[i]
        cand[i, rng.integers(0, c)] = row
    frag_tol, num_shifts, allow_shift = 0.02, 3, True
    got_idx, got_score, got_n = rescore_candidate_matrix(
        jnp.asarray(q_mz), jnp.asarray(q_int), jnp.asarray(q_prec),
        jnp.asarray(l_mz), jnp.asarray(l_int), jnp.asarray(l_ann),
        jnp.asarray(l_prec),
        jnp.asarray(cand), frag_tol, num_shifts, allow_shift,
        use_pallas=False, top_t=top_t,
    )
    exp_idx, exp_score = _reference_best(
        (q_mz, q_int, None, q_prec), lib, cand, frag_tol, num_shifts,
        allow_shift,
    )
    np.testing.assert_allclose(got_score, exp_score, rtol=1e-5, atol=1e-6)
    # Index can differ only on exact score ties.
    differs = got_idx != exp_idx
    assert not differs.any() or np.allclose(
        got_score[differs], exp_score[differs]
    )
    np.testing.assert_array_equal(
        got_n, (cand >= 0).sum(axis=1)
    )


def test_rescore_matrix_sparse_matches():
    _check(conflict=False, seed=5)


def test_rescore_matrix_conflicted_matches():
    # Dense near-duplicate peaks force greedy conflicts + certificate use.
    _check(conflict=True, seed=7)


def test_rescore_matrix_tiny_top_t_still_exact():
    # top_t=1 forces the certificate/escalation path to do the work.
    _check(conflict=True, seed=11, top_t=1)


def test_rescore_ladder_escalation_exact():
    """Force tier-1 (t0) certificate failures so the escalation ladder
    (t0 -> top_t -> full C) actually runs, and pin exactness.

    Bound-inflating candidates: all query peaks sit within 2*tol of
    each other, and each candidate has ONE strong peak in that window
    -- the row-max-sum bound counts that peak once per query row
    (k * q * c) while the one-to-one greedy can take it once (q * c),
    so the t0-th bound exceeds every winner score and the certificate
    must fail down the ladder."""
    rng = np.random.default_rng(13)
    b, n_lib, c, k = 8, 128, 64, 8
    base = rng.uniform(400, 800, b).astype(np.float32)
    q_mz = np.sort(
        base[:, None] + rng.uniform(0, 0.03, (b, k)).astype(np.float32),
        axis=1,
    )
    q_int = np.full((b, k), 1.0 / np.sqrt(k), np.float32)
    q_prec = rng.uniform(400, 1200, b).astype(np.float32)
    # Library: every spectrum has one strong peak near SOME query's
    # cluster plus weak far-away peaks.
    l_mz = np.sort(
        rng.uniform(100, 1500, (n_lib, k)).astype(np.float32), axis=1
    )
    owners = rng.integers(0, b, n_lib)
    strengths = rng.uniform(0.5, 1.0, n_lib).astype(np.float32)
    for j in range(n_lib):
        l_mz[j, k // 2] = base[owners[j]] + 0.015
    l_mz = np.sort(l_mz, axis=1)
    l_int = np.full((n_lib, k), 0.1, np.float32)
    for j in range(n_lib):
        pos = int(np.argmin(np.abs(l_mz[j] - (base[owners[j]] + 0.015))))
        l_int[j, pos] = strengths[j]
    l_int /= np.linalg.norm(l_int, axis=1, keepdims=True)
    l_ann = np.zeros((n_lib, k), np.int32)
    l_prec = q_prec[owners] + rng.uniform(-200, 200, n_lib).astype(
        np.float32
    )
    cand = np.stack([
        rng.permutation(np.nonzero(owners == i % b)[0])[:c]
        if (owners == i % b).sum() >= c
        else rng.integers(0, n_lib, c)
        for i in range(b)
    ]).astype(np.int32)
    frag_tol, num_shifts, allow_shift = 0.02, 3, True
    got_idx, got_score, _ = rescore_candidate_matrix(
        jnp.asarray(q_mz), jnp.asarray(q_int), jnp.asarray(q_prec),
        jnp.asarray(l_mz), jnp.asarray(l_int), jnp.asarray(l_ann),
        jnp.asarray(l_prec),
        jnp.asarray(cand), frag_tol, num_shifts, allow_shift,
        use_pallas=False, top_t=16, t0=4,
    )
    exp_idx, exp_score = _reference_best(
        (q_mz, q_int, None, q_prec),
        (l_mz, l_int, l_ann, l_prec), cand, frag_tol, num_shifts,
        allow_shift,
    )
    np.testing.assert_allclose(got_score, exp_score, rtol=1e-5, atol=1e-6)
    differs = got_idx != exp_idx
    assert not differs.any() or np.allclose(
        got_score[differs], exp_score[differs]
    )
