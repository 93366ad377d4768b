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
