"""Shifted-dot-product rescoring as batched TPU array ops.

TPU-native re-design of the reference's hand-written C++ hot loop
(`SpectrumMatcher::dot`, SpectrumMatch.cpp:8-133; bridged via
spectrum_match.pyx:28-108).  The C++ walks per-shift merge-join cursors over
one candidate at a time and then greedily assigns sorted peak matches.  Here
the same semantics are expressed as dense masked tensor math over *batches of
(query, candidate) pairs*:

1.  For each pair, build the (q_peaks x c_peaks) match-score matrix: a peak
    pair (i, j) scores ``mult * q_int[i] * c_int[j]`` where the multiplier is
    the maximum over all active shifts of the C++ annotation rule
    (SpectrumMatch.cpp:57-83):
      * shift 0 (direct match): 1.0
      * shifted, candidate annotation charge == shift charge: 1.0
      * shifted, unannotated candidate peak (charge 0): 2/3
      * otherwise: 0.
    Shift s has m/z offset ``precursor_mass_diff / s`` and shifts are active
    only when ``allow_shift`` and ``|precursor_mass_diff| >= fragment_tol``
    (SpectrumMatch.cpp:18-31).  Taking the max over shifts is equivalent to
    the C++ multi-entry push + greedy because greedy consumes each (i, j)
    at most once, highest score first.
2.  Run the greedy one-to-one assignment (SpectrumMatch.cpp:92-111) for all
    pairs in parallel: top-k the flattened score matrix once, then walk the
    sorted entries with a vectorized used-row/used-column mask.

Ties are broken deterministically (lowest flat index first); the C++ uses
std::sort (unstable), so tie order there is unspecified -- parity is defined
modulo ties, which cannot change the total score.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Kept for call-site compatibility; the greedy assignment is uncapped (an
# iterative masked argmax needs at most min(q_peaks, c_peaks) rounds, each
# consuming one query row and one candidate column -- no entry budget).
DEFAULT_MAX_ENTRIES = 160


def pair_score_matrix(
    q_mz: jnp.ndarray,  # (P, K) float32
    q_int: jnp.ndarray,  # (P, K) float32
    c_mz: jnp.ndarray,  # (P, K) float32
    c_int: jnp.ndarray,  # (P, K) float32
    c_ann: jnp.ndarray,  # (P, K) int32 annotation charge (0 = unannotated)
    q_prec_mz: jnp.ndarray,  # (P,)
    c_prec_mz: jnp.ndarray,  # (P,)
    charge: jnp.ndarray,  # (P,) int32 candidate precursor charge
    fragment_mz_tolerance: float,
    num_shifts: int,
    allow_shift: bool,
) -> jnp.ndarray:
    """Match-score matrices for a batch of (query, candidate) pairs.

    Returns (P, K, K) float32: entry (p, i, j) is the score contribution if
    query peak i is matched to candidate peak j (0 if no shift matches).
    `num_shifts` must be >= max(charge) + 1 when `allow_shift`; shifts beyond
    a pair's own charge are masked off dynamically.
    """
    tol = jnp.float32(fragment_mz_tolerance)
    prec_diff = (q_prec_mz - c_prec_mz) * charge.astype(jnp.float32)  # (P,)
    shifted_active = allow_shift & (jnp.abs(prec_diff) >= tol)  # (P,)

    # Shift 0: direct matches, multiplier 1.
    diff0 = q_mz[:, :, None] - c_mz[:, None, :]
    best_mult = (jnp.abs(diff0) <= tol).astype(jnp.float32)
    if allow_shift and num_shifts > 1:
        ann = c_ann[:, None, :]  # (P, 1, K)
        for s in range(1, num_shifts):
            offset = prec_diff / jnp.float32(s)  # (P,)
            within = (
                jnp.abs(diff0 - offset[:, None, None]) <= tol
            )  # (P, K, K)
            mult = jnp.where(
                ann == s, 1.0, jnp.where(ann == 0, 2.0 / 3.0, 0.0)
            )  # (P, 1, K)
            active = (
                shifted_active & (s <= charge)
            )[:, None, None]  # (P, 1, 1)
            best_mult = jnp.maximum(
                best_mult, jnp.where(within & active, mult, 0.0)
            )
    return best_mult * q_int[:, :, None] * c_int[:, None, :]


@partial(jax.jit, static_argnums=(1, 2))
def greedy_assignment(
    scores: jnp.ndarray,  # (P, K, K)
    max_entries: int = DEFAULT_MAX_ENTRIES,  # unused; uncapped (see above)
    return_matches: bool = False,
):
    """Greedy one-to-one peak assignment, vectorized over pairs.

    Mirrors SpectrumMatch.cpp:92-111 exactly (uncapped, like the C++):
    iterative masked argmax -- each round takes the highest remaining
    entry per pair (lowest flat index on ties, same rule as the Pallas
    kernel and the oracle) and zeroes its query row and candidate column.
    At most min(kq, kc) rounds assign everything; an early exit fires once
    no pair has a positive entry left.  Returns the total score per pair,
    and optionally the selected (query_peak, candidate_peak) index pairs,
    padded with -1.
    """
    p, kq, kc = scores.shape
    n_iter = min(kq, kc)
    kk = kq * kc
    flat0 = scores.reshape(p, kk)
    col_ids = jnp.arange(kk, dtype=jnp.int32)[None, :]
    row_of = col_ids // kc
    col_of = col_ids - row_of * kc

    def cond(state):
        step, _flat, _total, _mq, _mc, active = state
        return (step < n_iter) & active

    def body(state):
        step, flat, total, mq, mc, _active = state
        best = jnp.max(flat, axis=1)  # (P,)
        idx = jnp.min(
            jnp.where(flat >= best[:, None], col_ids, kk), axis=1
        ).astype(jnp.int32)
        take = best > 0.0
        total = total + jnp.where(take, best, 0.0)
        i = idx // kc
        j = idx - i * kc
        mq = jax.lax.dynamic_update_index_in_dim(
            mq, jnp.where(take, i, -1), step, axis=1
        )
        mc = jax.lax.dynamic_update_index_in_dim(
            mc, jnp.where(take, j, -1), step, axis=1
        )
        blocked = (row_of == i[:, None]) | (col_of == j[:, None])
        flat = jnp.where(blocked & take[:, None], 0.0, flat)
        return step + 1, flat, total, mq, mc, jnp.any(take)

    state = (
        jnp.int32(0),
        flat0,
        jnp.zeros((p,), jnp.float32),
        jnp.full((p, n_iter), -1, jnp.int32),
        jnp.full((p, n_iter), -1, jnp.int32),
        jnp.bool_(True),
    )
    _, _, total, match_q, match_c, _ = jax.lax.while_loop(cond, body, state)
    if not return_matches:
        return total
    return total, match_q, match_c


@partial(jax.jit, static_argnums=(9, 10, 11, 12))
def shifted_dot_scores(
    q_mz, q_int, c_mz, c_int, c_ann,
    q_prec_mz, c_prec_mz, charge,
    pair_valid,  # (P,) bool -- padding pairs score -inf
    fragment_mz_tolerance: float,
    num_shifts: int,
    allow_shift: bool,
    max_entries: int = DEFAULT_MAX_ENTRIES,
) -> jnp.ndarray:
    """Score a batch of (query, candidate) pairs. Invalid pairs -> -inf."""
    scores = pair_score_matrix(
        q_mz, q_int, c_mz, c_int, c_ann, q_prec_mz, c_prec_mz, charge,
        fragment_mz_tolerance, num_shifts, allow_shift,
    )
    total = greedy_assignment(scores, max_entries)
    return jnp.where(pair_valid, total, -jnp.inf)


@partial(jax.jit, static_argnums=(8, 9, 10, 11))
def shifted_dot_best_match(
    q_mz, q_int, c_mz, c_int, c_ann,
    q_prec_mz, c_prec_mz, charge,
    fragment_mz_tolerance: float,
    num_shifts: int,
    allow_shift: bool,
    max_entries: int = DEFAULT_MAX_ENTRIES,
):
    """Score pairs and also return the greedy peak matches per pair."""
    scores = pair_score_matrix(
        q_mz, q_int, c_mz, c_int, c_ann, q_prec_mz, c_prec_mz, charge,
        fragment_mz_tolerance, num_shifts, allow_shift,
    )
    return greedy_assignment(scores, max_entries, return_matches=True)


def shifted_dot_oracle(
    q_mz: np.ndarray,
    q_int: np.ndarray,
    c_mz: np.ndarray,
    c_int: np.ndarray,
    c_ann: np.ndarray,
    q_prec_mz: float,
    c_prec_mz: float,
    charge: int,
    fragment_mz_tolerance: float,
    allow_shift: bool,
):
    """Uncapped NumPy oracle of the C++ semantics (single pair).

    Faithful scalar port of SpectrumMatcher::dot (SpectrumMatch.cpp:8-133)
    for one (query, candidate) pair: returns (score, [(i, j), ...]).
    Ties are broken by lowest (i, j) -- the JAX path uses the same rule.
    """
    tol = float(fragment_mz_tolerance)
    prec_diff = (float(q_prec_mz) - float(c_prec_mz)) * charge
    num_shifts = (
        charge + 1 if allow_shift and abs(prec_diff) >= tol else 1
    )
    entries = []
    for i in range(len(q_mz)):
        for j in range(len(c_mz)):
            best_mult = 0.0
            for s in range(num_shifts):
                offset = 0.0 if s == 0 else prec_diff / s
                if abs(q_mz[i] - (c_mz[j] + offset)) <= tol:
                    if s == 0 or c_ann[j] == s:
                        mult = 1.0
                    elif c_ann[j] == 0:
                        mult = 2.0 / 3.0
                    else:
                        mult = 0.0
                    best_mult = max(best_mult, mult)
            if best_mult > 0.0:
                entries.append(
                    (best_mult * float(q_int[i]) * float(c_int[j]), i, j)
                )
    entries.sort(key=lambda e: (-e[0], e[1], e[2]))
    used_q, used_c = set(), set()
    score, matches = 0.0, []
    for s, i, j in entries:
        if i not in used_q and j not in used_c and s > 0:
            score += s
            matches.append((i, j))
            used_q.add(i)
            used_c.add(j)
    return score, matches
