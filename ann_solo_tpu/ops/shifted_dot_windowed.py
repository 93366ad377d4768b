"""Windowed (merge-join) shifted-dot scoring: the sparse formulation.

The dense kernels score all K x K peak pairs although at most a handful
are within the fragment tolerance -- the reference's C++ merge-join
(SpectrumMatch.cpp:35-46) never materializes the rest.  This module is
the TPU analog: both peak lists are m/z-sorted, so for every (query
peak, shift) the in-tolerance candidate peaks are a CONTIGUOUS run.  A
batched searchsorted finds each run's start and a fixed window of W
candidates is gathered -- the score "matrix" shrinks from (K, K) to
(K, S*W) lanes (e.g. 50x50=2500 -> 50x12=600 for charge-2 open search).

Exactness: pairs where any window overflows (more than W in-tolerance
candidates for one (peak, shift)) are flagged so callers re-run them
through the dense path; the greedy tie-break uses the dense (i, j) key,
so results are bit-compatible with `ops.shifted_dot`.

STATUS -- measured, NOT the default: on a v5e chip (8192 pairs, K=50,
3 shifts) this formulation runs at 23k pairs/sec vs 61k for the dense
kernels: the batched searchsorted + per-pair gathers cost more than the
4x lane reduction saves, because the dense formulation is pure
vectorized compares that the VPU eats for free.  Kept (with parity
tests) as groundwork: inside a Pallas kernel the window gathers become
explicit VMEM loads, where the compressed representation should win --
a round-3 candidate.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

W = 4  # candidate peaks gathered per (query peak, shift) window


@partial(jax.jit, static_argnums=(8, 9, 10, 11))
def windowed_score_lanes(
    q_mz, q_int,  # (P, K)
    c_mz, c_int, c_ann,  # (P, K)
    q_prec_mz, c_prec_mz, charge,  # (P,)
    fragment_mz_tolerance: float,
    num_shifts: int,
    allow_shift: bool,
    w: int = W,
):
    """Compressed score lanes for a batch of pairs.

    Returns (scores (P, K, S*w), cand_j (P, K, S*w) int32 [-1 invalid],
    overflow (P,) bool).
    """
    p, k = q_mz.shape
    tol = jnp.float32(fragment_mz_tolerance)
    s_count = num_shifts if allow_shift else 1
    prec_diff = (q_prec_mz - c_prec_mz) * charge.astype(jnp.float32)
    shifted_active = allow_shift & (jnp.abs(prec_diff) >= tol)

    # Shift offsets (P, S): shift 0 -> 0; shift s -> prec_diff / s,
    # active only when allow_shift, |diff| >= tol, and s <= charge.
    s_iota = jnp.arange(s_count, dtype=jnp.float32)  # (S,)
    offsets = jnp.where(
        s_iota[None, :] > 0,
        prec_diff[:, None] / jnp.maximum(s_iota[None, :], 1.0),
        0.0,
    )  # (P, S)
    s_active = (s_iota[None, :] == 0) | (
        shifted_active[:, None]
        & (s_iota[None, :] <= charge.astype(jnp.float32)[:, None])
    )  # (P, S)

    # Window starts: first candidate with c_mz >= q_mz - offset - tol.
    # Zero-padded tail lanes (pad m/z 0.0 < any real m/z) would violate
    # searchsorted's sorted precondition; +inf keeps rows sorted and
    # pushes padding past every window.
    c_sorted = jnp.where(c_int > 0, c_mz, jnp.inf)
    targets = (
        q_mz[:, None, :] - offsets[:, :, None] - tol
    )  # (P, S, K)
    starts = jax.vmap(
        lambda row, t: jnp.searchsorted(row, t.reshape(-1))
    )(c_sorted, targets).reshape(p, s_count, k).astype(jnp.int32)

    # Gather w candidates per window.
    idx = starts[..., None] + jnp.arange(w, dtype=jnp.int32)  # (P,S,K,w)
    in_bounds = idx < k
    safe = jnp.clip(idx, 0, k - 1)
    flat_safe = safe.reshape(p, -1)
    cm = jnp.take_along_axis(c_mz, flat_safe, axis=1).reshape(safe.shape)
    ci = jnp.take_along_axis(c_int, flat_safe, axis=1).reshape(safe.shape)
    ca = jnp.take_along_axis(c_ann, flat_safe, axis=1).reshape(safe.shape)

    diff = q_mz[:, None, :, None] - (cm + offsets[:, :, None, None])
    within = (
        (jnp.abs(diff) <= tol)
        & in_bounds
        & s_active[:, :, None, None]
    )
    # Annotation multiplier (SpectrumMatch.cpp:57-83): shift 0 -> 1;
    # shifted: 1 when the candidate annotation charge equals the shift,
    # 2/3 when unannotated, else 0.
    s_int = jnp.arange(s_count, dtype=jnp.int32)[None, :, None, None]
    mult = jnp.where(
        s_int == 0,
        1.0,
        jnp.where(ca == s_int, 1.0, jnp.where(ca == 0, 2.0 / 3.0, 0.0)),
    )
    scores = jnp.where(
        within, mult * q_int[:, None, :, None] * ci, 0.0
    )
    cand_j = jnp.where(within & (scores > 0), safe, -1)

    # Overflow: the peak just past the window is still in tolerance.
    next_idx = jnp.clip(starts + w, 0, k - 1)
    next_mz = jnp.take_along_axis(
        c_sorted, next_idx.reshape(p, -1), axis=1
    ).reshape(next_idx.shape)
    next_diff = q_mz[:, None, :] - (next_mz + offsets[:, :, None])
    overflow = jnp.any(
        (jnp.abs(next_diff) <= tol)
        & (starts + w < k)
        & s_active[:, :, None],
        axis=(1, 2),
    )

    # Lanes ordered (i, s, w): transpose to (P, K, S, w) then flatten.
    scores = jnp.transpose(scores, (0, 2, 1, 3)).reshape(
        p, k, s_count * w
    )
    cand_j = jnp.transpose(cand_j, (0, 2, 1, 3)).reshape(
        p, k, s_count * w
    )
    return scores, cand_j, overflow


@partial(jax.jit, static_argnums=(8, 9, 10, 11))
def windowed_greedy_scores(
    q_mz, q_int, c_mz, c_int, c_ann,
    q_prec_mz, c_prec_mz, charge,
    fragment_mz_tolerance: float,
    num_shifts: int,
    allow_shift: bool,
    w: int = W,
):
    """Greedy totals over the compressed lanes ((P,) float32, overflow).

    Tie-break matches the dense kernels and the oracle: among maximal
    entries the one with the lowest (query peak, candidate peak) key
    wins.  Entries for pairs flagged `overflow` are not trustworthy --
    re-run those through the dense path.
    """
    p, k = q_mz.shape
    scores, cand_j, overflow = windowed_score_lanes(
        q_mz, q_int, c_mz, c_int, c_ann, q_prec_mz, c_prec_mz, charge,
        fragment_mz_tolerance, num_shifts, allow_shift, w,
    )
    sw = scores.shape[2]
    flat = scores.reshape(p, k * sw)
    jidx = cand_j.reshape(p, k * sw)
    lane_row = (
        jnp.arange(k * sw, dtype=jnp.int32)[None, :] // sw
    )  # query peak per lane
    big = jnp.int32(k * k)
    n_iter = k

    def cond(state):
        step, _flat, _total, active = state
        return (step < n_iter) & active

    def body(state):
        step, flat_s, total, _active = state
        best = jnp.max(flat_s, axis=1, keepdims=True)
        is_best = flat_s >= best
        # Dense tie-break: lowest i * K + j among maxima.
        key = jnp.where(is_best, lane_row * k + jidx, big)
        pick = jnp.min(key, axis=1, keepdims=True)
        take = best > 0.0
        total = total + jnp.where(take[:, 0], best[:, 0], 0.0)
        row = pick // k
        col = pick - row * k
        blocked = (lane_row == row) | (jidx == col)
        flat_s = jnp.where(blocked & take, 0.0, flat_s)
        return step + 1, flat_s, total, jnp.any(take)

    _, _, total, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), flat, jnp.zeros((p,), jnp.float32),
         jnp.bool_(True)),
    )
    return total, overflow
