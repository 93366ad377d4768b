"""Pallas TPU kernel for shifted-dot-product rescoring.

The fused fast path for `ops.shifted_dot`: per grid cell, a block of
(query, candidate) pairs builds its flattened (K*K) match-score matrices
directly in VMEM scratch (per-shift tolerance windows + annotation
multipliers, max over shifts) and runs the greedy one-to-one assignment as
an iterative masked argmax -- no HBM round-trip for score matrices and no
full sort, which is what the XLA top-k formulation in ops/shifted_dot.py
pays for.

All tensor shapes inside the kernel are 2D (pairs x lanes) -- Mosaic's
vector layouts do not support the 3D broadcasts the naive formulation
would use.  Query-peak rows of the score matrix are produced one at a time
(fori over K) and stored at lane offset i*K of the scratch block.

Semantics are identical to `greedy_assignment(pair_score_matrix(...))`
(and therefore to the reference C++ SpectrumMatch.cpp:8-133): tie-breaking
picks the lowest flat (query_peak, candidate_peak) index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Pairs processed per grid cell; K is padded to a multiple of 8 lanes.
PAIR_BLOCK = 128


def _kernel(
    q_mz_ref, q_int_ref, c_mz_ref, c_int_ref, c_ann_ref,
    q_prec_ref, c_prec_ref, charge_ref,
    out_ref, match_ref,
    *, fragment_mz_tolerance: float, num_shifts: int, allow_shift: bool,
):
    p, k = q_mz_ref.shape
    tol = jnp.float32(fragment_mz_tolerance)
    q_mz = q_mz_ref[:]  # (P, K)
    q_int = q_int_ref[:]
    c_mz = c_mz_ref[:]
    c_int = c_int_ref[:]
    shifted = allow_shift and num_shifts > 1
    if shifted:
        charge = charge_ref[:].astype(jnp.float32)  # (P, 1)
        prec_diff = (q_prec_ref[:] - c_prec_ref[:]) * charge  # (P, 1)
        shifted_active = jnp.abs(prec_diff) >= tol  # (P, 1)
        ann = c_ann_ref[:]  # (P, K)

    # Build the flattened (P, K*K) match-score matrix with a statically
    # unrolled row loop: row i uses the STATIC lane slice q_*[:, i:i+1],
    # which Mosaic lowers reliably.  (The round-1 formulation -- a
    # fori_loop extracting rows via one-hot matmuls and storing to
    # dynamic lane offsets of a VMEM scratch -- compiled cleanly but
    # produced wrong values on real TPUs, caught only by a hardware
    # accuracy check; keep this kernel free of dynamic lane stores.)
    kk = k * k
    parts = []
    for i in range(k):
        q_mz_i = q_mz[:, i : i + 1]  # (P, 1)
        q_int_i = q_int[:, i : i + 1]
        diff = q_mz_i - c_mz  # (P, K)
        best_mult = (jnp.abs(diff) <= tol).astype(jnp.float32)
        if shifted:
            for s in range(1, num_shifts):
                offset = prec_diff / jnp.float32(s)  # (P, 1)
                within = jnp.abs(diff - offset) <= tol
                mult = jnp.where(
                    ann == s, 1.0,
                    jnp.where(ann == 0, 2.0 / 3.0, 0.0),
                )
                active = shifted_active & (jnp.float32(s) <= charge)
                best_mult = jnp.maximum(
                    best_mult, jnp.where(within & active, mult, 0.0)
                )
        parts.append(best_mult * q_int_i * c_int)  # (P, K)
    flat0 = jnp.concatenate(parts, axis=1)  # (P, K*K)

    # Greedy one-to-one assignment: iterative masked argmax with the
    # score matrix carried as a loop value (VMEM-resident).  At most K
    # matches exist; blocked entries are zeroed, so a zero max means done
    # (padded peaks have zero intensity and never win).
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (p, kk), 1)
    row_ids = col_ids // k
    col_mod = col_ids - row_ids * k

    # Early exit once no pair in the block has a positive entry left --
    # typical candidates have only a handful of matches, so this usually
    # terminates after far fewer than K iterations.
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (p, k), 1)

    def greedy_cond(state):
        i, _flat, _total, _match, active = state
        return (i < k) & active

    def greedy_body(state):
        i, flat, total, match, _active = state
        best = jnp.max(flat, axis=1, keepdims=True)  # (P, 1)
        is_best = flat >= best
        idx = jnp.min(
            jnp.where(is_best, col_ids, jnp.int32(kk)),
            axis=1, keepdims=True,
        )  # (P, 1)
        take = best > 0.0
        total = total + jnp.where(take, best, 0.0)
        row = idx // k
        col = idx - row * k
        # match[p, i] = candidate peak matched to query peak i (-1 none).
        match = jnp.where((k_iota == row) & take, col, match)
        blocked = (row_ids == row) | (col_mod == col)
        flat = jnp.where(blocked & take, 0.0, flat)
        return i + 1, flat, total, match, jnp.any(take)

    _, _, total, match, _ = jax.lax.while_loop(
        greedy_cond,
        greedy_body,
        (jnp.int32(0), flat0, jnp.zeros((p, 1), jnp.float32),
         jnp.full((p, k), -1, jnp.int32), jnp.bool_(True)),
    )
    out_ref[:] = total
    match_ref[:] = match


@functools.partial(jax.jit, static_argnums=(8, 9, 10, 11))
def shifted_dot_pallas_full(
    q_mz, q_int, c_mz, c_int, c_ann,
    q_prec_mz, c_prec_mz, charge,
    fragment_mz_tolerance: float,
    num_shifts: int,
    allow_shift: bool,
    interpret: bool = False,
):
    """Pair scores + greedy peak matches via the Pallas kernel.

    Returns (scores (P,), match (P, K) int32) where match[p, i] is the
    candidate peak assigned to query peak i (-1 = unmatched) -- the full
    SpectrumMatch.cpp return contract, extracted in-kernel.  P must be a
    multiple of PAIR_BLOCK (pad and mask at the call site); the peak
    axis is padded to a multiple of 8 internally.
    """
    p, k = q_mz.shape
    assert p % PAIR_BLOCK == 0, f"pad pairs to {PAIR_BLOCK}"
    # Peak axis padded to a power of two so row blocks align to lanes;
    # >128 peaks falls back to the XLA path (see the dispatchers below).
    k_pad = 8
    while k_pad < k:
        k_pad *= 2
    assert k_pad <= 128, "Pallas kernel supports at most 128 peaks"
    if k_pad != k:
        pad = [(0, 0), (0, k_pad - k)]
        q_mz = jnp.pad(q_mz, pad)
        q_int = jnp.pad(q_int, pad)
        c_mz = jnp.pad(c_mz, pad)
        c_int = jnp.pad(c_int, pad)
        c_ann = jnp.pad(c_ann, pad, constant_values=-1)

    kernel = functools.partial(
        _kernel,
        fragment_mz_tolerance=float(fragment_mz_tolerance),
        num_shifts=int(num_shifts),
        allow_shift=bool(allow_shift),
    )
    grid = (p // PAIR_BLOCK,)

    def block2(i):
        return (i, 0)

    peaks_spec = pl.BlockSpec(
        (PAIR_BLOCK, k_pad), block2, memory_space=pltpu.VMEM
    )
    scalar_spec = pl.BlockSpec(
        (PAIR_BLOCK, 1), block2, memory_space=pltpu.VMEM
    )
    out, match = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            peaks_spec, peaks_spec, peaks_spec, peaks_spec, peaks_spec,
            scalar_spec, scalar_spec, scalar_spec,
        ],
        out_specs=[scalar_spec, peaks_spec],
        out_shape=[
            jax.ShapeDtypeStruct((p, 1), jnp.float32),
            jax.ShapeDtypeStruct((p, k_pad), jnp.int32),
        ],
        interpret=interpret,
    )(
        q_mz.astype(jnp.float32),
        q_int.astype(jnp.float32),
        c_mz.astype(jnp.float32),
        c_int.astype(jnp.float32),
        c_ann.astype(jnp.int32),
        q_prec_mz.astype(jnp.float32).reshape(p, 1),
        c_prec_mz.astype(jnp.float32).reshape(p, 1),
        charge.astype(jnp.int32).reshape(p, 1),
    )
    return out[:, 0], match[:, :k]


def shifted_dot_scores_pallas(
    q_mz, q_int, c_mz, c_int, c_ann,
    q_prec_mz, c_prec_mz, charge,
    fragment_mz_tolerance: float,
    num_shifts: int,
    allow_shift: bool,
    interpret: bool = False,
):
    """Batched pair scores via the Pallas kernel ((P,) float32)."""
    return shifted_dot_pallas_full(
        q_mz, q_int, c_mz, c_int, c_ann, q_prec_mz, c_prec_mz, charge,
        fragment_mz_tolerance, num_shifts, allow_shift, interpret,
    )[0]


def shifted_dot_best_match_auto(
    q_mz, q_int, c_mz, c_int, c_ann,
    q_prec_mz, c_prec_mz, charge,
    fragment_mz_tolerance: float,
    num_shifts: int,
    allow_shift: bool,
):
    """Scores + (match_q, match_c) peak pairs; Pallas on TPU, else XLA.

    Output contract matches `ops.shifted_dot.shifted_dot_best_match`:
    (total (P,), match_q (P, M), match_c (P, M)) with -1 padding.
    """
    p, k = q_mz.shape
    if (
        use_pallas_default()
        and p % PAIR_BLOCK == 0
        and max(k, c_mz.shape[1]) <= 128
    ):
        # The kernel expects equal peak widths on both sides; pad the
        # narrower one (query and library max_peaks settings may differ).
        qm, qi = jnp.asarray(q_mz), jnp.asarray(q_int)
        cm, ci = jnp.asarray(c_mz), jnp.asarray(c_int)
        ca = jnp.asarray(c_ann)
        kk = max(k, cm.shape[1])
        if qm.shape[1] < kk:
            pad = [(0, 0), (0, kk - qm.shape[1])]
            qm, qi = jnp.pad(qm, pad), jnp.pad(qi, pad)
        if cm.shape[1] < kk:
            pad = [(0, 0), (0, kk - cm.shape[1])]
            cm, ci = jnp.pad(cm, pad), jnp.pad(ci, pad)
            ca = jnp.pad(ca, pad, constant_values=-1)
        total, match = shifted_dot_pallas_full(
            qm, qi, cm, ci, ca,
            jnp.asarray(q_prec_mz), jnp.asarray(c_prec_mz),
            jnp.asarray(charge),
            fragment_mz_tolerance, num_shifts, allow_shift,
        )
        match_q = jnp.where(
            match >= 0, jnp.arange(kk, dtype=jnp.int32)[None, :], -1
        )
        return total, match_q, match
    from ann_solo_tpu.ops.shifted_dot import shifted_dot_best_match

    return shifted_dot_best_match(
        q_mz, q_int, c_mz, c_int, c_ann, q_prec_mz, c_prec_mz, charge,
        fragment_mz_tolerance, num_shifts, allow_shift,
    )


def use_pallas_default() -> bool:
    """Whether the compiled Pallas path should be used by default.

    True only when computation actually runs on a TPU backend (tests pin
    the default device to CPU, where the interpreter would be too slow for
    large batches and the XLA path is used instead).
    """
    try:
        default = jax.config.jax_default_device
        if default is not None and default.platform != "tpu":
            return False
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def shifted_dot_scores_auto(
    q_mz, q_int, c_mz, c_int, c_ann,
    q_prec_mz, c_prec_mz, charge, pair_valid,
    fragment_mz_tolerance: float,
    num_shifts: int,
    allow_shift: bool,
):
    """Dispatch to the Pallas kernel on TPU, else the XLA formulation."""
    from ann_solo_tpu.ops.shifted_dot import shifted_dot_scores

    p = q_mz.shape[0]
    if (
        use_pallas_default()
        and p % PAIR_BLOCK == 0
        and q_mz.shape[1] <= 128
    ):
        scores = shifted_dot_scores_pallas(
            jnp.asarray(q_mz), jnp.asarray(q_int),
            jnp.asarray(c_mz), jnp.asarray(c_int), jnp.asarray(c_ann),
            jnp.asarray(q_prec_mz), jnp.asarray(c_prec_mz),
            jnp.asarray(charge),
            fragment_mz_tolerance, num_shifts, allow_shift,
        )
        return jnp.where(jnp.asarray(pair_valid), scores, -jnp.inf)
    return shifted_dot_scores(
        q_mz, q_int, c_mz, c_int, c_ann, q_prec_mz, c_prec_mz, charge,
        pair_valid, fragment_mz_tolerance, num_shifts, allow_shift,
    )


@functools.partial(jax.jit, static_argnums=(10, 11, 12, 13))
def gather_pair_scores(
    q_mz, q_int, q_prec,  # (B, K), (B, K), (B,) device-resident queries
    lib_mz, lib_int, lib_ann, lib_prec,  # device-resident library block
    pair_q, pair_c, pair_valid,  # (P,) pair indices + validity
    fragment_mz_tolerance: float,
    num_shifts: int,
    allow_shift: bool,
    use_pallas: bool,
):
    """Gather (query, candidate) pairs on device and score them.

    Keeps the library and query peak blocks resident on the device: only
    the (P,) index vectors cross the host boundary per chunk, instead of
    gathered (P, K) peak arrays (a major transfer saving on tunneled or
    PCIe-attached accelerators).
    """
    # The engine partitions by charge, so num_shifts == charge + 1 when
    # shifts are enabled; reconstruct the per-pair charge accordingly.
    charge = jnp.full(
        pair_q.shape, num_shifts - 1 if allow_shift else 1, jnp.int32
    )
    # The Pallas kernel supports <= 128 peak lanes; wider configurations
    # (max_peaks_used > 128) fall back to the XLA formulation.
    if max(q_mz.shape[1], lib_mz.shape[1]) > 128:
        use_pallas = False
    qm = jnp.take(q_mz, pair_q, axis=0)
    qi = jnp.take(q_int, pair_q, axis=0)
    qp = jnp.take(q_prec, pair_q, axis=0)
    cm = jnp.take(lib_mz, pair_c, axis=0)
    ci = jnp.take(lib_int, pair_c, axis=0)
    ca = jnp.take(lib_ann, pair_c, axis=0)
    cp = jnp.take(lib_prec, pair_c, axis=0)
    # The kernel expects equal peak widths on both sides; pad the narrower
    # one (query and library max_peaks settings may differ).
    k = max(qm.shape[1], cm.shape[1])
    if qm.shape[1] < k:
        pad = [(0, 0), (0, k - qm.shape[1])]
        qm, qi = jnp.pad(qm, pad), jnp.pad(qi, pad)
    if cm.shape[1] < k:
        pad = [(0, 0), (0, k - cm.shape[1])]
        cm, ci = jnp.pad(cm, pad), jnp.pad(ci, pad)
        ca = jnp.pad(ca, pad, constant_values=-1)
    if use_pallas:
        scores = shifted_dot_scores_pallas(
            qm, qi, cm, ci, ca, qp, cp, charge,
            fragment_mz_tolerance, num_shifts, allow_shift,
        )
        return jnp.where(pair_valid, scores, -jnp.inf)
    from ann_solo_tpu.ops.shifted_dot import shifted_dot_scores

    return shifted_dot_scores(
        qm, qi, cm, ci, ca, qp, cp, charge, pair_valid,
        fragment_mz_tolerance, num_shifts, allow_shift,
    )


def shifted_dot_scores_oracle_block(
    q_mz, q_int, c_mz, c_int, c_ann, q_prec, c_prec, charge,
    fragment_mz_tolerance, allow_shift,
):
    """Per-pair NumPy oracle over a block (testing helper)."""
    from ann_solo_tpu.ops.shifted_dot import shifted_dot_oracle

    out = np.zeros(len(q_mz), np.float32)
    for i in range(len(q_mz)):
        out[i] = shifted_dot_oracle(
            q_mz[i], q_int[i], c_mz[i], c_int[i], c_ann[i],
            q_prec[i], c_prec[i], int(charge[i]),
            fragment_mz_tolerance, allow_shift,
        )[0]
    return out
