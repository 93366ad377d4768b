"""Fused on-device candidate rescoring (no per-chunk host round-trips).

Round-1 profiling showed the rescoring stage dominated by host
orchestration: 16k-pair chunks each did a device->host score download and
a NumPy segment-max (round-1 search.py:455-483).  Here the full
(batch x num_candidates) rescore runs as device programs:

`rescore_candidate_matrix` takes a (B, C) candidate-id matrix (from the
ANN index, or window row ranges expanded by the engine), computes every
pair's row-max-sum upper bound + exactness flag in one chunked device
pass, and runs the real greedy kernel (Pallas on TPU, XLA elsewhere)
only for queries whose winner is in doubt -- certified exact.  All
device programs have fixed shapes (chunked / bucketed) because dynamic
shapes recompile per batch, which dominates wall time on tunneled TPU
backends.

Reference semantics: `spectral_library.py:328-455` batch search +
`SpectrumMatch.cpp` best-candidate selection.  On exact score ties the
first candidate in candidate-matrix order (ANN rank order) wins --
deterministic, and compatible with the reference, whose tie order is
unspecified.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ann_solo_tpu.ops.shifted_dot import pair_score_matrix
from ann_solo_tpu.ops.shifted_dot_pallas import gather_pair_scores


def _gather_pair_peaks(
    q_mz, q_int, q_prec, lib_mz, lib_int, lib_ann, lib_prec,
    pair_q, pair_c,
):
    """Common-width peak gathers for a flat list of (query, cand) pairs."""
    qm = jnp.take(q_mz, pair_q, axis=0)
    qi = jnp.take(q_int, pair_q, axis=0)
    qp = jnp.take(q_prec, pair_q, axis=0)
    cm = jnp.take(lib_mz, pair_c, axis=0)
    ci = jnp.take(lib_int, pair_c, axis=0)
    ca = jnp.take(lib_ann, pair_c, axis=0)
    cp = jnp.take(lib_prec, pair_c, axis=0)
    k = max(qm.shape[1], cm.shape[1])
    if qm.shape[1] < k:
        pad = [(0, 0), (0, k - qm.shape[1])]
        qm, qi = jnp.pad(qm, pad), jnp.pad(qi, pad)
    if cm.shape[1] < k:
        pad = [(0, 0), (0, k - cm.shape[1])]
        cm, ci = jnp.pad(cm, pad), jnp.pad(ci, pad)
        ca = jnp.pad(ca, pad, constant_values=-1)
    return qm, qi, qp, cm, ci, ca, cp


@functools.partial(jax.jit, static_argnums=(8, 9, 10, 11))
def _stage1_bounds(
    q_mz, q_int, q_prec,
    lib_mz, lib_int, lib_ann, lib_prec,
    cand_ids,  # (B, C)
    fragment_mz_tolerance: float,
    num_shifts: int,
    allow_shift: bool,
    c_chunk: int,
):
    """Per-pair upper bound + exactness flag for the whole (B, C) matrix.

    For each pair: ub = sum_i max_j score(i, j), and `exact` = the row
    argmaxes are pairwise distinct (then ub equals the greedy total: the
    global max is some row's max; removing its row and column leaves
    every other row's argmax untouched, by induction).

    Formulation note (round 3): a Pallas kernel computing the same bound
    row-by-row in VMEM (never materializing the (P, K, K) f32 tensor)
    was built, hardware-parity-verified, and MEASURED 7x SLOWER than
    this XLA formulation at bench shapes (2.05 s vs 0.29 s per
    4096x1024-pair batch on v5e): the pass is VPU-bound, and the
    kernel's (128, K_pad) row tiles use half the VPU lanes while XLA
    fuses the dense tensor into full-width elementwise ops that hide the
    HBM streaming.  The kernel was deleted rather than kept as dead
    code; re-derive it from git history if a future formulation changes
    the math (it must reproduce exactly this bound, first-maximal-lane
    argmax included).
    """
    b, c = cand_ids.shape
    k = q_mz.shape[1]

    def chunk(ids_chunk):  # (B, CC)
        flat = ids_chunk.reshape(-1)
        valid = flat >= 0
        safe = jnp.clip(flat, 0, lib_mz.shape[0] - 1).astype(jnp.int32)
        rows = jnp.broadcast_to(
            jnp.arange(b, dtype=jnp.int32)[:, None], ids_chunk.shape
        ).reshape(-1)
        qm, qi, qp, cm, ci, ca, cp = _gather_pair_peaks(
            q_mz, q_int, q_prec, lib_mz, lib_int, lib_ann, lib_prec,
            rows, safe,
        )
        charge = jnp.full(
            rows.shape, num_shifts - 1 if allow_shift else 1, jnp.int32
        )
        mat = pair_score_matrix(
            qm, qi, cm, ci, ca, qp, cp, charge,
            fragment_mz_tolerance, num_shifts, allow_shift,
        )  # (P, K, K)
        rowmax = jnp.max(mat, axis=2)  # (P, K)
        rowarg = jnp.argmax(mat, axis=2).astype(jnp.int32)
        ub = jnp.sum(rowmax, axis=1)
        kk = mat.shape[1]
        # Distinctness of active-row argmaxes: inactive rows get unique
        # dummy keys so they never collide.
        key = jnp.where(
            rowmax > 0.0, rowarg,
            kk + jnp.arange(kk, dtype=jnp.int32)[None, :],
        )
        key = jnp.sort(key, axis=1)
        conflict = jnp.any(key[:, 1:] == key[:, :-1], axis=1)
        ub = jnp.where(valid, ub, -jnp.inf)
        return (
            ub.reshape(ids_chunk.shape),
            (~conflict & valid).reshape(ids_chunk.shape),
        )

    n_chunks = -(-c // c_chunk)
    c_pad = n_chunks * c_chunk
    if c_pad != c:
        cand_ids = jnp.pad(
            cand_ids, ((0, 0), (0, c_pad - c)), constant_values=-1
        )
    # lax.map compiles the chunk body once (vs unrolling n_chunks copies).
    stacked = jnp.transpose(
        cand_ids.reshape(b, n_chunks, c_chunk), (1, 0, 2)
    )  # (n_chunks, B, CC)
    ub_s, exact_s = jax.lax.map(chunk, stacked)
    ub = jnp.transpose(ub_s, (1, 0, 2)).reshape(b, c_pad)[:, :c]
    exact = jnp.transpose(exact_s, (1, 0, 2)).reshape(b, c_pad)[:, :c]
    return ub, exact


@functools.partial(jax.jit, static_argnums=(3,))
def _stage2_select(ub, exact, cand_ids, t: int):
    """Device-side stage-2 selection: per query, the top-`t` candidates
    by upper bound (sorted descending) with their ids / exactness flags,
    plus valid-candidate counts.  Keeps the (B, C) bound matrix on
    device -- only these (B, T) slivers are downloaded."""
    ub_sel, pos = jax.lax.top_k(ub, t)
    ids_sel = jnp.take_along_axis(cand_ids, pos, axis=1)
    exact_sel = jnp.take_along_axis(exact, pos, axis=1)
    n_cands = jnp.sum(cand_ids >= 0, axis=1).astype(jnp.int32)
    return ub_sel, ids_sel, exact_sel, n_cands


@functools.partial(jax.jit, static_argnums=(9, 10, 11, 12))
def _greedy_pairs(
    q_mz, q_int, q_prec,
    lib_mz, lib_int, lib_ann, lib_prec,
    pair_q, pair_c,  # (P,) flat pairs (P % PAIR_BLOCK == 0)
    fragment_mz_tolerance: float,
    num_shifts: int,
    allow_shift: bool,
    use_pallas: bool,
):
    valid = pair_c >= 0
    safe = jnp.clip(pair_c, 0, lib_mz.shape[0] - 1)
    return gather_pair_scores(
        q_mz, q_int, q_prec,
        lib_mz, lib_int, lib_ann, lib_prec,
        pair_q, safe, valid,
        fragment_mz_tolerance, num_shifts, allow_shift, use_pallas,
    )


_GREEDY_CHUNK = 8192  # fixed pair-chunk: ONE compiled greedy program


def _dp_pair_sharding(lib_mz):
    """Pair-axis sharding matching the library arrays' mesh, if any.

    When the engine runs query data parallelism the library blocks are
    replicated over a (dp, lib) mesh; pair uploads must then shard over
    'dp' (greedy pairs are embarrassingly parallel) -- a single-device
    pair upload would conflict with the mesh-placed library inputs.
    """
    sharding = getattr(lib_mz, "sharding", None)
    mesh = getattr(sharding, "mesh", None)
    if (
        mesh is None
        or "dp" not in getattr(mesh, "shape", {})
        or getattr(mesh, "size", 1) <= 1
    ):
        return None
    from jax.sharding import NamedSharding, PartitionSpec

    return NamedSharding(mesh, PartitionSpec("dp"))


def _greedy_pairs_chunked(
    q_mz, q_int, q_prec, lib_mz, lib_int, lib_ann, lib_prec,
    pair_q, pair_c,
    fragment_mz_tolerance, num_shifts, allow_shift, use_pallas,
):
    """Greedy scores over an arbitrary pair count via fixed-size chunks.

    Dynamic pair counts would compile a fresh (expensive) kernel per
    shape; chunking to one fixed size keeps exactly one compiled variant
    per process.  All chunks are dispatched asynchronously before any
    download: the tunnel round trip (~26 ms) is paid once, not per chunk.
    """
    n = pair_q.shape[0]
    out = np.empty(n, np.float32)
    pair_sharding = _dp_pair_sharding(lib_mz)
    pending = []
    for start in range(0, n, _GREEDY_CHUNK):
        pq = pair_q[start : start + _GREEDY_CHUNK]
        pc = pair_c[start : start + _GREEDY_CHUNK]
        m = len(pq)
        if m < _GREEDY_CHUNK:
            pq = np.pad(pq, (0, _GREEDY_CHUNK - m))
            pc = np.pad(pc, (0, _GREEDY_CHUNK - m), constant_values=-1)
        pq_d = jnp.asarray(pq, jnp.int32)
        pc_d = jnp.asarray(pc, jnp.int32)
        if pair_sharding is not None:
            pq_d = jax.device_put(pq_d, pair_sharding)
            pc_d = jax.device_put(pc_d, pair_sharding)
        scores = _greedy_pairs(
            q_mz, q_int, q_prec, lib_mz, lib_int, lib_ann, lib_prec,
            pq_d, pc_d,
            fragment_mz_tolerance, num_shifts, allow_shift, use_pallas,
        )
        pending.append((start, m, scores))
    for start, m, scores in pending:
        out[start : start + m] = np.asarray(scores)[:m]
    return out


def rescore_candidate_matrix(
    q_mz, q_int, q_prec,  # (B, K), (B, K), (B,) device-resident queries
    lib_mz, lib_int, lib_ann, lib_prec,  # device-resident library block
    cand_ids,  # (B, C) int32 candidate rows, -1 = invalid
    fragment_mz_tolerance: float,
    num_shifts: int,
    allow_shift: bool,
    use_pallas: bool,
    c_chunk: int = 0,
    top_t: int = 32,
):
    """Exact per-query best candidate under greedy shifted-dot scoring.

    Two-stage exact algorithm (reference scores every candidate with the
    full C++ greedy, SpectrumMatch.cpp:92-111 -- O(C * K^2 * K) work;
    here the greedy runs only where it can matter):

    1.  One cheap pass computes every pair's row-max-sum upper bound and
        an exactness flag (distinct row argmaxes => bound IS the greedy
        score).  Queries whose top-bound candidate is flagged exact are
        done: its score dominates every other candidate's bound and
        hence their greedy scores.
    2.  Remaining queries run the real greedy kernel on their `top_t`
        highest-bound candidates; the result is certified optimal when
        the best exact score reaches the `top_t`-th bound (everything
        excluded has a smaller bound).  Certificate failures escalate to
        a full greedy over all C candidates for that query (rare).

    Returns (best_idx (B,), best_score (B,), n_candidates (B,)) NumPy.
    """
    b, c = cand_ids.shape
    if c_chunk <= 0:
        # ~64k pairs per stage-1 step: measured 2.8x faster than 16k on
        # v5e (lax.map step overhead dominates below that); the
        # (P, K, K) float32 intermediate stays under ~700 MB.
        c_chunk = max(8, min(c, 65536 // max(b, 1)))
    # The candidate matrix never round-trips: stage 1 consumes it on
    # device, and stage 2's top-T selection also runs on device so only
    # (B, T) slivers cross the tunnel (a (B, C) download costs ~100 ms
    # + round trip at bench shapes).
    cand_dev = jnp.asarray(cand_ids, jnp.int32)
    ub_d, exact_d = _stage1_bounds(
        q_mz, q_int, q_prec, lib_mz, lib_int, lib_ann, lib_prec,
        cand_dev, fragment_mz_tolerance, num_shifts,
        allow_shift, min(c_chunk, c),
    )
    t = min(top_t, c)
    ub_sel_d, ids_sel_d, exact_sel_d, n_cands_d = _stage2_select(
        ub_d, exact_d, cand_dev, t
    )
    # Small host downloads; the greedy-pair selection logic is
    # irregular host work by design (fixed-size device chunks only --
    # dynamic-shape device programs recompile per shape, which dominates
    # wall time on tunneled TPU backends).
    ub_sel = np.asarray(ub_sel_d)  # (B, T) sorted descending
    ids_sel = np.asarray(ids_sel_d)
    exact_sel = np.asarray(exact_sel_d)
    n_cands = np.asarray(n_cands_d)
    has_any = n_cands > 0
    best_idx = np.where(has_any, ids_sel[:, 0], -1).astype(np.int64)
    best_score = np.where(
        has_any, ub_sel[:, 0], -np.inf
    ).astype(np.float64)
    need = ~exact_sel[:, 0] & has_any
    sel = np.nonzero(need)[0]
    if len(sel) == 0:
        return best_idx, best_score, n_cands

    ub_sel = ub_sel[sel]  # (S, T)
    ids_sel = ids_sel[sel]
    exact_sel = exact_sel[sel]
    # Pairs flagged exact need no greedy -- their bound IS the greedy
    # score; only the conflicted pairs hit the kernel (typically a
    # minority even among the selected top-T).
    exact_scores = np.where(
        np.isneginf(ub_sel), -np.inf, ub_sel
    ).astype(np.float32)
    need_pair = ~exact_sel & ~np.isneginf(ub_sel)
    if need_pair.any():
        flat_rows = np.repeat(sel, t).reshape(len(sel), t)
        pair_q = flat_rows[need_pair].astype(np.int32)
        pair_c = ids_sel[need_pair]
        greedy = _greedy_pairs_chunked(
            q_mz, q_int, q_prec, lib_mz, lib_int, lib_ann, lib_prec,
            pair_q, pair_c,
            fragment_mz_tolerance, num_shifts, allow_shift, use_pallas,
        )
        exact_scores[need_pair] = greedy
    best_t = np.argmax(exact_scores, axis=1)
    s_rows = np.arange(len(sel))
    best_idx[sel] = ids_sel[s_rows, best_t]
    best_score[sel] = exact_scores[s_rows, best_t]
    # Optimality certificate: excluded candidates all have bounds <= the
    # smallest selected bound.
    t_th = ub_sel.min(axis=1)
    cert = (exact_scores[s_rows, best_t] >= t_th) | np.isneginf(t_th)
    failures = sel[~cert]
    if len(failures) and t < c:
        # Full greedy over all C candidates for certificate failures
        # (rare: only their candidate rows are downloaded).
        cand_fail = np.asarray(cand_dev[jnp.asarray(failures)])
        pair_q = np.repeat(failures, c).astype(np.int32)
        pair_c = cand_fail.reshape(-1)
        scores = _greedy_pairs_chunked(
            q_mz, q_int, q_prec, lib_mz, lib_int, lib_ann, lib_prec,
            pair_q, pair_c,
            fragment_mz_tolerance, num_shifts, allow_shift, use_pallas,
        ).reshape(len(failures), c)
        f_best = np.argmax(scores, axis=1)
        f_rows = np.arange(len(failures))
        best_idx[failures] = cand_fail[f_rows, f_best]
        best_score[failures] = scores[f_rows, f_best]
    return best_idx, best_score, n_cands
