"""Fused Pallas chunked-scan kernel (`ops/ivf_scan_pallas.py`).

Interpret-mode functional checks on the CPU backend: parity against a
dense same-precision reference, certificate soundness under mass score
ties, and the forced end-to-end dispatch through `search_device`.
Hardware parity (compiled Mosaic vs these same fixtures) runs on the
real chip via `scale_demo.py` / the bench self-match gate -- round-1
showed interpret-mode passing does NOT imply hardware correctness, so
any kernel change must re-run the on-device check too.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ann_solo_tpu.index.ivf import IvfIndex, _probe_bitmap
from ann_solo_tpu.ops.ivf_scan_pallas import (
    CK,
    chunked_pallas_supported,
    ivf_chunked_scan_select,
)
from tests.test_ivf import IvfConfig, _clustered_vectors


def _synthetic(rng, l=64, cap=128, d=128, dtype=np.float32):
    """Hand-built padded blocks satisfying the kernel gate."""
    total = l * cap
    vecs = rng.normal(size=(l, cap, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=-1, keepdims=True)
    ids = np.arange(total, dtype=np.int32).reshape(l, cap)
    ids[rng.random((l, cap)) < 0.05] = -1  # padding holes
    # Random (unsorted) precursors: the window then thins every list
    # instead of selecting a contiguous band that random probe sets
    # would usually miss entirely.
    prec = rng.uniform(400, 1200, total).astype(np.float32).reshape(
        l, cap
    )
    scales = np.ones((l, cap), np.float32)
    cents = rng.normal(size=(l, d)).astype(np.float32)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    if dtype == np.int8:
        q = np.abs(vecs).max(axis=-1, keepdims=True)
        scales = (q[..., 0] / 127.0).astype(np.float32)
        vecs = np.clip(
            np.round(vecs / np.maximum(q, 1e-12) * 127), -127, 127
        ).astype(np.int8)
    elif dtype == "bf16":
        import ml_dtypes

        vecs = vecs.astype(ml_dtypes.bfloat16)
    return vecs, ids, prec, scales, cents


def _dense_reference(
    vecs, ids, prec, scales, cents, queries, q_prec, charge,
    p, k_scan, tol_val, tol_mode,
):
    """Same-precision dense oracle: bf16 query x bf16 vector dots in
    f32, ranked in f32 (the kernel ranks by the bf16-TRUNCATED key,
    which is monotone in this score -- unflagged queries must agree)."""
    coarse = queries @ cents.T
    order = np.argsort(-coarse, axis=1, kind="stable")
    probes = order[:, :p]
    l, cap, d = vecs.shape
    v = jnp.asarray(vecs).astype(jnp.bfloat16).reshape(l * cap, d)
    q = jnp.asarray(queries).astype(jnp.bfloat16)
    s = np.asarray(
        jnp.dot(q, v.T, preferred_element_type=jnp.float32)
    ).reshape(-1, l, cap)
    s = s * scales[None]
    mask = np.zeros((len(queries), l), bool)
    np.put_along_axis(mask, probes, True, axis=1)
    ok = mask[:, :, None] & (ids >= 0)[None]
    if tol_val > 0:
        if tol_mode == "Da":
            ok &= (
                np.abs(q_prec[:, None, None] - prec[None]) * charge
                <= tol_val
            )
        else:
            ok &= (
                np.abs(q_prec[:, None, None] - prec[None])
                / np.maximum(prec[None], 1e-6) * 1e6
                <= tol_val
            )
    s = np.where(ok, s, -np.inf).reshape(len(queries), -1)
    top = np.argsort(-s, axis=1, kind="stable")[:, :k_scan]
    top_s = np.take_along_axis(s, top, axis=1)
    return np.where(top_s > -np.inf, top, -1), top_s


@pytest.mark.parametrize("dtype", ["bf16", np.int8])
def test_pallas_chunked_parity_interpret(dtype):
    """Unflagged queries must select exactly the dense reference's
    top-k_scan positions (set-wise; the kernel's bf16-truncated keys
    are monotone in the reference's f32 scores)."""
    rng = np.random.default_rng(83)
    l, cap, d = 64, 128, 128
    vecs, ids, prec, scales, cents = _synthetic(rng, l, cap, d, dtype)
    b, p, k_scan = 64, 8, 48
    assert chunked_pallas_supported(
        l, cap, d, p, k_scan, np.dtype(vecs.dtype)
    )
    src = rng.integers(0, l * cap, b)
    queries = (
        np.asarray(vecs.reshape(-1, d), np.float32)[src]
        + 0.1 * rng.normal(size=(b, d)).astype(np.float32)
    )
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    q_prec = prec.reshape(-1)[src].copy()

    coarse = queries @ cents.T
    probe_ids = np.argsort(-coarse, axis=1, kind="stable")[:, :p]
    pids = jnp.asarray(probe_ids, jnp.int32)
    run_s, flat_pos, flags = ivf_chunked_scan_select(
        jnp.asarray(vecs), jnp.asarray((ids >= 0).astype(np.int8)),
        jnp.asarray(prec), jnp.asarray(scales),
        jnp.asarray(queries), jnp.asarray(q_prec), jnp.float32(2.0),
        pids, p, k_scan, 200.0, "Da", interpret=True,
    )
    want_pos, want_s = _dense_reference(
        vecs, ids, prec, scales, cents, queries, q_prec, 2.0,
        p, k_scan, 200.0, "Da",
    )
    run_s = np.asarray(run_s)
    flat_pos = np.asarray(flat_pos)
    flags = np.asarray(flags)
    n_checked = 0
    for qq in range(b):
        if flags[qq]:
            continue
        got = set(flat_pos[qq][run_s[qq] > -np.inf].tolist())
        want = set(want_pos[qq][want_pos[qq] >= 0].tolist())
        assert got == want, f"query {qq}"
        n_checked += 1
    # Most queries must certify exact.  int8 quantization makes the
    # scores discrete, so bf16-truncated boundary keys tie (and flag)
    # noticeably more often than with continuous bf16 scores -- the
    # flags stay sound either way (repair = per-query oracle).
    assert flags.mean() < 0.35, flags.mean()
    assert n_checked > len(flags) // 2


def test_pallas_chunked_tie_certificate():
    """Mass exact-duplicate vectors force boundary key ties; every
    affected query must be flagged (no silent wrong results)."""
    rng = np.random.default_rng(89)
    l, cap, d = 64, 128, 128
    vecs, ids, prec, scales, cents = _synthetic(rng, l, cap, d)
    base = vecs.reshape(-1, d)[:64]
    dup = np.tile(base, (l * cap // 64, 1)).reshape(l, cap, d)
    # 40 is NOT a multiple of the 16-copy tie-block size, so the
    # selection boundary always lands inside a block of equal keys.
    b, p, k_scan = 32, 8, 40
    queries = base[rng.choice(64, b)] + 0.01 * rng.normal(
        size=(b, d)
    ).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    coarse = queries @ cents.T
    probe_ids = np.argsort(-coarse, axis=1, kind="stable")[:, :p]
    pids = jnp.asarray(probe_ids, jnp.int32)
    _, _, flags = ivf_chunked_scan_select(
        jnp.asarray(dup, np.float32).astype(jnp.bfloat16),
        jnp.asarray((ids >= 0).astype(np.int8)),
        jnp.asarray(prec), jnp.asarray(scales),
        jnp.asarray(queries), jnp.asarray(np.zeros(b, np.float32)),
        jnp.float32(1.0), pids, p, k_scan, 0.0, "Da",
        interpret=True,
    )
    # Every probed set contains many identical-score entries at the
    # boundary: most queries must be flagged for oracle repair.
    assert np.asarray(flags).mean() > 0.8


def _assert_same_up_to_boundary_ties(got, want, want_s, qq):
    """Candidate id sets must agree except for ids whose (bf16-rounded)
    score ties the k-th boundary -- regimes tie-break those by their
    own position order (and the repair oracle ranks exact f32), so a
    boundary tie legitimately swaps which tying id is kept."""
    import ml_dtypes

    sa = set(got[got >= 0].tolist())
    sb = set(want[want >= 0].tolist())
    if sa == sb:
        return
    ws = want_s[want >= 0]
    bnd = ml_dtypes.bfloat16(ws.min())
    by_id = {int(i): s for i, s in zip(want[want >= 0], ws)}
    for i in sa ^ sb:
        s = by_id.get(i)
        assert s is None or ml_dtypes.bfloat16(s) == bnd, (
            f"query {qq}: id {i} differs beyond the tie boundary "
            f"({s} vs boundary {bnd})"
        )


def test_pallas_e2e_dispatch_forced(monkeypatch):
    """`search_device` with ANN_SOLO_TPU_CHUNKED_PALLAS=force must
    route chunked-regime searches through the fused kernel (interpret
    on CPU) and return the same candidate sets as the fullscan regime,
    including the D-padding of the device blocks."""
    from ann_solo_tpu.index import ivf as ivf_mod

    rng = np.random.default_rng(97)
    n, d, l = 5400, 128, 64  # cap lands exactly on 128
    vectors = _clustered_vectors(rng, n=n, d=d, n_clusters=16)
    prec = np.sort(rng.uniform(400, 1200, n)).astype(np.float32)
    index = IvfIndex.build(
        vectors, IvfConfig(num_list=l, num_probe=16), redundancy=1,
        precursor_mz=prec,
    )
    assert index.padded_vectors.shape[1] % 128 == 0
    b, k = 96, 32
    rows = rng.choice(n, b, replace=False)
    queries = vectors[rows] + 0.05 * rng.normal(size=(b, d)).astype(
        np.float32
    )
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    q_prec = prec[rows].copy()

    want, want_s = index.search_with_scores(
        queries, k, num_probe=16, q_prec=q_prec, charge=2.0,
        tol_val=50.0, tol_mode="Da",
    )  # fullscan regime
    monkeypatch.setattr(ivf_mod, "_FULLSCAN_TRANSIENT", 0)
    monkeypatch.setenv("ANN_SOLO_TPU_CHUNKED_PALLAS", "force")
    index._device = None  # re-upload with the chunked-regime D padding
    assert index.device_dim == 128  # d already aligned; no-op pad
    got = index.search(
        queries, k, num_probe=16, q_prec=q_prec, charge=2.0,
        tol_val=50.0, tol_mode="Da",
    )
    for qq in range(b):
        _assert_same_up_to_boundary_ties(
            got[qq], want[qq], want_s[qq], qq
        )


def test_pallas_e2e_dispatch_redundant_and_ragged_d(monkeypatch):
    """x2 redundant storage (prev-table dedup on the fused path) plus a
    D that needs device padding (100 -> 128): candidate sets must match
    the fullscan regime."""
    from ann_solo_tpu.index import ivf as ivf_mod

    rng = np.random.default_rng(101)
    n, d, l = 2700, 100, 64  # cap = 128 at R=2; d needs padding
    vectors = _clustered_vectors(rng, n=n, d=d, n_clusters=16)
    index = IvfIndex.build(
        vectors, IvfConfig(num_list=l, num_probe=16), redundancy=2,
    )
    assert index.padded_vectors.shape[1] % 128 == 0
    b, k = 64, 16
    rows = rng.choice(n, b, replace=False)
    queries = vectors[rows] + 0.05 * rng.normal(size=(b, d)).astype(
        np.float32
    )
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    want, want_s = index.search_with_scores(queries, k, num_probe=16)
    monkeypatch.setattr(ivf_mod, "_FULLSCAN_TRANSIENT", 0)
    monkeypatch.setenv("ANN_SOLO_TPU_CHUNKED_PALLAS", "force")
    index._device = None
    assert index.device_dim == 128  # ragged 100 -> 128 pad
    got = index.search(queries, k, num_probe=16)
    for qq in range(b):
        _assert_same_up_to_boundary_ties(
            got[qq], want[qq], want_s[qq], qq
        )
