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
    p, k_scan, tol_val, tol_mode, probe_override=None,
):
    """Canonical dense oracle: bf16 query x bf16 vector dots in f32,
    ranked by the CANONICAL (bf16 key desc, global position asc) order
    every search regime shares -- unflagged kernel queries must agree
    position-for-position, ties included."""
    from ann_solo_tpu.ops.ivf_scan_pallas import _key16, _key16_to_f32

    if probe_override is None:
        coarse = queries @ cents.T
        order = np.argsort(-coarse, axis=1, kind="stable")
        probes = order[:, :p]
    else:
        probes = np.asarray(probe_override)
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
    keys = np.asarray(_key16(jnp.asarray(s, jnp.float32)))
    # Stable argsort on descending keys tie-breaks by ascending flat
    # (global) position: exactly the canonical order.
    top = np.argsort(-keys, axis=1, kind="stable")[:, :k_scan]
    top_k16 = np.take_along_axis(keys, top, axis=1)
    top_s = np.asarray(_key16_to_f32(jnp.asarray(top_k16)))
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
        finite = run_s[qq] > -np.inf
        assert finite.sum() == (want_pos[qq] >= 0).sum(), f"query {qq}"
        np.testing.assert_array_equal(
            flat_pos[qq][finite],
            want_pos[qq][: finite.sum()],
            err_msg=f"query {qq}",
        )
        np.testing.assert_array_equal(
            run_s[qq][finite], want_s[qq][: finite.sum()],
            err_msg=f"query {qq} scores",
        )
        n_checked += 1
    # Boundary key ties resolve canonically by position instead of
    # flagging, so flags fire only on real CK/M truncation risk.
    # int8's discrete dots still make fat tie blocks whose tail can
    # genuinely straddle a CK cut (a cut candidate with the boundary
    # key and a smaller position could belong), so a small flag rate
    # remains honest there; bf16's continuous scores flag ~never.
    assert flags.mean() < 0.12, flags.mean()
    assert n_checked > len(flags) * 3 // 4


def test_pallas_chunked_mass_ties_resolve_canonically():
    """Mass exact-duplicate vectors force pervasive boundary key ties.
    The canonical (key desc, global position asc) ranking resolves
    them deterministically -- results must equal the canonical dense
    oracle with (almost) no certificate flags.  This is the scenario
    that sank the first certificate design: at multi-million-row scale
    the boundary ALWAYS lands in a fat bf16 bucket, and `>=`-on-keys
    certificates flagged ~100% of queries into the slow repair path
    (SCALE r4 probe: 1022/1024 repaired, 288 q/s < the 508 q/s
    per-query baseline)."""
    rng = np.random.default_rng(89)
    l, cap, d = 64, 128, 128
    vecs, ids, prec, scales, cents = _synthetic(rng, l, cap, d)
    base = vecs.reshape(-1, d)[:64]
    dup = np.tile(base, (l * cap // 64, 1)).reshape(l, cap, d)
    # 40 is NOT a multiple of the 16-copy tie-block size, so the
    # selection boundary always lands inside a block of equal keys.
    b, p, k_scan = 32, 8, 40
    all_ids = np.arange(l * cap, dtype=np.int32).reshape(l, cap)
    queries = base[rng.choice(64, b)] + 0.01 * rng.normal(
        size=(b, d)
    ).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    coarse = queries @ cents.T
    probe_ids = np.argsort(-coarse, axis=1, kind="stable")[:, :p]
    pids = jnp.asarray(probe_ids, jnp.int32)
    dup_bf = np.asarray(
        jnp.asarray(dup, np.float32).astype(jnp.bfloat16)
    )
    run_s, flat_pos, flags = ivf_chunked_scan_select(
        jnp.asarray(dup_bf),
        jnp.asarray((all_ids >= 0).astype(np.int8)),
        jnp.asarray(prec), jnp.asarray(scales),
        jnp.asarray(queries), jnp.asarray(np.zeros(b, np.float32)),
        jnp.float32(1.0), pids, p, k_scan, 0.0, "Da",
        interpret=True,
    )
    want_pos, want_s = _dense_reference(
        dup_bf, all_ids, prec, scales, cents, queries,
        np.zeros(b, np.float32), 1.0, p, k_scan, 0.0, "Da",
    )
    run_s = np.asarray(run_s)
    flat_pos = np.asarray(flat_pos)
    flags = np.asarray(flags)
    for qq in np.nonzero(~flags)[0]:
        finite = run_s[qq] > -np.inf
        np.testing.assert_array_equal(
            flat_pos[qq][finite], want_pos[qq][: finite.sum()],
            err_msg=f"query {qq}",
        )
    # Ties alone must not flag; at most the rare genuine truncation.
    assert flags.mean() < 0.2, flags.mean()
    assert (~flags).sum() > b // 2


def test_pallas_chunked_truncation_certificate():
    """A probed set whose winners concentrate in ONE chunk beyond the
    kernel's per-chunk CK budget MUST be flagged: the certificate's
    only remaining job is catching real truncation."""
    from ann_solo_tpu.ops.ivf_scan_pallas import chunked_pallas_supported

    import ml_dtypes

    rng = np.random.default_rng(91)
    l, cap, d = 64, 128, 128
    vecs, ids, prec, scales, cents = _synthetic(rng, l, cap, d)
    all_ids = np.arange(l * cap, dtype=np.int32).reshape(l, cap)
    # One "hot" list stuffed with near-clones of the query direction:
    # >CK of its entries belong in the global top-k_scan, all inside
    # one chunk -- the in-chunk top-CK cut MUST flag these queries.
    b, p, k_scan = 16, 4, 256
    assert chunked_pallas_supported(
        l, cap, d, p, k_scan, np.dtype(ml_dtypes.bfloat16)
    )
    qdir = rng.normal(size=(d,)).astype(np.float32)
    qdir /= np.linalg.norm(qdir)
    hot = qdir[None] + 0.001 * rng.normal(size=(cap, d)).astype(
        np.float32
    )
    hot /= np.linalg.norm(hot, axis=1, keepdims=True)
    vecs = vecs.copy()
    vecs[3] = hot  # list 3: 128 near-1.0 scores, one chunk
    queries = np.tile(qdir, (b, 1)) + 0.001 * rng.normal(
        size=(b, d)
    ).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    # Probe the hot list plus far-away lists with weak candidates.
    probe_ids = np.tile(
        np.array([3, 17, 33, 49], np.int32), (b, 1)
    )
    _, _, flags = ivf_chunked_scan_select(
        jnp.asarray(vecs).astype(jnp.bfloat16),
        jnp.asarray((all_ids >= 0).astype(np.int8)),
        jnp.asarray(prec), jnp.asarray(scales),
        jnp.asarray(queries), jnp.asarray(np.zeros(b, np.float32)),
        jnp.float32(1.0), jnp.asarray(probe_ids), p, k_scan,
        0.0, "Da", interpret=True,
    )
    assert np.asarray(flags).all(), (
        "CK truncation must trip the certificate"
    )

    # Hot-list hybrid: routing the stuffed list through the exact hot
    # scan instead of the kernel removes the truncation (its >CK
    # winners are scanned exactly and merged canonically) -- same
    # probed set, zero flags, results equal the canonical dense oracle.
    # k_scan shrinks to the hot list's capacity: the spike holds the
    # ENTIRE top-k, which is precisely the case the kernel's budgets
    # can never certify and the hybrid turns into zero flags.
    k_scan = cap
    hot_ids = np.tile(np.array([3], np.int32), (b, 1))
    cold_ids = np.tile(np.array([17, 33, 49], np.int32), (b, 1))
    run_s, flat_pos, flags = ivf_chunked_scan_select(
        jnp.asarray(vecs).astype(jnp.bfloat16),
        jnp.asarray((all_ids >= 0).astype(np.int8)),
        jnp.asarray(prec), jnp.asarray(scales),
        jnp.asarray(queries), jnp.asarray(np.zeros(b, np.float32)),
        jnp.float32(1.0), jnp.asarray(cold_ids), p - 1, k_scan,
        0.0, "Da", hot_ids=jnp.asarray(hot_ids), interpret=True,
    )
    assert not np.asarray(flags).any(), "hot scan must absorb the spike"
    vecs_bf = np.asarray(jnp.asarray(vecs, np.float32).astype(jnp.bfloat16))
    want_pos, want_s = _dense_reference(
        vecs_bf, all_ids, prec, scales, cents, queries,
        np.zeros(b, np.float32), 1.0, p, k_scan, 0.0, "Da",
        probe_override=probe_ids,
    )
    run_s = np.asarray(run_s)
    flat_pos = np.asarray(flat_pos)
    for qq in range(b):
        finite = run_s[qq] > -np.inf
        np.testing.assert_array_equal(
            flat_pos[qq][finite], want_pos[qq][: finite.sum()],
            err_msg=f"query {qq}",
        )
        np.testing.assert_array_equal(
            run_s[qq][finite], want_s[qq][: finite.sum()],
            err_msg=f"query {qq} scores",
        )


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
    monkeypatch.setenv("ANN_SOLO_TPU_PROBE_PALLAS", "0")  # pin fused
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
    monkeypatch.setenv("ANN_SOLO_TPU_PROBE_PALLAS", "0")  # pin fused
    index._device = None
    assert index.device_dim == 128  # ragged 100 -> 128 pad
    got = index.search(queries, k, num_probe=16)
    for qq in range(b):
        _assert_same_up_to_boundary_ties(
            got[qq], want[qq], want_s[qq], qq
        )


def test_pallas_identity_vs_perquery_tie_heavy(monkeypatch):
    """THE contract test: on tie-saturated int8 data the forced Pallas
    chunked path must return ids AND scores bit-identical to
    `_ivf_search_perquery` with (almost) no certificate repairs.

    Data is integer-quantized so every f32 dot is exactly
    representable (order-independent summation): the comparison is
    robust to contraction-shape differences between the kernel's dot
    and the oracle's einsum.  Small discrete dot values make bf16 key
    ties pervasive -- the regime that melted the first certificate
    design (SCALE r4: 1022/1024 repairs).
    """
    import jax.numpy as jnp

    from ann_solo_tpu.index import ivf as ivf_mod
    from ann_solo_tpu.index.ivf import _ivf_search_perquery

    rng = np.random.default_rng(107)
    n, d, l = 5400, 128, 64
    # int8 vectors in [-4, 4]: dot values are small integers scaled by
    # exact power-of-two scales -> massive exact ties.
    vectors = (rng.integers(-4, 5, size=(n, d)) / 8.0).astype(
        np.float32
    )
    index = IvfIndex.build(
        vectors, IvfConfig(num_list=l, num_probe=16), redundancy=1,
        storage_dtype=np.int8,
    )
    assert index.padded_vectors.shape[1] % 128 == 0
    b, k, p = 128, 32, 16
    queries = (rng.integers(-32, 33, size=(b, d)) / 64.0).astype(
        np.float32
    )

    monkeypatch.setattr(ivf_mod, "_FULLSCAN_TRANSIENT", 0)
    monkeypatch.setenv("ANN_SOLO_TPU_CHUNKED_PALLAS", "force")
    monkeypatch.setenv("ANN_SOLO_TPU_PROBE_PALLAS", "0")  # pin fused
    index._device = None
    got_ids, got_s = index.search_with_scores(
        queries, k, num_probe=p, charge=2.0,
    )
    n_flagged = index._last_chunked_flagged
    vecs_d, ids_d, prec_d, scales_d, cents_d = index.device_arrays()
    qd = jnp.asarray(queries, jnp.float32)
    dp = vecs_d.shape[-1]
    if qd.shape[-1] != dp:
        qd = jnp.pad(qd, ((0, 0), (0, dp - qd.shape[-1])))
    want_s, want_ids = _ivf_search_perquery(
        vecs_d, ids_d, prec_d, scales_d, cents_d,
        qd, jnp.zeros(b, jnp.float32), jnp.float32(2.0),
        p, k, k, 0.0, "Da", False,
    )
    np.testing.assert_array_equal(
        np.asarray(got_ids), np.asarray(want_ids)
    )
    np.testing.assert_array_equal(
        np.asarray(got_s), np.asarray(want_s)
    )
    # Ties must resolve canonically, not via the repair path.
    assert n_flagged <= b // 8, n_flagged
