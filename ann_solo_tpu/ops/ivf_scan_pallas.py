"""Fused IVF chunked-scan + selection Pallas kernel (TPU).

The big-library select regime (reference: FAISS's fused IVF scan at
Kim2014 scale, ``spectral_library.py:443-446``; BASELINE.md 100M north
star).  Round-4 on-device measurements drove every choice here:

* XLA ``lax.gather`` on this backend moves ~0.3M slices/sec regardless
  of slice size or tile alignment (64 B and tile-aligned 2 kB slices
  both measured ~3 s for 1M slices), so ANY selection design that
  gathers member scores back out of an HBM score block is dead.
* Wide ``lax.top_k`` runs at ~2 ns/element at k~1024 (dtype makes no
  difference), so selection must never see the raw score tensor.
* Only reductions fused next to the einsum are free, and XLA refuses
  to fuse an iterated masked-max chain into the einsum epilogue (a
  4-rank chain measured +122 ms over the fused single-max epilogue).

The fix is one Pallas kernel that never materializes scores in HBM:
each grid step computes a (BT, C * cap) score tile ON-CHIP (MXU dot),
masks it (probe bitmap, id validity, fused precursor window), packs
scores into monotone int32 sort keys ``key16 << pos_bits | pos`` (the
bf16-truncation order of the f32 score -- rounding is MONOTONE, so any
disagreement with the exact-f32 oracle ranking needs an exact key tie
at the selection boundary, which the certificates flag), and runs the
whole hierarchical selection in VMEM with iterated masked-max (packed
values are distinct by construction, so equality-masking removes
exactly one lane per round):

  per-supergroup (SG slots) top-M  ->  chunk-local top-CK

The kernel emits one 128-lane int32 row per (query, chunk):
``[top-CK candidates | per-supergroup M-th-rank keys | -1 pads]``.

Stage 2 (XLA) exploits a pigeonhole fact: a query's winners live in
its <= num_probe probed lists, so at most num_probe chunks per query
hold ANY finite candidate -- selecting the top-num_probe chunks by
their max candidate (lane 0) is EXACT, not heuristic.  One small
row-gather of the selected chunks' 512-byte rows + one narrow top-k
finishes; candidate positions decode arithmetically from the packed
values (zero gathers on the hot path).

Exactness contract: per-query results equal ``_ivf_search_perquery``
(modulo bf16-boundary ties) for every query whose ``flags`` entry is
False; flagged queries are repaired by the caller through the
per-query oracle.  Flag sources: boundary key ties, a chunk's CK-th
candidate at/above the boundary (a CK+1-th could cross), or a
supergroup's M-th rank at/above the boundary (an M+1-th could cross).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

SG = 256  # supergroup width (slots) for the in-kernel first level
M_RANKS = 24  # candidates kept per supergroup
CK = 96  # candidates kept per (query, chunk)
LANES = 128  # output lanes per (query, chunk)
HOT_LISTS = 8  # per-query lists scanned exactly outside the kernel
_NEG = -1  # packed sentinel below every real candidate
_KEY_NEG_INF = 127  # _key16(-inf); every finite score maps above


def _pick_chunk_lists(l: int, cap: int) -> int:
    """Lists per kernel step: C * cap <= 2048 slots, C divides L."""
    c = 1
    for cand in (16, 8, 4, 2):
        if l % cand == 0 and cand * cap <= 2048:
            c = cand
            break
    return c


def hot_list_count(p: int) -> int:
    """Hot (exactly-scanned) lists per query for a probe count ``p``.

    IVF data is clustered by construction, so a query's best few coarse
    lists hold far more of its top-k_scan than any fixed per-list
    truncation budget: at the 2.1M-row operating point (num_probe=64,
    k_scan=1024) the densest supergroup holds ~26-37 of the top-1024
    (vs the kernel's M per 256 slots) and the densest chunk up to ~81
    (vs CK), so budget-only designs flag ~98% of queries into the
    repair path (measured 1006/1024, 294 q/s -- slower than no kernel
    at all).  Scanning each query's top-``HOT_LISTS`` lists exactly
    (gather + XLA einsum) and running the kernel only on the cold tail
    drops the measured overflow rate to 0/128 at M=24/CK=96.  Small
    probe counts keep everything in the kernel: the boundary sits high
    enough that the budgets cover it.
    """
    return HOT_LISTS if p >= 2 * HOT_LISTS else 0


def chunked_pallas_supported(
    l: int, cap: int, d: int, num_probe: int, k_scan: int, dtype
) -> bool:
    """Whether the fused kernel covers this operating point.

    Falls back to the XLA chunked scan otherwise (f32 storage keeps
    exact f32 scores there; tiny/ragged shapes aren't worth a kernel).
    """
    if dtype == np.float32:
        return False  # bf16 MXU dot would change f32-storage scores
    if cap % 128 or cap <= 0:
        return False
    c = _pick_chunk_lists(l, cap)
    cw = c * cap
    if cw % SG or cw > 4096:
        return False
    npc = cw // SG
    if CK + npc > LANES:
        return False
    p = min(num_probe, l)
    h = hot_list_count(p)
    n_chunks = l // c
    if (p - h) * CK + h * cap < k_scan:
        return False  # cannot surface k_scan candidates
    if (cw - 1).bit_length() + 16 > 31:
        return False  # packed key16|pos must fit an int32
    return n_chunks >= 2


def _key16(s):
    """Monotone 16-bit sort key of an f32 score.

    Key equality is EXACTLY bf16 round-to-nearest-even equality (the
    same ``astype(jnp.bfloat16)`` rounding the XLA scan regimes apply
    to their stored scores), so the fused path ranks identically to
    them and the boundary-tie certificates fire on the same ties.
    """
    u = jax.lax.bitcast_convert_type(s, jnp.int32)
    rne = u + 0x7FFF + (jax.lax.shift_right_logical(u, 16) & 1)
    b16 = jax.lax.shift_right_logical(rne, 16)
    # -inf rounds to -inf (0xFF80) -- the +0x7FFF stays within the
    # same 16-bit prefix for every infinity/extreme input we can see.
    return jnp.where(u < 0, 0xFFFF - b16, b16 | 0x8000)


def _key16_to_f32(k16):
    """Inverse of `_key16` (the bf16-rounded score value)."""
    b16 = jnp.where(k16 < 0x8000, 0xFFFF - k16, k16 - 0x8000)
    return jax.lax.bitcast_convert_type(
        jax.lax.shift_left(b16, 16), jnp.float32
    )


def _scan_kernel(
    charge_ref,  # (1, 1) f32 SMEM
    q_ref,  # (BT, D) bf16
    qp_ref,  # (BT, 1) f32
    vec_ref,  # (CW, D) storage dtype (row block of the flat slots)
    pe_ref,  # (BT, LANES) int8 chunk probe mask (lane ci = list j*c+ci)
    valid_ref,  # (1, CW) int8
    prec_ref,  # (1, CW) f32
    scale_ref,  # (1, CW) f32
    out_ref,  # (BT, LANES) int32
    *,
    bt: int,
    c: int,
    cap: int,
    pos_bits: int,
    tol_val: float,
    tol_mode: str,
):
    # EVERYTHING here is strictly 2-D with static lane-aligned slices
    # -- Mosaic's vector-layout inference rejects 3-D broadcasts and
    # sub-lane reshapes (the same constraint that shaped the proven
    # shifted-dot kernel; its greedy masked-max loop is the template
    # for both selection levels below).
    cw = c * cap
    npc = cw // SG
    q = q_ref[:]
    v = vec_ref[:].astype(jnp.bfloat16)  # (CW, D)
    s = jax.lax.dot_general(
        q, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (BT, CW) f32
    s = s * scale_ref[:]  # (1, CW) broadcasts
    # Probe mask: lane ci of pe_ref says whether list j*c+ci is probed;
    # expand to slot granularity with c unrolled 2-D compares.
    col_list = jax.lax.broadcasted_iota(jnp.int32, (1, cw), 1) // cap
    pe32 = pe_ref[:].astype(jnp.int32)  # int8 compares are unsupported
    ok = jnp.zeros((bt, cw), bool)
    for ci in range(c):
        ok |= (pe32[:, ci : ci + 1] > 0) & (col_list == ci)
    ok &= valid_ref[:].astype(jnp.int32) > 0
    if tol_val > 0:
        prec = prec_ref[:]  # (1, CW)
        qp = qp_ref[:]  # (BT, 1)
        if tol_mode == "Da":
            ok &= jnp.abs(qp - prec) * charge_ref[0, 0] <= tol_val
        else:
            ok &= (
                jnp.abs(qp - prec) / jnp.maximum(prec, 1e-6) * 1e6
                <= tol_val
            )
    s = jnp.where(ok, s, -jnp.inf)
    key = _key16(s)
    # INVERTED local position in the low bits: larger packed value ==
    # (larger key, SMALLER slot) -- the in-chunk masked-max order is
    # then exactly the canonical (key16 desc, global position asc)
    # ranking every search regime shares, so boundary ties resolve
    # identically to the per-query oracle instead of being flagged.
    inv_pos = (cw - 1) - jax.lax.broadcasted_iota(
        jnp.int32, (bt, cw), 1
    )
    packed = jax.lax.shift_left(key, pos_bits) | inv_pos

    # Level 1: per-supergroup top-M by iterated masked-max over static
    # SG-aligned lane slices.  Packed values are distinct (pos bits),
    # so each equality mask removes exactly one lane.
    ranks = []  # M_RANKS x npc pieces of (BT, 1), rank-major
    lasts = []  # npc pieces: each supergroup's M-th rank
    for g in range(npc):
        cur = packed[:, g * SG : (g + 1) * SG]
        for r in range(M_RANKS):
            m = jnp.max(cur, axis=1, keepdims=True)  # (BT, 1)
            ranks.append(m)
            cur = jnp.where(cur == m, jnp.int32(_NEG), cur)
        lasts.append(ranks[-1])
    sgc = jnp.concatenate(ranks, axis=1)  # (BT, NPC * M)
    v_last = jnp.concatenate(lasts, axis=1)  # (BT, NPC)

    # Level 2: chunk-local top-CK (descending -- lane 0 is the chunk
    # max, which stage 2's pigeonhole chunk selection keys on).
    cur2 = sgc
    keep = []
    for _ in range(CK):
        m = jnp.max(cur2, axis=1, keepdims=True)  # (BT, 1)
        keep.append(m)
        cur2 = jnp.where(cur2 == m, jnp.int32(_NEG), cur2)
    top = jnp.concatenate(keep, axis=1)  # (BT, CK)

    pad = jnp.full((bt, LANES - CK - npc), _NEG, jnp.int32)
    out_ref[:] = jnp.concatenate([top, v_last, pad], axis=1)


_HOT_TILE = 64  # queries per hot-scan map step (bounds the gather block)


def _hot_scan(
    padded_vectors, padded_valid, padded_prec, padded_scales,
    queries, q_prec, charge, hot_ids, k_hot: int,
    tol_val: float, tol_mode: str,
):
    """Exact canonical scan of each query's hot lists (XLA).

    Gathers the (H, cap, D) blocks of the per-query hot lists (sorted
    ASCENDING, so the flattened lane order is global-position order)
    and selects the canonical top-``k_hot`` -- a stable ``top_k`` over
    ``_key16`` keys.  One library-fraction of gather traffic per batch
    (B*H slices), bounded by ``_HOT_TILE``-query map steps.

    Returns ``(keys, flat_pos)``: (B, k_hot) int32 bf16-keys and global
    positions; under-filled lanes carry keys <= `_KEY_NEG_INF`.
    """
    l, cap, d = padded_vectors.shape
    b, h = hot_ids.shape
    tile = min(b, _HOT_TILE)

    def tile_fn(inp):
        hids, q, qp = inp  # (T, H), (T, D), (T,)
        vecs = padded_vectors[hids].astype(jnp.bfloat16)  # (T,H,cap,D)
        s = jnp.einsum(
            "td,thcd->thc", q.astype(jnp.bfloat16), vecs,
            preferred_element_type=jnp.float32,
        )
        s = s * padded_scales[hids]
        ok = padded_valid[hids] > 0
        if tol_val > 0:
            prec = padded_prec[hids]  # (T, H, cap)
            dm = jnp.abs(qp[:, None, None] - prec)
            if tol_mode == "Da":
                ok &= dm * charge <= tol_val
            else:
                ok &= dm / jnp.maximum(prec, 1e-6) * 1e6 <= tol_val
        flat = jnp.where(ok, s, -jnp.inf).reshape(-1, h * cap)
        keys = _key16(flat)
        top_keys, pos = jax.lax.top_k(keys, k_hot)  # stable: canonical
        fp = (
            hids[:, :, None] * cap
            + jax.lax.broadcasted_iota(jnp.int32, (hids.shape[0], h, cap), 2)
        ).reshape(-1, h * cap)
        top_pos = jnp.take_along_axis(fp, pos, axis=1)
        return top_keys, top_pos

    if tile == b:
        return tile_fn((hot_ids, queries, q_prec))
    keys, pos = jax.lax.map(
        tile_fn,
        (
            hot_ids.reshape(-1, tile, h),
            queries.reshape(-1, tile, queries.shape[1]),
            q_prec.reshape(-1, tile),
        ),
    )
    return keys.reshape(b, -1), pos.reshape(b, -1)


@partial(
    jax.jit,
    static_argnames=(
        "num_probe", "k_scan", "tol_val", "tol_mode", "interpret"
    ),
)
def ivf_chunked_scan_select(
    padded_vectors,  # (L, cap, Dp) int8/bf16, Dp % 128 == 0
    padded_valid,  # (L, cap) int8 (ids >= 0)
    padded_prec,  # (L, cap) f32
    padded_scales,  # (L, cap) f32
    queries,  # (B, Dp) f32, B a power of two
    q_prec,  # (B,) f32
    charge,  # () f32
    probe_ids,  # (B, P) int32 COLD probed list ids, sorted ascending
    num_probe: int,  # cold probe count P
    k_scan: int,
    tol_val: float,
    tol_mode: str,
    hot_ids=None,  # (B, H) int32 hot list ids, sorted ascending
    interpret: bool = False,
):
    """Fused chunked scan + exact selection (+ hot-list hybrid).

    ``probe_ids`` holds each query's COLD probed lists (kernel path,
    per-list truncation budgets + certificates); ``hot_ids`` -- when
    given -- holds its top-``hot_list_count`` coarse lists, scanned
    EXACTLY by `_hot_scan` and merged canonically, so the kernel's
    budgets only face the flat cold tail (see `hot_list_count` for the
    measurements that forced the split).  Hot and cold sets must be
    disjoint per query.

    Returns ``(scores, flat_pos, flags)``: (B, k_eff) f32 scores at
    bf16-truncation precision, (B, k_eff) int32 flat positions
    (list * cap + slot; -1-score rows carry arbitrary positions and
    must be masked by score), and (B,) bool inexactness flags.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    l, cap, d = padded_vectors.shape
    b = queries.shape[0]
    c = _pick_chunk_lists(l, cap)
    cw = c * cap
    npc = cw // SG
    n_chunks = l // c
    pos_bits = (cw - 1).bit_length()
    bt = min(256, b)
    p_sel = min(num_probe, l, n_chunks)

    q_bf = queries.astype(jnp.bfloat16)
    qp2 = q_prec[:, None].astype(jnp.float32)
    charge2 = jnp.asarray(charge, jnp.float32).reshape(1, 1)
    # Chunk-expanded probe mask: lane ci of chunk j's 128-lane row says
    # whether list j*c+ci is probed (built scatter-free; Mosaic cannot
    # block a (BT, c) bitmap slice, but a (BT, LANES) row per chunk is
    # layout-legal and costs c unrolled compares in-kernel).
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, l, 1), 1)
    probed = jnp.any(
        probe_ids.astype(jnp.int32)[:, None, :] == iota_l, axis=-1
    )  # (B, L) bool
    pe = jnp.pad(
        probed.reshape(b, n_chunks, c).astype(jnp.int8),
        ((0, 0), (0, 0), (0, LANES - c)),
    ).reshape(b, n_chunks * LANES)
    # Flat-slot layouts keep every blocked dimension lane-aligned
    # (cw = c * cap is a multiple of 128); the reshapes are row-major
    # reinterpretations of the resident blocks, not copies.
    vecs_flat = padded_vectors.reshape(l * cap, d)
    valid_flat = padded_valid.reshape(1, l * cap)
    prec_flat = padded_prec.reshape(1, l * cap)
    scales_flat = padded_scales.reshape(1, l * cap)

    kernel = partial(
        _scan_kernel,
        bt=bt, c=c, cap=cap, pos_bits=pos_bits,
        tol_val=tol_val, tol_mode=tol_mode,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b // bt, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((bt, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cw, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, LANES), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cw), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cw), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cw), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bt, LANES), lambda i, j: (i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_chunks * LANES), jnp.int32),
        interpret=interpret,
    )(
        charge2, q_bf, qp2, vecs_flat, pe,
        valid_flat, prec_flat, scales_flat,
    )

    out3 = out.reshape(b, n_chunks, LANES)
    # Pigeonhole chunk selection: winners live in probed lists, and
    # <= num_probe chunks hold any probed list, so the top num_probe
    # chunks by max candidate (lane 0) contain EVERY finite candidate
    # (an exact set cover -- tie order among selected chunks cannot
    # matter).  The selected ids are then re-sorted ASCENDING so the
    # gathered lanes are chunk-ascending-major; with the in-chunk
    # (key desc, slot asc) packing, a STABLE top_k over the bare keys
    # ranks candidates in the canonical (key16 desc, global position
    # asc) order every search regime shares.
    chunk_max = out3[:, :, 0]
    _, chunk_sel = jax.lax.top_k(chunk_max, p_sel)  # (B, P)
    chunk_sel = jnp.sort(chunk_sel, axis=1)
    bi = jnp.arange(b, dtype=jnp.int32)[:, None]
    blk = out3[bi, chunk_sel]  # (B, P, LANES) 512-byte row gather
    cands = blk[:, :, :CK].reshape(b, p_sel * CK)
    pos_mask = (1 << pos_bits) - 1
    cand_keys = jnp.where(
        cands > _NEG,
        jax.lax.shift_right_logical(cands, pos_bits),
        jnp.int32(_NEG),
    )
    # lax.top_k is stable (equal keys keep ascending lane order), so
    # this IS the canonical selection -- exact over the gathered set.
    k_cold = min(k_scan, p_sel * CK)
    key_c, p_idx = jax.lax.top_k(cand_keys, k_cold)
    run_packed = jnp.take_along_axis(cands, p_idx, axis=1)
    pos_in = (cw - 1) - (run_packed & pos_mask)
    chunk_rank = p_idx // CK
    chunk_id = jnp.take_along_axis(chunk_sel, chunk_rank, axis=1)
    pos_c = chunk_id * cw + pos_in

    if hot_ids is not None:
        # Hot lists: exact scan, then a canonical two-key merge --
        # (key desc, global position asc) via lexicographic lax.sort on
        # (-key, pos).  Hot and cold positions are disjoint, and both
        # inputs already carry canonical (key, pos) pairs, so the
        # merged prefix IS the canonical top-k_eff over the full probe
        # set -- identical to the per-query oracle wherever the cold
        # certificate holds.
        h = hot_ids.shape[1]
        k_hot = min(k_scan, h * cap)
        key_h, pos_h = _hot_scan(
            padded_vectors, padded_valid, padded_prec, padded_scales,
            queries, q_prec, charge, hot_ids, k_hot, tol_val, tol_mode,
        )
        k_eff = min(k_scan, k_cold + k_hot)
        neg = -jnp.concatenate([key_c, key_h], axis=1)
        pos_m = jnp.concatenate([pos_c, pos_h], axis=1)
        neg_s, pos_s = jax.lax.sort((neg, pos_m), num_keys=2)
        key_o = -neg_s[:, :k_eff]
        flat_pos = pos_s[:, :k_eff]
    else:
        k_eff = k_cold
        key_o, flat_pos = key_c, pos_c
    scores = _key16_to_f32(key_o)
    scores = jnp.where(key_o > _KEY_NEG_INF, scores, -jnp.inf)

    # Truncation certificates at canonical (key, pos) granularity,
    # against the MERGED selection boundary (hot candidates raise it,
    # which is most of the hybrid's win).  The gathered/merged top_k is
    # exact, so a candidate can only be lost at the in-chunk CK cut or
    # the per-supergroup M cut -- and the first victim of either cut
    # sits canonically AFTER that cut's last survivor.  A cut can
    # therefore reach into the kept set only when its last survivor
    # sits STRICTLY before the boundary (key > boundary key, or equal
    # key and smaller global position).  Plain bf16 boundary key ties
    # do not flag: they resolve by position exactly as the per-query
    # oracle does (the round-4 `>=`-on-keys form flagged ~100% of
    # multi-million-row queries -- the k-th place always lands in a fat
    # bf16 bucket).
    kb = key_o[:, -1:]  # boundary key (sentinel when under-filled)
    pb = flat_pos[:, -1:]  # boundary global position

    ck_last = blk[:, :, CK - 1]  # (B, P) packed chunk CK-th rank
    ck_key = jax.lax.shift_right_logical(ck_last, pos_bits)
    ck_pos = chunk_sel * cw + ((cw - 1) - (ck_last & pos_mask))
    flags = jnp.any(
        (ck_last > _NEG)
        & (ck_key > _KEY_NEG_INF)
        & ((ck_key > kb) | ((ck_key == kb) & (ck_pos < pb))),
        axis=1,
    )
    vl = blk[:, :, CK : CK + npc]  # (B, P, NPC) supergroup M-th rank
    vl_key = jax.lax.shift_right_logical(vl, pos_bits)
    vl_pos = chunk_sel[:, :, None] * cw + ((cw - 1) - (vl & pos_mask))
    flags |= jnp.any(
        (vl > _NEG)
        & (vl_key > _KEY_NEG_INF)
        & (
            (vl_key > kb[:, :, None])
            | ((vl_key == kb[:, :, None]) & (vl_pos < pb[:, :, None]))
        ),
        axis=(1, 2),
    )
    return scores, flat_pos, flags
