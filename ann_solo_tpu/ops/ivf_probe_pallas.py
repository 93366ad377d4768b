"""Probe-gather streaming scan Pallas kernel (TPU).

The EXACT big-library select path (reference: FAISS's IVF scan at
Kim2014 scale, ``spectral_library.py:443-446``; BASELINE.md 100M north
star).  Round-4 on-device profiling of the two earlier formulations at
the 2.1M-row operating point (B=1024, L=4096, cap=768, num_probe=64,
k=1024) forced this design:

* the fused chunked-scan kernel (``ivf_scan_pallas``) spent 2.57 s of
  a 3.69 s batch in its in-kernel iterated masked-max selection (240
  serial VPU rounds per grid step x 8192 steps), and its per-list
  truncation budgets flagged 331/1024 queries into a 1.7 ms/query
  repair path -- selection fused NEXT TO the scan is the bottleneck,
  not the scan;
* the XLA chunked scan's pooled-max selection (1.44 s) drowns in
  element gathers (~67M ``take_along_axis`` elements at the measured
  ~0.3M slices/s) and wide ``top_k`` rows;
* the XLA per-query gather scan moves the same bytes as this kernel
  but through ``lax.gather`` at ~20 GB/s (1.7 s/1024 queries).

This kernel does the OPPOSITE of the fused design: it runs NO
selection at all.  Each grid step (i, p) streams the probed list
blocks of one ``bt``-query tile at probe rank p straight from HBM
(scalar-prefetched block indices -- contiguous (cap, D) slices moved
by the pipeline emitter at DMA bandwidth, not ``lax.gather``), does
one MXU dot per (query, list) pair, applies the validity/precursor
masks, and writes raw f32 scores to a (B, num_probe * cap) block.
Total traffic is B * num_probe * cap * D bytes (~39 GB at the
operating point, ~60 ms at HBM bandwidth) -- 6x the library size, but
every byte moves at full DMA speed and the MXU/VPU work per byte is
trivial.

Selection then happens ONCE, outside, in canonical form: the score
block is cast to bf16 (the canonical key precision every search
regime shares) and a single stable ``lax.top_k`` per query selects
k_scan lanes.  Because each query's probed list ids are sorted
ASCENDING, lane order is exactly (list asc, slot asc) = global
position order, so the stable top_k IS the canonical
(key16 desc, position asc) ranking -- results are bit-identical to
``_ivf_search_perquery`` with NO truncation certificates and NO
repair path.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Per-step VMEM budget for the double-buffered vector blocks.  bt list
# blocks of (cap, D) storage bytes each, two pipeline copies, must
# leave room for the query tile, meta rows, and the output block.
_VMEM_BLOCK_BUDGET = 6 << 20
_MAX_BT = 8
# Scalar-prefetch budget: the (B, P) int32 probe table lives in SMEM
# (~1 MB/core on v5e).  At B=1024 x P=256 the operand alone is 1 MB and
# the kernel dies with RESOURCE_EXHAUSTED (round-5 2.1M quality run,
# num_probe 256); callers clamp the query tile to this budget.
_SMEM_PREFETCH_BUDGET = 512 << 10


def probe_scan_max_queries(p: int) -> int:
    """Largest power-of-two query tile whose (B, P) int32 probe table
    fits the SMEM scalar-prefetch budget."""
    cap = max(_SMEM_PREFETCH_BUDGET // max(p * 4, 1), 1)
    b = 1
    while b * 2 <= cap:
        b *= 2
    return b


def probe_scan_bt(cap: int, d: int, itemsize: int, b: int) -> int:
    """Queries per grid step (power of two; 0 = unsupported)."""
    block = cap * d * itemsize
    bt = _MAX_BT
    while bt >= 1 and bt * block * 2 > _VMEM_BLOCK_BUDGET:
        bt //= 2
    return min(bt, b) if b % max(bt, 1) == 0 else 0


def probe_scan_supported(
    l: int, cap: int, d: int, num_probe: int, k_scan: int, dtype,
    b: int,
) -> bool:
    """Whether the probe-gather kernel covers this operating point.

    f32 storage keeps exact f32 scores in the XLA regimes; the bf16
    canonical-key contract here would change them.
    """
    if dtype == np.float32:
        return False
    if cap <= 0 or d % 128:
        return False
    cap128 = -(-cap // 128) * 128  # caller zero-pads misaligned caps
    if b < 1 or b & (b - 1):
        return False  # power-of-two batch (caller pads)
    p = min(num_probe, l)
    if p < 1 or p * cap128 > (1 << 22):
        return False  # (B, P * cap) f32 score block <= 16 MB / query
    if b * p * 4 > _SMEM_PREFETCH_BUDGET:
        return False  # probe table must fit SMEM (callers shrink B)
    return probe_scan_bt(cap128, d, np.dtype(dtype).itemsize, b) >= 1


def _probe_scan_kernel(
    # probe_ref (scalar prefetch) is consumed by the index maps only.
    probe_ref,  # (B, P) int32 SMEM
    charge_ref,  # (1, 1) f32 SMEM
    q_ref,  # (1, bt, D) bf16
    qp_ref,  # (1, bt, 1) f32
    *refs,  # bt vector refs (cap, D), bt meta refs (1, 1, 3 * cap), out
    bt: int,
    cap: int,
    tol_val: float,
    tol_mode: str,
):
    # Mosaic constrains a block's trailing two dims to (8k, 128k) OR to
    # the exact array dims; bt can be < 8 (VMEM-bounded), so every
    # bt-shaped operand carries a leading singleton grid axis and keeps
    # its trailing dims equal to the array's (see ivf_probe_scan).
    out_ref = refs[-1]  # (1, 1, bt, cap)
    q = q_ref[0]  # (bt, D) bf16
    rows = []
    for j in range(bt):
        v = refs[j][:].astype(jnp.bfloat16)  # (cap, D)
        s = jax.lax.dot_general(
            q, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bt, cap) f32; only row j is this block's query
        sj = s[j : j + 1, :]  # (1, cap)
        meta = refs[bt + j][0]  # (1, 3 * cap) f32
        prec = meta[:, :cap]
        scale = meta[:, cap : 2 * cap]
        vld = meta[:, 2 * cap :]
        sj = sj * scale
        ok = vld > 0.0
        if tol_val > 0:
            qpj = qp_ref[0, j : j + 1, :]  # (1, 1)
            dm = jnp.abs(qpj - prec)
            if tol_mode == "Da":
                ok &= dm * charge_ref[0, 0] <= tol_val
            else:
                ok &= dm / jnp.maximum(prec, 1e-6) * 1e6 <= tol_val
        rows.append(jnp.where(ok, sj, -jnp.inf))
    out_ref[0, 0] = jnp.concatenate(rows, axis=0)  # (bt, cap) f32


def ivf_probe_scan(
    padded_vectors,  # (L, cap, D) int8/bf16, cap % 128 == D % 128 == 0
    meta,  # (L, 3 * cap) f32: [precursor | dequant scale | valid]
    queries,  # (B, D) f32, B a power of two
    q_prec,  # (B,) f32
    charge,  # () f32
    probe_ids,  # (B, P) int32 probed list ids, sorted ascending per row
    tol_val: float,
    tol_mode: str,
    interpret: bool = False,
):
    """Raw masked scores of every (query, probed list) pair.

    Returns a (B, P * cap) f32 block in (probe-rank, slot) lane order;
    masked/invalid slots carry -inf.  Call inside a jit (not jitted
    itself).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    l, cap, d = padded_vectors.shape
    b, p = probe_ids.shape
    bt = probe_scan_bt(cap, d, padded_vectors.dtype.itemsize, b)
    if bt < 1:
        raise ValueError("unsupported probe-scan operating point")

    # bt-shaped blocks with bt < 8 violate Mosaic's (8, 128) trailing-
    # dim rule unless the block dims EQUAL the array dims, so the
    # query/meta/out arrays are reshaped with a leading grid axis and
    # full-array trailing dims (see kernel comment).
    q_bf = queries.astype(jnp.bfloat16).reshape(b // bt, bt, d)
    qp3 = q_prec.astype(jnp.float32).reshape(b // bt, bt, 1)
    charge2 = jnp.asarray(charge, jnp.float32).reshape(1, 1)
    vecs_flat = padded_vectors.reshape(l * cap, d)
    meta3 = meta.reshape(l, 1, 3 * cap)

    def block_im(j):
        def im(i, pp, probe_ref):
            return (probe_ref[i * bt + j, pp], 0)

        return im

    def meta_im(j):
        def im(i, pp, probe_ref):
            return (probe_ref[i * bt + j, pp], 0, 0)

        return im

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # charge
        pl.BlockSpec((1, bt, d), lambda i, pp, pr: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bt, 1), lambda i, pp, pr: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for j in range(bt):
        in_specs.append(
            pl.BlockSpec((cap, d), block_im(j), memory_space=pltpu.VMEM)
        )
    for j in range(bt):
        in_specs.append(
            pl.BlockSpec((1, 1, 3 * cap), meta_im(j),
                         memory_space=pltpu.VMEM)
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // bt, p),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, bt, cap), lambda i, pp, pr: (i, pp, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    kernel = partial(
        _probe_scan_kernel,
        bt=bt, cap=cap, tol_val=tol_val, tol_mode=tol_mode,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b // bt, p, bt, cap),
                                       jnp.float32),
        interpret=interpret,
    )(
        probe_ids.astype(jnp.int32), charge2, q_bf, qp3,
        *([vecs_flat] * bt), *([meta3] * bt),
    )
    # (b//bt, p, bt, cap) -> (B, P * cap) in (probe-rank, slot) order.
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(b, p * cap)
