"""Feature-hashed spectrum vectorization as jitted JAX ops.

Reference: ann_solo/spectrum.py:122-214 (`get_dim`, `hash_idx`,
`spectrum_to_vector`).  The reference hashes each peak's mass-bin index
string through MurmurHash3 per peak per spectrum; here the bin->bucket map
is precomputed once on the host as a lookup table (`ops.murmur.hash_bin_table`)
and vectorization becomes a gather + scatter-add over a padded peak block --
one fused XLA computation for a whole batch.
"""

from __future__ import annotations

import functools
import math
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ann_solo_tpu.ops.murmur import hash_bin_table


@functools.lru_cache(maxsize=None)
def get_dim(
    min_mz: float, max_mz: float, bin_size: float
) -> Tuple[int, float, float]:
    """Number of mass bins and the true (start, end) mass-range boundaries.

    Bit-identical to the reference `get_dim` (ann_solo/spectrum.py:122-143):
    boundaries snap to multiples of `bin_size` in float64.
    """
    min_mz, max_mz = float(min_mz), float(max_mz)
    start_dim = min_mz - min_mz % bin_size
    end_dim = max_mz + bin_size - max_mz % bin_size
    return round((end_dim - start_dim) / bin_size), start_dim, end_dim


class VectorizeTables(NamedTuple):
    """Device lookup tables for `vectorize_batch`.

    bucket : (n_bins,) int32 -- mass bin -> hashed output bucket.
    thresholds : (n_bins + 1,) float32 -- thresholds[i] is the smallest
        float32 m/z whose reference float64 bin index
        ``floor((m - start) // bin_size)`` (spectrum.py:207) is >= i.
        Binning an f32 peak is then two pure-f32 compares, bit-identical
        to the reference's float64 computation for every f32 input.
    """

    bucket: np.ndarray
    thresholds: np.ndarray


class VectorizeParams(NamedTuple):
    """Static vectorization hyperparameters."""

    min_mz: float = 11.0
    max_mz: float = 2010.0
    bin_size: float = 0.04
    hash_len: int = 800

    @classmethod
    def from_config(cls, config) -> "VectorizeParams":
        return cls(
            min_mz=float(config.min_mz),
            max_mz=float(config.max_mz),
            bin_size=float(config.bin_size),
            hash_len=int(config.hash_len),
        )

    @property
    def n_bins(self) -> int:
        return get_dim(self.min_mz, self.max_mz, self.bin_size)[0]

    @property
    def min_bound(self) -> float:
        return get_dim(self.min_mz, self.max_mz, self.bin_size)[1]

    def bin_to_hash(self) -> np.ndarray:
        """Host-side (n_bins,) int32 table: mass bin -> hashed bucket."""
        return hash_bin_table(self.n_bins, self.hash_len, seed=42)

    def tables(self) -> VectorizeTables:
        """Bucket table + exact float64 bin-edge tables (host, cached)."""
        return _tables_cached(self)

    def device_tables(self) -> VectorizeTables:
        """`tables()` as device-resident arrays (cached): repeated
        vectorize calls must not re-upload the ~0.4 MB tables."""
        return _device_tables_cached(self)


@functools.lru_cache(maxsize=None)
def _tables_cached(params: "VectorizeParams") -> VectorizeTables:
    n_bins, start, _ = get_dim(
        params.min_mz, params.max_mz, params.bin_size
    )
    bs = float(params.bin_size)
    idx = np.arange(n_bins + 1, dtype=np.float64)
    approx = (start + idx * bs).astype(np.float32)
    # The true f32 transition point of the reference's f64 floor-div lies
    # within a couple of f32 ulps of the approximate edge (the f64
    # rounding error ~1e-11 is far below one f32 ulp of any in-range m/z);
    # probe the f32 neighborhood and take the smallest candidate whose
    # reference bin index reaches i.
    cands = [approx]
    lo_c, hi_c = approx, approx
    for _ in range(3):
        lo_c = np.nextafter(lo_c, np.float32(-np.inf), dtype=np.float32)
        hi_c = np.nextafter(hi_c, np.float32(np.inf), dtype=np.float32)
        cands.extend([lo_c, hi_c])
    cands = np.stack(cands, axis=1)  # (n_bins + 1, 7) float32
    ref_bin = np.floor((cands.astype(np.float64) - start) // bs)
    reaches = ref_bin >= idx[:, None]
    assert reaches.any(axis=1).all(), "f32 edge probe window too narrow"
    thresholds = np.where(reaches, cands, np.float32(np.inf)).min(
        axis=1
    ).astype(np.float32)
    return VectorizeTables(params.bin_to_hash(), thresholds)


@functools.lru_cache(maxsize=None)
def _device_tables_cached(params: "VectorizeParams") -> VectorizeTables:
    host = _tables_cached(params)
    return VectorizeTables(
        jnp.asarray(host.bucket), jnp.asarray(host.thresholds)
    )


@partial(jax.jit, static_argnums=(0, 5))
def vectorize_batch(
    params: VectorizeParams,
    bin_to_hash: jnp.ndarray,
    mz: jnp.ndarray,
    intensity: jnp.ndarray,
    n_peaks: jnp.ndarray,
    norm: bool = True,
) -> jnp.ndarray:
    """Convert a padded peak block to hashed, L2-normalized dense vectors.

    Parameters
    ----------
    params : VectorizeParams
        Static hyperparameters (bin size, hash length, mass range).
    bin_to_hash : VectorizeTables or jnp.ndarray
        Lookup tables from `VectorizeParams.tables()` (preferred: gives
        float64-exact bin boundaries), or the bare (n_bins,) int32 bucket
        table from `bin_to_hash()` (legacy: f32 binning, boundary peaks
        within ~2e-4 m/z of a bin edge may land one bin off).
    mz, intensity : jnp.ndarray
        (B, K) padded peak arrays (invalid lanes must have intensity 0).
    n_peaks : jnp.ndarray
        (B,) per-row valid peak counts.

    Returns
    -------
    jnp.ndarray
        (B, hash_len) float32 unit-norm vectors.
    """
    b, k = mz.shape
    n_bins = params.n_bins
    lane = jnp.arange(k, dtype=jnp.int32)[None, :]
    valid = lane < n_peaks[:, None]
    mz = mz.astype(jnp.float32)
    # Reference: bin_idx = floor((mz - min_bound) // bin_size) in float64
    # (spectrum.py:207).  The f32 estimate below can be off by +-1 near a
    # bin edge; when edge tables are available the estimate is corrected
    # against the exact float64 edges (hi/lo two-float comparison).
    raw = jnp.floor(
        (mz - jnp.float32(params.min_bound)) / jnp.float32(params.bin_size)
    ).astype(jnp.int32)
    if isinstance(bin_to_hash, VectorizeTables):
        table = jnp.asarray(bin_to_hash.bucket)
        thresholds = jnp.asarray(bin_to_hash.thresholds)
        base = jnp.clip(raw, -1, n_bins)
        below = mz < thresholds[jnp.clip(base, 0, n_bins)]
        above = mz >= thresholds[jnp.clip(base + 1, 0, n_bins)]
        bin_idx = base - below.astype(jnp.int32) + above.astype(jnp.int32)
    else:
        table = bin_to_hash
        bin_idx = raw
    in_range = valid & (bin_idx >= 0) & (bin_idx < n_bins)
    bucket = table[jnp.clip(bin_idx, 0, n_bins - 1)]
    weight = jnp.where(in_range, intensity, 0.0)
    # Accumulate one peak column at a time: K fused (B, hash_len)
    # compare+FMA steps on the VPU.  (A scatter-add over (B*K) indices
    # serializes on TPU; with K <= ~100 the unrolled accumulation is far
    # faster and fuses cleanly.)
    buckets_iota = jnp.arange(params.hash_len, dtype=jnp.int32)[None, :]
    vectors = jnp.zeros((b, params.hash_len), jnp.float32)
    for peak in range(k):
        onehot = bucket[:, peak : peak + 1] == buckets_iota  # (B, H)
        vectors = vectors + jnp.where(
            onehot, weight[:, peak : peak + 1], 0.0
        )
    if norm:
        norms = jnp.sqrt(jnp.sum(vectors * vectors, axis=1, keepdims=True))
        vectors = vectors / jnp.maximum(norms, jnp.float32(1e-30))
    return vectors


def vectorize_oracle(
    params: VectorizeParams,
    mz: np.ndarray,
    intensity: np.ndarray,
    norm: bool = True,
) -> np.ndarray:
    """Scalar NumPy oracle mirroring the reference `spectrum_to_vector`.

    Computes bin indices in float64 exactly as the reference does
    (spectrum.py:198-214); used for parity tests of the jitted path.
    """
    n_bins, min_bound, _ = get_dim(
        params.min_mz, params.max_mz, params.bin_size
    )
    table = params.bin_to_hash()
    vector = np.zeros(params.hash_len, np.float32)
    for m, i in zip(np.asarray(mz, np.float64),
                    np.asarray(intensity, np.float64)):
        bin_idx = int(math.floor((m - min_bound) // params.bin_size))
        if 0 <= bin_idx < n_bins:
            vector[table[bin_idx]] += i
    if norm:
        vector /= np.linalg.norm(vector)
    return vector
