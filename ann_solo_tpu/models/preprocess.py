"""Batched, jitted spectrum preprocessing.

TPU-native re-design of the reference preprocessing pipeline
(ann_solo/spectrum.py:57-119 `process_spectrum`, which chains
spectrum_utils' set_mz_range / round / remove_precursor_peak /
filter_intensity / scale_intensity and an L2 norm): instead of mutating one
spectrum object at a time, the whole pipeline runs as masked array ops over a
padded `(batch, max_peaks)` block, jitted once per shape.  Validity gates
(min_peaks / min_mz_range after every destructive step) become boolean
reductions along the peak axis.

Output is a compacted `(batch, max_peaks_used)` block, peaks sorted by m/z,
intensities scaled (rank or sqrt) and L2-normalized -- ready for both
vectorization (hashing) and the shifted-dot rescoring kernel.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ann_solo_tpu.io.masses import NEUTRON, PROTON

_NEG_INF = jnp.float32(-jnp.inf)
_POS_INF = jnp.float32(jnp.inf)


class PreprocessParams(NamedTuple):
    """Static preprocessing hyperparameters (hashable -> static jit arg)."""

    min_peaks: int = 10
    min_mz_range: float = 250.0
    min_mz: float = 11.0
    max_mz: float = 2010.0
    resolution: Optional[int] = None
    remove_precursor: bool = False
    remove_precursor_tolerance: float = 0.0
    min_intensity: float = 0.01
    max_peaks_used: int = 50
    scaling: Optional[str] = "rank"
    # Static unroll bound for reduced-charge precursor-peak removal
    # (spectrum_utils iterates 1..precursor_charge; a jitted pipeline
    # needs a compile-time bound).  Charges above this are masked out
    # per row, so only precursors with charge > 16 -- outside any
    # spectral-library workflow -- would diverge from the reference.
    max_removal_charge: int = 16

    @classmethod
    def from_config(cls, config, is_library: bool) -> "PreprocessParams":
        return cls(
            min_peaks=config.min_peaks,
            min_mz_range=float(config.min_mz_range),
            min_mz=float(config.min_mz),
            max_mz=float(config.max_mz),
            resolution=config.resolution,
            remove_precursor=bool(config.remove_precursor),
            remove_precursor_tolerance=float(
                config.remove_precursor_tolerance
            ),
            min_intensity=float(config.min_intensity),
            max_peaks_used=(
                config.max_peaks_used_library
                if is_library
                else config.max_peaks_used
            ),
            scaling=config.scaling,
        )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ProcessedBatch:
    """Preprocessed spectra: compacted, scaled, normalized peak blocks."""

    mz: jnp.ndarray  # (B, K) float32, ascending per row, 0-padded
    intensity: jnp.ndarray  # (B, K) float32, L2-normalized, 0-padded
    ann_charge: jnp.ndarray  # (B, K) int32
    n_peaks: jnp.ndarray  # (B,) int32
    precursor_mz: jnp.ndarray  # (B,) float32
    precursor_charge: jnp.ndarray  # (B,) int32
    is_valid: jnp.ndarray  # (B,) bool

    def tree_flatten(self):
        return (
            (self.mz, self.intensity, self.ann_charge, self.n_peaks,
             self.precursor_mz, self.precursor_charge, self.is_valid),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        del aux
        return cls(*children)

    def __getitem__(self, idx) -> "ProcessedBatch":
        """Row-subset (NumPy-style indexing on the batch axis)."""
        return ProcessedBatch(
            self.mz[idx], self.intensity[idx], self.ann_charge[idx],
            self.n_peaks[idx], self.precursor_mz[idx],
            self.precursor_charge[idx], self.is_valid[idx],
        )

    @property
    def batch_size(self) -> int:
        return self.mz.shape[0]

    def to_numpy(self) -> "ProcessedBatch":
        return ProcessedBatch(*(np.asarray(x) for x in dataclasses.astuple(
            self)))


def _check_valid(valid, mz, min_peaks, min_mz_range):
    """Quality gate (reference spectrum.py:14-36 `_check_spectrum_valid`)."""
    count = jnp.sum(valid, axis=1)
    mn = jnp.min(jnp.where(valid, mz, _POS_INF), axis=1)
    mx = jnp.max(jnp.where(valid, mz, _NEG_INF), axis=1)
    return (count >= min_peaks) & ((mx - mn) >= min_mz_range)


def _peak_rank_desc(intensity, valid):
    """0-based rank of each peak by descending intensity (stable ties)."""
    b, p = intensity.shape
    key = jnp.where(valid, intensity, _NEG_INF)
    order = jnp.argsort(-key, axis=1, stable=True)  # (B, P) peak indices
    ranks = jnp.zeros((b, p), jnp.int32)
    rows = jnp.arange(b)[:, None]
    return ranks.at[rows, order].set(
        jnp.broadcast_to(jnp.arange(p, dtype=jnp.int32), (b, p))
    )


@partial(jax.jit, static_argnums=0)
def preprocess_batch(
    params: PreprocessParams,
    mz: jnp.ndarray,
    intensity: jnp.ndarray,
    ann_charge: jnp.ndarray,
    n_peaks: jnp.ndarray,
    precursor_mz: jnp.ndarray,
    precursor_charge: jnp.ndarray,
) -> ProcessedBatch:
    """Run the full preprocessing pipeline on a padded batch.

    Follows the exact step order and validity gating of the reference
    `process_spectrum` (ann_solo/spectrum.py:57-119).
    """
    b, p = mz.shape
    mz = mz.astype(jnp.float32)
    intensity = intensity.astype(jnp.float32)
    ann_charge = ann_charge.astype(jnp.int32)
    lane = jnp.arange(p, dtype=jnp.int32)[None, :]
    valid = lane < n_peaks[:, None]

    # 1) Restrict the m/z range (inclusive bounds).
    valid &= (mz >= params.min_mz) & (mz <= params.max_mz)
    is_valid = _check_valid(valid, mz, params.min_peaks, params.min_mz_range)

    # 2) Optional resolution rounding with intensity summing.
    if params.resolution is not None:
        scale = jnp.float32(10.0 ** params.resolution)
        mz = jnp.round(mz * scale) / scale
        # Merge duplicate m/z runs: rows are m/z-sorted, so equal rounded
        # values are adjacent.  Sum each run's intensity into its first lane.
        key = jnp.where(valid, mz, _POS_INF)
        order = jnp.argsort(key, axis=1, stable=True)
        rows = jnp.arange(b)[:, None]
        mz_s = jnp.take_along_axis(mz, order, axis=1)
        int_s = jnp.take_along_axis(intensity, order, axis=1)
        ann_s = jnp.take_along_axis(ann_charge, order, axis=1)
        val_s = jnp.take_along_axis(valid, order, axis=1)
        same = jnp.concatenate(
            [jnp.zeros((b, 1), bool),
             (mz_s[:, 1:] == mz_s[:, :-1]) & val_s[:, 1:] & val_s[:, :-1]],
            axis=1,
        )
        run_id = jnp.cumsum((~same).astype(jnp.int32), axis=1) - 1  # (B, P)
        # Per-row segment sum of intensities by run id.
        flat_id = (run_id + (jnp.arange(b) * p)[:, None]).reshape(-1)
        sums = jax.ops.segment_sum(
            jnp.where(val_s, int_s, 0.0).reshape(-1), flat_id,
            num_segments=b * p,
        ).reshape(b, p)
        int_merged = jnp.take_along_axis(sums, run_id, axis=1)
        keep = val_s & ~same
        mz, intensity, ann_charge = mz_s, jnp.where(keep, int_merged, 0.0), \
            ann_s
        valid = keep
        del rows
        is_valid &= _check_valid(
            valid, mz, params.min_peaks, params.min_mz_range
        )

    # 3) Remove peaks around the precursor m/z (isotopes 0..2 at every
    #    reduced charge 1..precursor_charge; reference spectrum.py:90-92 /
    #    spectrum_utils remove_precursor_peak(tol, "Da", isotope=2)).
    if params.remove_precursor:
        prec_charge = jnp.maximum(precursor_charge, 1).astype(jnp.float32)
        neutral = (
            precursor_mz.astype(jnp.float32) - jnp.float32(PROTON)
        ) * prec_charge  # (B,)
        near = jnp.zeros_like(valid)
        for c in range(1, params.max_removal_charge + 1):
            active = (jnp.float32(c) <= prec_charge)[:, None]
            for iso in range(3):
                target = (
                    (neutral + jnp.float32(iso * NEUTRON)) / jnp.float32(c)
                    + jnp.float32(PROTON)
                )[:, None]
                near |= active & (
                    jnp.abs(mz - target)
                    <= params.remove_precursor_tolerance
                )
        valid &= ~near
        is_valid &= _check_valid(
            valid, mz, params.min_peaks, params.min_mz_range
        )

    # 4) Intensity filtering: relative noise floor + top-N peaks.
    max_int = jnp.max(jnp.where(valid, intensity, _NEG_INF), axis=1)
    valid &= intensity > params.min_intensity * max_int[:, None]
    rank = _peak_rank_desc(intensity, valid)
    valid &= rank < params.max_peaks_used
    is_valid &= _check_valid(valid, mz, params.min_peaks, params.min_mz_range)

    # 5) Intensity scaling.
    if params.scaling in ("sqrt", "root"):
        intensity = jnp.sqrt(jnp.maximum(intensity, 0.0))
    elif params.scaling == "rank":
        rank = _peak_rank_desc(intensity, valid)
        intensity = (params.max_peaks_used - rank).astype(jnp.float32)
    elif params.scaling is not None:
        raise ValueError(f"Unknown scaling: {params.scaling}")

    # 6) L2 normalization over the remaining peaks.
    intensity = jnp.where(valid, intensity, 0.0)
    norm = jnp.sqrt(jnp.sum(intensity * intensity, axis=1, keepdims=True))
    intensity = intensity / jnp.maximum(norm, jnp.float32(1e-30))

    # 7) Compact: surviving peaks to the front, sorted by m/z.
    k = params.max_peaks_used
    key = jnp.where(valid, mz, _POS_INF)
    order = jnp.argsort(key, axis=1, stable=True)[:, :k]
    rows = jnp.arange(b)[:, None]
    out_valid = jnp.take_along_axis(valid, order, axis=1)
    out_mz = jnp.where(out_valid, jnp.take_along_axis(mz, order, axis=1), 0.0)
    out_int = jnp.where(
        out_valid, jnp.take_along_axis(intensity, order, axis=1), 0.0
    )
    out_ann = jnp.where(
        out_valid, jnp.take_along_axis(ann_charge, order, axis=1), 0
    )
    out_n = jnp.sum(valid, axis=1).astype(jnp.int32)
    del rows
    return ProcessedBatch(
        mz=out_mz,
        intensity=out_int,
        ann_charge=out_ann,
        n_peaks=jnp.minimum(out_n, k),
        precursor_mz=precursor_mz.astype(jnp.float32),
        precursor_charge=precursor_charge.astype(jnp.int32),
        is_valid=is_valid,
    )


def preprocess_spectra(spectra, params: PreprocessParams) -> ProcessedBatch:
    """Convenience host wrapper: pack + preprocess a list of `Spectrum`s."""
    from ann_solo_tpu.models.spectrum import pack_spectra

    batch = pack_spectra(spectra)
    return preprocess_batch(
        params,
        batch.mz,
        batch.intensity,
        batch.ann_charge,
        batch.n_peaks,
        batch.precursor_mz,
        batch.precursor_charge,
    )
