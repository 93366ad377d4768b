"""Vectorization parity tests (jitted path vs reference-faithful oracle)."""

import numpy as np

from ann_solo_tpu.models.vectorize import (
    VectorizeParams,
    get_dim,
    vectorize_batch,
    vectorize_oracle,
)


def test_get_dim_reference_semantics():
    # Reference get_dim snaps boundaries to bin_size multiples
    # (ann_solo/spectrum.py:122-143).
    n_bins, start, end = get_dim(101.0, 1994.0, 1.0005079)
    assert start <= 101.0 < start + 1.0005079
    assert end >= 1994.0
    assert n_bins == round((end - start) / 1.0005079)
    # Default operating point.
    n_bins, start, end = get_dim(11.0, 2010.0, 0.04)
    assert abs(start - 11.0) < 0.04 and abs(end - 2010.04) < 0.08
    assert n_bins in (49975, 49976)


def test_batch_matches_oracle():
    params = VectorizeParams(11.0, 2010.0, 0.04, 800)
    rng = np.random.default_rng(3)
    b, k = 5, 50
    mz = np.sort(rng.uniform(50.0, 1800.0, (b, k)).astype(np.float32), axis=1)
    intensity = rng.uniform(0.1, 1.0, (b, k)).astype(np.float32)
    n_peaks = np.asarray([50, 30, 10, 50, 1], np.int32)
    for i in range(b):
        intensity[i, n_peaks[i]:] = 0.0
        mz[i, n_peaks[i]:] = 0.0
    table = params.bin_to_hash()
    vectors = np.asarray(
        vectorize_batch(params, table, mz, intensity, n_peaks)
    )
    for i in range(b):
        expected = vectorize_oracle(
            params, mz[i, : n_peaks[i]], intensity[i, : n_peaks[i]]
        )
        np.testing.assert_allclose(vectors[i], expected, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(vectors[i]), 1.0, rtol=1e-5)


def test_boundary_bins_match_oracle_exactly():
    """m/z values adversarially placed on/near float64 bin edges must land
    in the same bin as the reference's float64 computation (ADVICE r1:
    the pure-f32 path flips boundary peaks at high m/z)."""
    params = VectorizeParams(11.0, 2010.0, 0.04, 800)
    n_bins, start, _ = get_dim(11.0, 2010.0, 0.04)
    tables = params.tables()
    rng = np.random.default_rng(5)
    # Sample bins across the range incl. the high-m/z regime (~2000) where
    # f32 ulp (~2e-4) exceeds typical rounding margins.
    bins = np.concatenate(
        [rng.integers(0, n_bins, 200),
         n_bins - 1 - rng.integers(0, 200, 100)]
    )
    edges = start + bins.astype(np.float64) * 0.04
    # On-edge, just-below, just-above in f32 representation.
    mz_f32 = np.concatenate(
        [
            edges.astype(np.float32),
            np.nextafter(
                edges.astype(np.float32), np.float32(0), dtype=np.float32
            ),
            np.nextafter(
                edges.astype(np.float32), np.float32(1e9), dtype=np.float32
            ),
        ]
    )
    k = 50  # the real operating peak width
    b = len(mz_f32) // k
    mz = mz_f32[: b * k].reshape(b, k)
    intensity = np.ones((b, k), np.float32)
    n_peaks = np.full(b, k, np.int32)
    vec = np.asarray(
        vectorize_batch(params, tables, mz, intensity, n_peaks, norm=False)
    )
    for i in range(b):
        expected = vectorize_oracle(
            params, mz[i], np.ones(k), norm=False
        )
        np.testing.assert_allclose(vec[i], expected, rtol=1e-6)


def test_tables_path_matches_legacy_away_from_edges():
    params = VectorizeParams(11.0, 2010.0, 0.04, 800)
    rng = np.random.default_rng(9)
    # Bin centers: both paths must agree exactly.
    n_bins, start, _ = get_dim(11.0, 2010.0, 0.04)
    bins = rng.integers(0, n_bins, 64)
    mz = (start + (bins + 0.5) * 0.04).astype(np.float32)[None, :]
    intensity = rng.uniform(0.1, 1, (1, 64)).astype(np.float32)
    n_peaks = np.asarray([64], np.int32)
    legacy = np.asarray(
        vectorize_batch(
            params, params.bin_to_hash(), mz, intensity, n_peaks
        )
    )
    exact = np.asarray(
        vectorize_batch(params, params.tables(), mz, intensity, n_peaks)
    )
    np.testing.assert_allclose(legacy, exact, rtol=1e-6)


def test_hash_collisions_accumulate():
    # Two peaks hashing to the same bucket must sum their intensities.
    params = VectorizeParams(0.0, 100.0, 1.0, 4)
    table = params.bin_to_hash()
    # Find two bins mapping to the same bucket.
    bucket_of = {b: [] for b in range(4)}
    for bin_idx, bucket in enumerate(table[:50]):
        bucket_of[int(bucket)].append(bin_idx)
    bins = next(v for v in bucket_of.values() if len(v) >= 2)[:2]
    mz = np.asarray([[bins[0] + 0.5, bins[1] + 0.5]], np.float32)
    intensity = np.asarray([[0.6, 0.8]], np.float32)
    vec = np.asarray(
        vectorize_batch(
            params, table, mz, intensity, np.asarray([2], np.int32),
            norm=False,
        )
    )
    np.testing.assert_allclose(
        vec[0, int(table[bins[0]])], 0.6 + 0.8, rtol=1e-6
    )
