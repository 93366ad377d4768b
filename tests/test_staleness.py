"""Content-staleness guards: store and IVF reuse must track file CONTENT.

Round-4 incident: a library file regenerated in place (same name, same
settings hash, different spectra) silently reused the old store, so
searches ran against a different library than the one on disk.  The
reference's .spcfg sidecar (reader.py:147-200) has the same hole -- it
only checks the config.  These tests pin the fingerprint-based guards.
"""

import numpy as np

from ann_solo_tpu.io.splib import write_splib
from ann_solo_tpu.io.store import (
    open_or_build_store,
    source_fingerprint,
)
from ann_solo_tpu.models.preprocess import PreprocessParams

from synth import make_library


class _Cfg:
    min_mz = 11.0
    max_mz = 2010.0
    bin_size = 0.04
    hash_len = 800
    num_list = 0
    min_peaks = 5
    min_mz_range = 100.0
    min_intensity = 0.01
    max_peaks_used = 50
    max_peaks_used_library = 50
    scaling = "rank"
    resolution = None
    remove_precursor = False
    remove_precursor_tolerance = 0.0
    add_decoys = False
    num_probe = 4
    index_dtype = "bf16"
    ivf_redundancy = 1

    def __getitem__(self, key):
        return getattr(self, key)


def _write_library(path, seed, n=24):
    rng = np.random.default_rng(seed)
    _, spectra = make_library(rng, n_peptides=n)
    write_splib(spectra, str(path))


def test_store_rebuilds_on_content_change(tmp_path):
    lib = tmp_path / "lib.splib"
    params = PreprocessParams.from_config(_Cfg(), is_library=True)

    _write_library(lib, seed=1)
    fp1 = source_fingerprint(str(lib))
    store1 = open_or_build_store(str(lib), _Cfg(), params)
    assert store1.source_fingerprint == fp1
    ids1 = list(store1.identifiers)

    # Same settings, same filename, DIFFERENT content: must rebuild.
    _write_library(lib, seed=2)
    fp2 = source_fingerprint(str(lib))
    assert fp2 != fp1
    store2 = open_or_build_store(str(lib), _Cfg(), params)
    assert store2.source_fingerprint == fp2
    peps1 = set(store1.peptides)
    peps2 = set(store2.peptides)
    assert peps1 != peps2  # the rebuild picked up the new content

    # Unchanged content: reused (fingerprints equal).
    store3 = open_or_build_store(str(lib), _Cfg(), params)
    assert store3.source_fingerprint == fp2
    assert list(store3.identifiers) == list(store2.identifiers)
    assert ids1 is not None


def test_ivf_rebuilds_on_store_fp_change(tmp_path):
    from ann_solo_tpu.index.ivf import IvfIndex

    rng = np.random.default_rng(3)
    vectors = rng.standard_normal((64, 32)).astype(np.float32)
    vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)

    class Lib:
        mz = np.sort(rng.uniform(100, 1500, (64, 8)).astype(np.float32), 1)
        intensity = np.abs(rng.standard_normal((64, 8))).astype(np.float32)
        n_peaks = np.full(64, 8, np.int32)
        precursor_mz = rng.uniform(400, 1200, 64).astype(np.float64)
        n_spectra = 64

    class Cfg:
        num_list = 4
        num_probe = 2
        index_dtype = "bf16"
        ivf_redundancy = 1
        min_mz, max_mz, bin_size, hash_len = 11.0, 2010.0, 0.04, 32
        scaling = "rank"

        def __getitem__(self, key):
            return getattr(self, key)

    path = str(tmp_path / "c2.ivf.h5")
    idx1 = IvfIndex.load_or_build(path, Lib(), Cfg(), store_fp="fp_A")
    assert idx1.store_fp == "fp_A"

    # Same fingerprint: loads (same centroids object content).
    idx2 = IvfIndex.load_or_build(path, Lib(), Cfg(), store_fp="fp_A")
    np.testing.assert_array_equal(
        np.asarray(idx1.padded_ids), np.asarray(idx2.padded_ids)
    )

    # Changed fingerprint: rebuilds and re-stamps.
    idx3 = IvfIndex.load_or_build(path, Lib(), Cfg(), store_fp="fp_B")
    assert idx3.store_fp == "fp_B"
    idx4 = IvfIndex.load(path, 2)
    assert idx4.store_fp == "fp_B"

    # Legacy file without a fingerprint: REBUILDS when the caller has
    # one (a lenient accept once let a stale index silently map
    # candidate ids onto a rebuilt store's shifted row positions).
    import h5py

    with h5py.File(path, "a") as f:
        del f.attrs["store_fp"]
    idx5 = IvfIndex.load_or_build(path, Lib(), Cfg(), store_fp="fp_C")
    assert idx5.store_fp == "fp_C"

    # No expected fingerprint (legacy caller): accepted as-is.
    with h5py.File(path, "a") as f:
        del f.attrs["store_fp"]
    idx6 = IvfIndex.load_or_build(path, Lib(), Cfg())
    assert idx6.store_fp is None
