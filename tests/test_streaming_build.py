"""`IvfIndex.build_streaming` == `IvfIndex.build` identity.

The streaming path (host-streamed rows, device-resident planning,
grouped quantize-and-pack into donated buffers) must produce
byte-identical indexes to the resident build given the same seed —
centroids, list placement, quantized storage, scales, and precursor
table — including when the FAISS-style training subsample binds and
when the pack runs in many small groups.  Reference analog: FAISS
train/add streaming, spectral_library.py:163-181.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ann_solo_tpu.index.ivf import IvfIndex


class IvfConfig:
    def __init__(self, num_list=16, num_probe=8):
        self._values = {"num_list": num_list, "num_probe": num_probe}

    def __getattr__(self, key):
        return self._values[key]

    def __getitem__(self, key):
        return self._values[key]


def _vectors(rng, n=4000, d=64, n_clusters=16):
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assignment = rng.integers(0, n_clusters, n)
    vectors = centers[assignment] + 0.3 * rng.normal(size=(n, d)).astype(
        np.float32
    )
    vectors /= np.linalg.norm(vectors, axis=1, keepdims=True)
    return vectors.astype(np.float32)


def _get_rows(vectors):
    n = vectors.shape[0]

    def get_rows(idx):
        host = np.clip(np.asarray(idx), 0, n - 1)
        return jnp.asarray(vectors[host])

    return get_rows


def _assert_identical(a: IvfIndex, b: IvfIndex):
    assert a.redundancy == b.redundancy
    np.testing.assert_array_equal(
        np.asarray(a.centroids), np.asarray(b.centroids)
    )
    np.testing.assert_array_equal(
        np.asarray(a.padded_ids), np.asarray(b.padded_ids)
    )
    av = np.asarray(a.padded_vectors)
    bv = np.asarray(b.padded_vectors)
    assert av.dtype == bv.dtype
    np.testing.assert_array_equal(
        av.view(np.uint8), bv.view(np.uint8)
    )
    np.testing.assert_array_equal(
        np.asarray(a.padded_scales), np.asarray(b.padded_scales)
    )
    np.testing.assert_array_equal(
        np.asarray(a.padded_prec), np.asarray(b.padded_prec)
    )


@pytest.mark.parametrize("storage_dtype", ["int8", "bfloat16"])
def test_streaming_matches_resident(storage_dtype):
    """Byte-identical placement + quantization, int8 and bf16, with
    the pack forced through many small list groups."""
    import ml_dtypes

    dt = np.int8 if storage_dtype == "int8" else ml_dtypes.bfloat16
    rng = np.random.default_rng(11)
    vectors = _vectors(rng, n=4000, d=64)
    prec = rng.uniform(300.0, 1800.0, size=4000).astype(np.float32)
    config = IvfConfig(num_list=16, num_probe=8)
    resident = IvfIndex.build(
        vectors, config, precursor_mz=prec, seed=7, storage_dtype=dt
    )
    streamed = IvfIndex.build_streaming(
        _get_rows(vectors),
        4000,
        64,
        config,
        precursor_mz=prec,
        seed=7,
        storage_dtype=dt,
        group_bytes=1 << 18,  # a few lists per group
    )
    _assert_identical(resident, streamed)


def test_streaming_matches_when_train_subsample_binds():
    """num_list * 256 < n: both paths draw the SAME FAISS-style
    training subsample (identical rng stream), so identity holds even
    when the cap binds."""
    rng = np.random.default_rng(5)
    vectors = _vectors(rng, n=3000, d=48, n_clusters=8)
    config = IvfConfig(num_list=8, num_probe=4)
    assert 8 * 256 < 3000  # the subsample cap binds
    resident = IvfIndex.build(
        vectors, config, seed=3, storage_dtype=np.int8
    )
    streamed = IvfIndex.build_streaming(
        _get_rows(vectors), 3000, 48, config, seed=3,
        storage_dtype=np.int8,
    )
    _assert_identical(resident, streamed)


def test_load_or_build_streaming_dispatch(tmp_path, monkeypatch):
    """Past the source-block memory threshold, load_or_build takes the
    host-streaming path (on-demand re-vectorization) and produces the
    SAME index as the resident build: vectorization is deterministic,
    so placement identity reduces to the ivf-level identity above."""
    from ann_solo_tpu.index import ivf as ivf_mod

    rng = np.random.default_rng(9)
    n, p = 600, 12

    class Lib:
        mz = np.sort(
            rng.uniform(100, 1500, (n, p)).astype(np.float32), 1
        )
        intensity = np.abs(rng.standard_normal((n, p))).astype(
            np.float32
        )
        n_peaks = np.full(n, p, np.int32)
        precursor_mz = rng.uniform(400, 1200, n).astype(np.float64)
        n_spectra = n

    class Cfg:
        num_list = 8
        num_probe = 4
        index_dtype = "int8"
        ivf_redundancy = 2
        min_mz, max_mz, bin_size, hash_len = 11.0, 2010.0, 0.04, 64
        scaling = "rank"

        def __getitem__(self, key):
            return getattr(self, key)

    resident = IvfIndex.load_or_build(
        str(tmp_path / "resident.ivf.h5"), Lib(), Cfg(), store_fp="fp"
    )
    monkeypatch.setattr(ivf_mod, "_STREAM_BUILD_SOURCE_BYTES", 1)
    streamed = IvfIndex.load_or_build(
        str(tmp_path / "streamed.ivf.h5"), Lib(), Cfg(), store_fp="fp"
    )
    _assert_identical(resident, streamed)


def test_streaming_lane_padded_block(monkeypatch):
    """Chunked-regime streaming builds allocate the block lane-padded
    (multiple of 128): TPU tiling pays the physical padding either way,
    and padding at serving time would materialize a second full-size
    copy (the 8M-row OOM, round 4).  Forced here by shrinking the
    fullscan transient; search results must match an unpadded build
    exactly, and device_arrays must not re-pad."""
    from ann_solo_tpu.index import ivf as ivf_mod

    rng = np.random.default_rng(4)
    vectors = _vectors(rng, n=2500, d=64)
    config = IvfConfig(num_list=16, num_probe=16)
    plain = IvfIndex.build_streaming(
        _get_rows(vectors), 2500, 64, config, seed=1,
        storage_dtype=np.int8,
    )
    assert plain.padded_vectors.shape[-1] == 64
    monkeypatch.setattr(ivf_mod, "_FULLSCAN_TRANSIENT", 1)
    padded = IvfIndex.build_streaming(
        _get_rows(vectors), 2500, 64, config, seed=1,
        storage_dtype=np.int8,
    )
    assert padded.padded_vectors.shape[-1] == 128
    # Real columns byte-identical, padding columns all zero.
    pv, qv = np.asarray(plain.padded_vectors), np.asarray(
        padded.padded_vectors
    )
    np.testing.assert_array_equal(qv[..., :64], pv)
    assert not qv[..., 64:].any()
    assert padded.device_dim == 128
    vecs_dev = padded.device_arrays()[0]
    assert vecs_dev.shape[-1] == 128
    cents_dev = padded.device_arrays()[4]
    assert cents_dev.shape[-1] == 128
    queries = vectors[rng.integers(0, 2500, 64)]
    ids_a = plain.search(queries, k=10)
    ids_b = padded.search(queries, k=10)
    np.testing.assert_array_equal(np.asarray(ids_a), np.asarray(ids_b))


def test_streaming_search_matches_oracle():
    """End to end: the streamed index answers queries identically to
    the resident build (same scores, same ids)."""
    rng = np.random.default_rng(2)
    vectors = _vectors(rng, n=2500, d=64)
    config = IvfConfig(num_list=16, num_probe=16)
    resident = IvfIndex.build(
        vectors, config, seed=1, storage_dtype=np.int8
    )
    streamed = IvfIndex.build_streaming(
        _get_rows(vectors), 2500, 64, config, seed=1,
        storage_dtype=np.int8,
    )
    queries = vectors[rng.integers(0, 2500, 64)]
    ids_a = resident.search(queries, k=10)
    ids_b = streamed.search(queries, k=10)
    np.testing.assert_array_equal(np.asarray(ids_a), np.asarray(ids_b))


@pytest.mark.parametrize(
    "n_rows,block", [(10, 4), (8, 4), (3, 8), (65, 16), (64, 16)]
)
def test_fetch_rows_blocked_parity(n_rows, block):
    """Blocked accessor fetch == one-shot fetch for every tail shape.

    The helper pads the tail block by repeating the last index and
    writes blocks into one donated buffer; the result must equal a
    single accessor call on the same indices (accessors are pure
    functions of the row index — build_streaming's contract)."""
    from ann_solo_tpu.index.ivf import fetch_rows_blocked

    calls = []

    def gen(idx):
        calls.append(int(idx.shape[0]))
        return idx[:, None].astype(jnp.float32) * jnp.arange(
            5, dtype=jnp.float32
        ) + 1.0

    idx = np.arange(n_rows, dtype=np.int32)[::-1].copy()
    out = np.asarray(fetch_rows_blocked(gen, idx, block=block))
    ref = np.asarray(gen(jnp.asarray(idx)))
    assert out.shape == ref.shape
    np.testing.assert_array_equal(out, ref)
    if n_rows > block:
        # Every fetch ran at the fixed block shape (one compiled
        # accessor program per build).
        assert set(calls[:-1]) == {block}
