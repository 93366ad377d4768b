"""Fixed-chunk ANN select (_SELECT_CHUNK) must be result-identical.

`_ann_candidates` vectorizes+selects in fixed 4096-query chunks for
large batches so the process compiles ONE select program shape; since
select is per-query independent, the chunked path must return exactly
the candidates the index returns for an unchunked call.
"""

import numpy as np
import pytest

from ann_solo_tpu import search as search_mod
from ann_solo_tpu.config import config
from ann_solo_tpu.io.mgf import write_mgf
from ann_solo_tpu.io.splib import write_splib
from ann_solo_tpu.models.vectorize import VectorizeParams, vectorize_batch

from synth import make_library, noisy_query


@pytest.fixture(scope="module")
def big_batch(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("chunked_select")
    rng = np.random.default_rng(9)
    peptides, spectra = make_library(rng, n_peptides=300, charges=(2,))
    lib_path = str(tmp / "lib.splib")
    write_splib(spectra, lib_path)
    # > _SELECT_CHUNK queries of one charge, non-multiple tail.
    n_q = search_mod._SELECT_CHUNK + 37
    queries = [
        noisy_query(spectra[i % len(spectra)], rng, f"q_{i}")
        for i in range(n_q)
    ]
    query_path = str(tmp / "queries.mgf")
    write_mgf(queries, query_path)
    config.parse([
        lib_path, query_path, str(tmp / "out.mztab"),
        "--precursor_tolerance_mass", "20",
        "--precursor_tolerance_mode", "ppm",
        "--fragment_mz_tolerance", "0.02",
        "--precursor_tolerance_mass_open", "300",
        "--precursor_tolerance_mode_open", "Da",
        "--allow_peak_shifts",
        "--mode", "ann",
        "--num_list", "16",
        "--num_probe", "4",
        "--num_candidates", "32",
        "--model", "none",
    ])
    library = search_mod.SpectralLibrary(lib_path)
    processed = library._read_and_process_queries(query_path)
    yield library, processed[2]
    library.shutdown()


def test_chunked_select_matches_direct_index_search(big_batch):
    library, spectra = big_batch
    assert len(spectra) > search_mod._SELECT_CHUNK  # exercises chunking
    charge = 2
    lib = library._get_charge_lib(charge)
    k_peaks = library._query_params.max_peaks_used
    b = len(spectra)
    q_mz = np.zeros((b, k_peaks), np.float32)
    q_int = np.zeros((b, k_peaks), np.float32)
    for i, s in enumerate(spectra):
        n = min(s.n_peaks, k_peaks)
        q_mz[i, :n] = s.mz[:n]
        q_int[i, :n] = s.intensity[:n]

    cand = np.asarray(library._ann_candidates(
        spectra, q_mz, q_int, lib, charge, 300.0, "Da"
    ))
    assert cand.shape == (b, 32)

    # Direct unchunked reference: vectorize everything at once, search
    # the index with the whole batch.
    vparams = VectorizeParams.from_config(config)
    n_peaks = np.asarray(
        [min(s.n_peaks, k_peaks) for s in spectra], np.int32
    )
    vectors = vectorize_batch(
        vparams, vparams.device_tables(), q_mz, q_int, n_peaks
    )
    q_prec = np.asarray([s.precursor_mz for s in spectra], np.float32)
    ref = library._ann_indexes[charge].search(
        vectors, 32, q_prec=q_prec, charge=float(charge),
        tol_val=300.0, tol_mode="Da",
    )
    np.testing.assert_array_equal(cand, np.asarray(ref))
