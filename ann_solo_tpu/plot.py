"""Mirror-plot CLI for a single SSM (reference: ann_solo/plot_ssm.py).

Reconstructs the search configuration from an mzTab result file's metadata,
re-runs the exact peak matching for one query spectrum against its library
match, and renders a mirror plot (query on top, library below, matched
peaks highlighted).
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)


def mirror_plot(
    query_spectrum,
    library_spectrum,
    peak_matches: Optional[np.ndarray],
    title: str,
    out_filename: str,
) -> None:
    """Render the mirror plot to a PNG (spectrum_utils.plot.mirror
    equivalent)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 5))
    matched_q = set()
    matched_l = set()
    if peak_matches is not None:
        matched_q = {int(i) for i, _ in peak_matches}
        matched_l = {int(j) for _, j in peak_matches}
    q_int = query_spectrum.intensity / max(
        query_spectrum.intensity.max(), 1e-30
    )
    l_int = library_spectrum.intensity / max(
        library_spectrum.intensity.max(), 1e-30
    )
    for i, (mz, intensity) in enumerate(zip(query_spectrum.mz, q_int)):
        color = "#b2182b" if i in matched_q else "#888888"
        ax.vlines(mz, 0, intensity, colors=color, linewidth=1.0)
    for j, (mz, intensity) in enumerate(zip(library_spectrum.mz, l_int)):
        color = "#2166ac" if j in matched_l else "#bbbbbb"
        ax.vlines(mz, 0, -intensity, colors=color, linewidth=1.0)
    ax.axhline(0, color="black", linewidth=0.8)
    ax.set_xlabel("m/z")
    ax.set_ylabel("intensity (query above, library below)")
    ax.set_title(title)
    ax.set_ylim(-1.05, 1.05)
    fig.tight_layout()
    fig.savefig(out_filename, dpi=300, bbox_inches="tight")
    plt.close(fig)


def main(args=None) -> int:
    """Plot one SSM from an mzTab result file
    (reference plot_ssm.py:35-141)."""
    from ann_solo_tpu.config import config
    from ann_solo_tpu.io.mztab import read_mztab_metadata, read_mztab_ssms
    from ann_solo_tpu.io import reader as io_reader
    from ann_solo_tpu.io.store import open_or_build_store
    from ann_solo_tpu.models.preprocess import (
        PreprocessParams,
        preprocess_batch,
    )
    from ann_solo_tpu.models.spectrum import pack_spectra
    from ann_solo_tpu.ops.shifted_dot import shifted_dot_best_match

    parser = argparse.ArgumentParser(
        description="Visualize a spectrum-spectrum match from an "
        "ANN-SoLo-TPU mzTab result file"
    )
    parser.add_argument("mztab_filename", help="mzTab identification file")
    parser.add_argument(
        "query_id", help="query spectrum identifier (PSM_ID)"
    )
    parsed = parser.parse_args(args)

    # Reconstruct the search configuration from the mzTab metadata.
    ssms = read_mztab_ssms(parsed.mztab_filename)
    settings = read_mztab_metadata(parsed.mztab_filename)
    if parsed.query_id not in ssms.index.astype(str).values:
        raise ValueError(
            f"Query {parsed.query_id} not present in the mzTab file"
        )
    row = ssms.loc[ssms.index.astype(str) == parsed.query_id].iloc[0]

    # Recover library + query filenames from the MTD description URIs.
    lib_filename = str(row["database"])
    if lib_filename.startswith("file://"):
        lib_filename = lib_filename[len("file://"):]
    query_filename = None
    with open(parsed.mztab_filename) as f_in:
        for line in f_in:
            if line.startswith("MTD\tms_run[1]-location"):
                query_filename = line.strip().split("\t")[2]
                if query_filename.startswith("file://"):
                    query_filename = query_filename[len("file://"):]
                break

    args_list = [
        lib_filename, query_filename or "", "dummy.mztab",
        "--precursor_tolerance_mass",
        settings.get("precursor_tolerance_mass", "20"),
        "--precursor_tolerance_mode",
        settings.get("precursor_tolerance_mode", "ppm"),
        "--fragment_mz_tolerance",
        settings.get("fragment_mz_tolerance", "0.02"),
        "--mode", settings.get("mode", "ann"),
    ]
    for key in (
        "min_mz", "max_mz", "min_intensity", "min_peaks", "min_mz_range",
        "max_peaks_used", "max_peaks_used_library", "scaling", "bin_size",
        "hash_len",
    ):
        if settings.get(key) is not None:
            args_list.extend([f"--{key}", settings[key]])
    if settings.get("allow_peak_shifts") == "True":
        args_list.append("--allow_peak_shifts")
    config.parse(args_list)

    # Load the query spectrum.
    query_spectrum = None
    for spectrum in io_reader.read_query_file(query_filename):
        if str(spectrum.identifier) == parsed.query_id:
            if spectrum.precursor_charge is None:
                spectrum.precursor_charge = int(row["charge"])
            query_spectrum = spectrum
            break
    if query_spectrum is None:
        raise ValueError(
            f"Query {parsed.query_id} not found in {query_filename}"
        )

    # Load the library spectrum via the store.
    params = PreprocessParams.from_config(config, is_library=True)
    store = open_or_build_store(lib_filename, config, params)
    lib_row = np.nonzero(
        store.identifiers
        == str(row["opt_ms_run[1]_cv_MS:1003062_spectrum_index"])
    )[0]
    if len(lib_row) == 0:
        raise ValueError("Library spectrum not found in the store")
    library_spectrum = store.get_spectrum(int(lib_row[0]), processed=True)

    # Preprocess the query and recompute the peak matches.
    qparams = PreprocessParams.from_config(config, is_library=False)
    packed = pack_spectra([query_spectrum])
    processed = preprocess_batch(
        qparams, packed.mz, packed.intensity, packed.ann_charge,
        packed.n_peaks, packed.precursor_mz, packed.precursor_charge,
    ).to_numpy()
    n = int(processed.n_peaks[0])
    query_spectrum.mz = processed.mz[0, :n].astype(np.float64)
    query_spectrum.intensity = processed.intensity[0, :n].astype(np.float64)

    k = max(n, library_spectrum.n_peaks)
    q_mz = np.zeros((1, k), np.float32)
    q_int = np.zeros((1, k), np.float32)
    q_mz[0, :n] = query_spectrum.mz
    q_int[0, :n] = query_spectrum.intensity
    l_mz = np.zeros((1, k), np.float32)
    l_int = np.zeros((1, k), np.float32)
    l_ann = np.zeros((1, k), np.int32)
    nl = library_spectrum.n_peaks
    l_mz[0, :nl] = library_spectrum.mz
    l_int[0, :nl] = library_spectrum.intensity
    l_ann[0, :nl] = library_spectrum.annotation_charges()
    charge = int(library_spectrum.precursor_charge)
    _, match_q, match_c = shifted_dot_best_match(
        q_mz, q_int, l_mz, l_int, l_ann,
        np.asarray([query_spectrum.precursor_mz], np.float32),
        np.asarray([library_spectrum.precursor_mz], np.float32),
        np.asarray([charge], np.int32),
        float(config.fragment_mz_tolerance),
        charge + 1,
        bool(config.allow_peak_shifts),
    )
    match_q = np.asarray(match_q)[0]
    match_c = np.asarray(match_c)[0]
    sel = match_q >= 0
    peak_matches = np.column_stack([match_q[sel], match_c[sel]])

    out_filename = (
        f"{os.path.splitext(parsed.mztab_filename)[0]}_"
        f"{parsed.query_id}.png"
    )
    mass_delta = (
        float(row["exp_mass_to_charge"]) - float(row["calc_mass_to_charge"])
    ) * int(row["charge"])
    title = (
        f"{library_spectrum.peptide}  "
        f"Δm = {mass_delta:+.3f} Da  "
        f"score = {float(row['search_engine_score[1]']):.3f}"
    )
    mirror_plot(
        query_spectrum, library_spectrum, peak_matches, title, out_filename
    )
    logger.info("Saved mirror plot to %s", out_filename)
    print(out_filename)
    return 0


if __name__ == "__main__":
    main()
