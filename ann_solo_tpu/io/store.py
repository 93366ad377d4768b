"""Columnar spectral-library store.

Replaces the reference's per-spectrum HDF5 groups + unbounded lru_cache
(ann_solo/reader.py:440-563, a documented I/O bottleneck) with packed
columnar arrays in a single HDF5 file:

* raw peaks as flat arrays + offsets (random access = one slice),
* preprocessed fixed-width peak blocks (`(n, max_peaks_used)`) computed once
  at build time on device -- candidates never need re-processing at search
  time,
* per-charge row partitions (the reference's first-class charge partitioning,
  spectral_library.py:100-116).

The store is keyed by a hyperparameter hash like the reference's sidecar
config (.spcfg, reader.py:147-200); a hash mismatch triggers a rebuild.
"""

from __future__ import annotations

import datetime
import hashlib
import json
import logging
import os
from typing import Dict, Iterator, List, Optional

import h5py
import numpy as np

from ann_solo_tpu.models.preprocess import (
    PreprocessParams,
    ProcessedBatch,
    preprocess_batch,
)
from ann_solo_tpu.models.spectrum import Spectrum, pack_spectra

logger = logging.getLogger(__name__)

_BUILD_BATCH = 4096


def source_fingerprint(path: str) -> str:
    """Cheap content fingerprint of a library file: size + md5 of the
    first 1 MiB and last 64 KiB.

    The reference's .spcfg sidecar (reader.py:147-200) only checks the
    CONFIG, so a library file rewritten in place (same name, same
    settings, different spectra) silently reuses a stale store; this
    bit a full QUALITY debugging cycle in round 4 (a regenerated
    synthetic corpus with a different --n-peptides reused the old
    store).  Content changes anywhere move the size or the sampled
    bytes with overwhelming probability for real library files.
    """
    try:
        size = os.path.getsize(path)
        h = hashlib.md5()
        with open(path, "rb") as f:
            h.update(f.read(1 << 20))
            if size > (1 << 20) + (1 << 16):
                f.seek(-(1 << 16), os.SEEK_END)
                h.update(f.read(1 << 16))
        return f"{size}:{h.hexdigest()}"
    except OSError:
        return "null"


def hyperparameter_hash(config) -> str:
    """SHA-1 over the settings that determine store/index contents.

    Extends the reference's 5-key hash (spectral_library.py:38,118-131) with
    the preprocessing settings, because this store persists *processed*
    peaks (the reference reprocesses raw peaks on every read instead).
    """
    keys = [
        "min_mz", "max_mz", "bin_size", "hash_len", "num_list",
        "min_peaks", "min_mz_range", "min_intensity", "max_peaks_used",
        "max_peaks_used_library", "scaling", "resolution",
        "remove_precursor", "remove_precursor_tolerance",
    ]
    # NOTE: index-only settings (e.g. --index_dtype) are deliberately NOT
    # part of this hash -- changing them must not invalidate the (far
    # more expensive) spectral-library store; they key the per-charge
    # index filename instead (index.ivf.ivf_index_filename).
    values = {k: config[k] for k in keys}
    # Bump whenever preprocessing SEMANTICS change (not just settings),
    # so stores built by older code rebuild instead of silently mixing
    # preprocessing versions between library and queries.  Rev 2:
    # reduced-charge precursor removal bound raised to 16.
    values["_preprocess_rev"] = 2
    payload = json.dumps(values).encode("utf-8")
    return hashlib.sha1(payload).hexdigest()


class ChargeBlock:
    """All spectra of one precursor charge, as dense arrays."""

    def __init__(self, rows: np.ndarray, store: "SpectralLibraryStore"):
        self.rows = rows  # global row indices into the store
        self.precursor_mz = store.precursor_mz[rows]
        self.is_decoy = store.is_decoy[rows]
        self.proc_mz = store.proc_mz[rows]
        self.proc_intensity = store.proc_intensity[rows]
        self.proc_ann_charge = store.proc_ann_charge[rows]
        self.proc_n_peaks = store.proc_n_peaks[rows]
        self.proc_is_valid = store.proc_is_valid[rows]

    @property
    def n_spectra(self) -> int:
        return len(self.rows)


class SpectralLibraryStore:
    """In-memory columnar view over a built library store file."""

    def __init__(self, filename: str):
        self.filename = filename
        with h5py.File(filename, "r") as f:
            self.config_hash = f.attrs["config_hash"]
            self.source_filename = f.attrs["source_filename"]
            self._source_version = f.attrs.get("source_version", "null")
            self.source_fingerprint = f.attrs.get(
                "source_fingerprint", "null"
            )
            self.identifiers = f["identifiers"].asstr()[()]
            self.peptides = f["peptides"].asstr()[()]
            self.precursor_mz = f["precursor_mz"][()]
            self.precursor_charge = f["precursor_charge"][()]
            self.is_decoy = f["is_decoy"][()]
            self.peak_offsets = f["peaks/offsets"][()]
            self.peak_mz = f["peaks/mz"][()]
            self.peak_intensity = f["peaks/intensity"][()]
            self.peak_ann_type = f["peaks/ann_type"][()]
            self.peak_ann_index = f["peaks/ann_index"][()]
            self.peak_ann_charge = f["peaks/ann_charge"][()]
            self.proc_mz = f["processed/mz"][()]
            self.proc_intensity = f["processed/intensity"][()]
            self.proc_ann_charge = f["processed/ann_charge"][()]
            self.proc_n_peaks = f["processed/n_peaks"][()]
            self.proc_is_valid = f["processed/is_valid"][()]
        self._charge_blocks: Dict[int, ChargeBlock] = {}

    @property
    def n_spectra(self) -> int:
        return len(self.precursor_mz)

    def charges(self) -> List[int]:
        return sorted(int(c) for c in np.unique(self.precursor_charge))

    def charge_block(self, charge: int) -> Optional[ChargeBlock]:
        """Dense arrays for all spectra with the given precursor charge."""
        if charge not in self._charge_blocks:
            rows = np.nonzero(self.precursor_charge == charge)[0]
            if len(rows) == 0:
                return None
            self._charge_blocks[charge] = ChargeBlock(rows, self)
        return self._charge_blocks[charge]

    def get_spectrum(self, row: int, processed: bool = True) -> Spectrum:
        """Materialize one spectrum (host side, for output/plotting)."""
        if processed:
            n = int(self.proc_n_peaks[row])
            spectrum = Spectrum(
                identifier=str(self.identifiers[row]),
                precursor_mz=float(self.precursor_mz[row]),
                precursor_charge=int(self.precursor_charge[row]),
                mz=self.proc_mz[row, :n],
                intensity=self.proc_intensity[row, :n],
                ann_charge=self.proc_ann_charge[row, :n].astype(np.uint8),
                peptide=str(self.peptides[row]),
                is_decoy=bool(self.is_decoy[row]),
                index=row,
            )
        else:
            lo, hi = self.peak_offsets[row], self.peak_offsets[row + 1]
            spectrum = Spectrum(
                identifier=str(self.identifiers[row]),
                precursor_mz=float(self.precursor_mz[row]),
                precursor_charge=int(self.precursor_charge[row]),
                mz=self.peak_mz[lo:hi],
                intensity=self.peak_intensity[lo:hi],
                ann_type=self.peak_ann_type[lo:hi],
                ann_index=self.peak_ann_index[lo:hi],
                ann_charge=self.peak_ann_charge[lo:hi],
                peptide=str(self.peptides[row]),
                is_decoy=bool(self.is_decoy[row]),
                index=row,
            )
        return spectrum

    def get_version(self) -> str:
        """Library version recorded at store-build time: the source
        library file's UTC modification timestamp (the reference records
        the analogous .spcfg creation version, writer.py:109)."""
        return str(self._source_version)


def build_store(
    spectra: Iterator[Spectrum],
    filename: str,
    config_hash: str,
    source_filename: str,
    params: PreprocessParams,
    add_decoys: bool = False,
    source_fp: Optional[str] = None,
) -> None:
    """Build the columnar store: stream spectra, preprocess on device.

    Counterpart to the reference's `_create_config` + HDF5 writes
    (reader.py:147-200,489-521), with decoy generation optionally
    interleaved (config --add_decoys).
    """
    # Decoy shuffling consumes the GLOBAL numpy RNG (the reference's
    # decoy_generator does the same and relies on the CLI's rndm
    # seeding).  A store must hold the same decoys no matter which
    # entry point built it -- an unseeded tool process once rebuilt
    # this store with different decoy interleaving, which shifted
    # every per-charge row position -- so the stream is pinned here,
    # derived from the config hash.
    if add_decoys:
        np.random.seed(int(config_hash[:8], 16) & 0x7FFFFFFF)
    identifiers: List[str] = []
    peptides: List[str] = []
    precursor_mz: List[float] = []
    precursor_charge: List[int] = []
    is_decoy: List[bool] = []
    mz_chunks: List[np.ndarray] = []
    intensity_chunks: List[np.ndarray] = []
    ann_type_chunks: List[np.ndarray] = []
    ann_index_chunks: List[np.ndarray] = []
    ann_charge_chunks: List[np.ndarray] = []
    lengths: List[int] = []
    processed: List[ProcessedBatch] = []

    batch: List[Spectrum] = []

    def flush():
        if not batch:
            return
        packed = pack_spectra(batch, pad_multiple=128)
        out = preprocess_batch(
            params, packed.mz, packed.intensity, packed.ann_charge,
            packed.n_peaks, packed.precursor_mz, packed.precursor_charge,
        )
        processed.append(out.to_numpy())
        batch.clear()

    def add(spectrum: Spectrum):
        identifiers.append(spectrum.identifier)
        peptides.append(spectrum.peptide or "")
        precursor_mz.append(float(spectrum.precursor_mz))
        precursor_charge.append(int(spectrum.precursor_charge or 0))
        is_decoy.append(bool(spectrum.is_decoy))
        n = spectrum.n_peaks
        lengths.append(n)
        mz_chunks.append(np.asarray(spectrum.mz, np.float32))
        intensity_chunks.append(np.asarray(spectrum.intensity, np.float32))
        ann_type_chunks.append(
            spectrum.ann_type.astype(np.uint8)
            if spectrum.ann_type is not None
            else np.zeros(n, np.uint8)
        )
        ann_index_chunks.append(
            spectrum.ann_index.astype(np.int16)
            if spectrum.ann_index is not None
            else np.zeros(n, np.int16)
        )
        ann_charge_chunks.append(spectrum.annotation_charges())
        batch.append(spectrum)
        if len(batch) >= _BUILD_BATCH:
            flush()

    if add_decoys:
        from ann_solo_tpu.decoy import shuffle_and_reposition

    n_read = 0
    for spectrum in spectra:
        if add_decoys:
            try:
                add(shuffle_and_reposition(spectrum))
            except (ValueError, KeyError) as e:
                logger.warning(
                    "Failed to generate decoy for spectrum %s: %s",
                    spectrum.identifier, e,
                )
        add(spectrum)
        n_read += 1
        if n_read % 10000 == 0:
            logger.info("Library spectra read: %d", n_read)
    flush()

    offsets = np.zeros(len(lengths) + 1, np.int64)
    np.cumsum(lengths, out=offsets[1:])
    str_dtype = h5py.string_dtype(encoding="utf-8")
    with h5py.File(filename, "w") as f:
        f.attrs["config_hash"] = config_hash
        f.attrs["source_filename"] = source_filename
        f.attrs["source_fingerprint"] = source_fp or "null"
        try:
            mtime = os.path.getmtime(source_filename)
            f.attrs["source_version"] = datetime.datetime.fromtimestamp(
                mtime, datetime.timezone.utc
            ).strftime("%Y-%m-%dT%H:%M:%SZ")
        except OSError:
            f.attrs["source_version"] = "null"
        f.create_dataset(
            "identifiers", data=np.asarray(identifiers, object),
            dtype=str_dtype,
        )
        f.create_dataset(
            "peptides", data=np.asarray(peptides, object), dtype=str_dtype
        )
        f.create_dataset(
            "precursor_mz", data=np.asarray(precursor_mz, np.float32)
        )
        f.create_dataset(
            "precursor_charge", data=np.asarray(precursor_charge, np.int32)
        )
        f.create_dataset("is_decoy", data=np.asarray(is_decoy, bool))
        grp = f.create_group("peaks")
        grp.create_dataset("offsets", data=offsets)
        grp.create_dataset(
            "mz",
            data=np.concatenate(mz_chunks)
            if mz_chunks else np.zeros(0, np.float32),
        )
        grp.create_dataset(
            "intensity",
            data=np.concatenate(intensity_chunks)
            if intensity_chunks else np.zeros(0, np.float32),
        )
        grp.create_dataset(
            "ann_type",
            data=np.concatenate(ann_type_chunks)
            if ann_type_chunks else np.zeros(0, np.uint8),
        )
        grp.create_dataset(
            "ann_index",
            data=np.concatenate(ann_index_chunks)
            if ann_index_chunks else np.zeros(0, np.int16),
        )
        grp.create_dataset(
            "ann_charge",
            data=np.concatenate(ann_charge_chunks)
            if ann_charge_chunks else np.zeros(0, np.uint8),
        )
        grp = f.create_group("processed")
        k = params.max_peaks_used
        if processed:
            grp.create_dataset(
                "mz", data=np.concatenate([p.mz for p in processed])
            )
            grp.create_dataset(
                "intensity",
                data=np.concatenate([p.intensity for p in processed]),
            )
            grp.create_dataset(
                "ann_charge",
                data=np.concatenate(
                    [p.ann_charge for p in processed]
                ).astype(np.uint8),
            )
            grp.create_dataset(
                "n_peaks",
                data=np.concatenate([p.n_peaks for p in processed]),
            )
            grp.create_dataset(
                "is_valid",
                data=np.concatenate([p.is_valid for p in processed]),
            )
        else:
            grp.create_dataset("mz", data=np.zeros((0, k), np.float32))
            grp.create_dataset(
                "intensity", data=np.zeros((0, k), np.float32)
            )
            grp.create_dataset(
                "ann_charge", data=np.zeros((0, k), np.uint8)
            )
            grp.create_dataset("n_peaks", data=np.zeros(0, np.int32))
            grp.create_dataset("is_valid", data=np.zeros(0, bool))
    logger.info(
        "Built spectral library store %s (%d spectra)", filename, n_read
    )


def store_filename(library_filename: str, config_hash: str) -> str:
    base = os.path.splitext(library_filename)[0]
    return f"{base}_{config_hash[:7]}.store.h5"


def open_or_build_store(
    library_filename: str,
    config,
    params: PreprocessParams,
) -> SpectralLibraryStore:
    """Open the store for a library, rebuilding on hash/file mismatch."""
    from ann_solo_tpu.io.reader import read_library_file, verify_extension

    verify_extension(
        [".splib", ".sptxt", ".mgf", ".fasta"], library_filename
    )
    config_hash = hyperparameter_hash(config)
    filename = store_filename(library_filename, config_hash)
    source_fp = source_fingerprint(library_filename)
    if os.path.isfile(filename):
        try:
            store = SpectralLibraryStore(filename)
            if (
                store.config_hash == config_hash
                and store.source_filename
                == os.path.basename(library_filename)
                and store.source_fingerprint == source_fp
            ):
                return store
            if store.source_fingerprint != source_fp:
                # The reference's .spcfg check misses this case: a
                # library rewritten in place silently reuses the old
                # store (round-4 QUALITY corpus staleness incident).
                logger.warning(
                    "The library file content changed since the store "
                    "was built; rebuilding"
                )
            else:
                logger.warning(
                    "The spectral library store was created using "
                    "non-compatible settings; rebuilding"
                )
        except OSError as e:
            logger.warning("Failed to open library store: %s; rebuilding", e)
    else:
        logger.warning("Missing spectral library store; creating %s",
                       filename)
    build_store(
        read_library_file(library_filename, config),
        filename,
        config_hash,
        os.path.basename(library_filename),
        params,
        add_decoys=bool(config.add_decoys),
        source_fp=source_fp,
    )
    return SpectralLibraryStore(filename)
