"""ctypes bindings for the native C++ .sptxt parser (native/).

Builds the shared library on first use and exposes a columnar parse of
the whole library file in one native pass.  The reference parallelized
its Python sptxt parsing with joblib because it is slow
(reader.py:430); here the peak-text decode is native and only the small
per-entry "Mods=" strings round-trip through Python for the ProForma
rewrite.  Falls back to the pure-Python parser when the toolchain is
unavailable (callers check `available()`); parity-tested against it.
"""

from __future__ import annotations

import ctypes
import logging
import os
from typing import Iterator, Optional

import numpy as np

from ann_solo_tpu.models.spectrum import Spectrum

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native"
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsptxt_parser.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    from ann_solo_tpu.io._native_build import build_and_load

    lib = build_and_load("libsptxt_parser.so", "sptxt_parser.cpp")
    if lib is None:
        logger.warning("Native sptxt parser unavailable; using the Python "
                       "parser")
        _build_failed = True
        return None
    lib.sptxt_parse.restype = ctypes.c_void_p
    lib.sptxt_parse.argtypes = [ctypes.c_char_p]
    for name in ("sptxt_num_spectra", "sptxt_num_peaks",
                 "sptxt_peptide_chars_len", "sptxt_mods_chars_len"):
        getattr(lib, name).restype = ctypes.c_int64
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    pointer_types = {
        "sptxt_precursor_mz": ctypes.POINTER(ctypes.c_double),
        "sptxt_precursor_charge": ctypes.POINTER(ctypes.c_int32),
        "sptxt_is_decoy": ctypes.POINTER(ctypes.c_uint8),
        "sptxt_peptide_offsets": ctypes.POINTER(ctypes.c_int64),
        "sptxt_peptide_chars": ctypes.POINTER(ctypes.c_char),
        "sptxt_mods_offsets": ctypes.POINTER(ctypes.c_int64),
        "sptxt_mods_chars": ctypes.POINTER(ctypes.c_char),
        "sptxt_peak_offsets": ctypes.POINTER(ctypes.c_int64),
        "sptxt_mz": ctypes.POINTER(ctypes.c_double),
        "sptxt_intensity": ctypes.POINTER(ctypes.c_double),
        "sptxt_ann_type": ctypes.POINTER(ctypes.c_uint8),
        "sptxt_ann_index": ctypes.POINTER(ctypes.c_int16),
        "sptxt_ann_charge": ctypes.POINTER(ctypes.c_uint8),
    }
    for name, restype in pointer_types.items():
        getattr(lib, name).restype = restype
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    lib.sptxt_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _array(ptr, n, dtype):
    if n == 0:
        return np.zeros(0, dtype)
    return np.ctypeslib.as_array(ptr, shape=(n,)).astype(dtype, copy=True)


def read_sptxt_native(filename: str) -> Iterator[Spectrum]:
    """Read all spectra via the native parser (contract identical to
    `splib.read_sptxt`, incl. Mods-to-ProForma conversion)."""
    from ann_solo_tpu.io.splib import _sptxt_seq_to_proforma

    lib = _load()
    assert lib is not None, "check available() first"
    handle = lib.sptxt_parse(filename.encode())
    if not handle:
        raise IOError(f"Failed to parse sptxt file {filename}")
    try:
        n = lib.sptxt_num_spectra(handle)
        n_peaks = lib.sptxt_num_peaks(handle)
        prec_mz = _array(lib.sptxt_precursor_mz(handle), n, np.float64)
        charge = _array(lib.sptxt_precursor_charge(handle), n, np.int32)
        is_decoy = _array(lib.sptxt_is_decoy(handle), n, np.uint8)
        pep_off = _array(lib.sptxt_peptide_offsets(handle), n + 1,
                         np.int64)
        peptides = ctypes.string_at(
            lib.sptxt_peptide_chars(handle),
            lib.sptxt_peptide_chars_len(handle),
        ).decode("utf-8", "replace")
        mods_off = _array(lib.sptxt_mods_offsets(handle), n + 1, np.int64)
        mods = ctypes.string_at(
            lib.sptxt_mods_chars(handle), lib.sptxt_mods_chars_len(handle)
        ).decode("utf-8", "replace")
        peak_off = _array(lib.sptxt_peak_offsets(handle), n + 1, np.int64)
        mz = _array(lib.sptxt_mz(handle), n_peaks, np.float64)
        intensity = _array(lib.sptxt_intensity(handle), n_peaks,
                           np.float64)
        ann_type = _array(lib.sptxt_ann_type(handle), n_peaks, np.uint8)
        ann_index = _array(lib.sptxt_ann_index(handle), n_peaks, np.int16)
        ann_charge = _array(lib.sptxt_ann_charge(handle), n_peaks,
                            np.uint8)
    finally:
        lib.sptxt_free(handle)

    for i in range(n):
        lo, hi = peak_off[i], peak_off[i + 1]
        peptide = peptides[pep_off[i] : pep_off[i + 1]]
        mods_str = mods[mods_off[i] : mods_off[i + 1]]
        modifications = mods_str.split("/")[1:] if mods_str else None
        yield Spectrum(
            identifier=str(i + 1),
            precursor_mz=float(prec_mz[i]),
            precursor_charge=int(charge[i]),
            mz=mz[lo:hi],
            intensity=intensity[lo:hi],
            ann_type=ann_type[lo:hi],
            ann_index=ann_index[lo:hi],
            ann_charge=ann_charge[lo:hi],
            peptide=_sptxt_seq_to_proforma(peptide, modifications),
            is_decoy=bool(is_decoy[i]),
        )
