"""ctypes bindings for the native C++ MGF parser (native/mgf_parser.cpp).

Builds the shared library on first use and exposes a columnar parse: all
spectra of an MGF file decoded in one native pass into packed NumPy
arrays.  Falls back to the pure-Python reader when the toolchain is
unavailable (callers check `available()`).  Semantics mirror
`ann_solo_tpu.io.mgf.read_mgf` exactly (parity-tested).
"""

from __future__ import annotations

import ctypes
import logging
import math
import os
from typing import Iterator, Optional

import numpy as np

from ann_solo_tpu.models.spectrum import Spectrum

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native"
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmgf_parser.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    from ann_solo_tpu.io._native_build import build_and_load

    lib = build_and_load("libmgf_parser.so", "mgf_parser.cpp")
    if lib is None:
        logger.warning("Native MGF parser unavailable; using the Python "
                       "reader")
        _build_failed = True
        return None
    lib.mgf_parse.restype = ctypes.c_void_p
    lib.mgf_parse.argtypes = [ctypes.c_char_p]
    for name in ("mgf_num_spectra", "mgf_num_peaks",
                 "mgf_title_chars_len", "mgf_seq_chars_len"):
        getattr(lib, name).restype = ctypes.c_int64
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    pointer_types = {
        "mgf_precursor_mz": ctypes.POINTER(ctypes.c_double),
        "mgf_precursor_charge": ctypes.POINTER(ctypes.c_int32),
        "mgf_retention_time": ctypes.POINTER(ctypes.c_double),
        "mgf_is_decoy": ctypes.POINTER(ctypes.c_uint8),
        "mgf_title_offsets": ctypes.POINTER(ctypes.c_int64),
        "mgf_title_chars": ctypes.POINTER(ctypes.c_char),
        "mgf_seq_offsets": ctypes.POINTER(ctypes.c_int64),
        "mgf_seq_chars": ctypes.POINTER(ctypes.c_char),
        "mgf_peak_offsets": ctypes.POINTER(ctypes.c_int64),
        "mgf_mz": ctypes.POINTER(ctypes.c_double),
        "mgf_intensity": ctypes.POINTER(ctypes.c_double),
    }
    for name, restype in pointer_types.items():
        getattr(lib, name).restype = restype
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    lib.mgf_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _array(ptr, n, dtype):
    if n == 0:
        return np.zeros(0, dtype)
    return np.ctypeslib.as_array(ptr, shape=(n,)).astype(dtype, copy=True)


def read_mgf_native(filename: str) -> Iterator[Spectrum]:
    """Read all spectra via the native parser (same contract as
    `mgf.read_mgf`, including TITLE -> SCAN -> index identifier fallback
    and MassIVE-KB SEQ-to-ProForma conversion)."""
    from ann_solo_tpu.io.mgf import mgf_seq_to_proforma

    lib = _load()
    assert lib is not None, "check available() first"
    handle = lib.mgf_parse(filename.encode())
    if not handle:
        raise IOError(f"Failed to parse MGF file {filename}")
    try:
        n = lib.mgf_num_spectra(handle)
        n_peaks = lib.mgf_num_peaks(handle)
        prec_mz = _array(lib.mgf_precursor_mz(handle), n, np.float64)
        charge = _array(lib.mgf_precursor_charge(handle), n, np.int32)
        rt = _array(lib.mgf_retention_time(handle), n, np.float64)
        is_decoy = _array(lib.mgf_is_decoy(handle), n, np.uint8)
        title_off = _array(lib.mgf_title_offsets(handle), n + 1, np.int64)
        titles = ctypes.string_at(
            lib.mgf_title_chars(handle), lib.mgf_title_chars_len(handle)
        ).decode("utf-8", "replace")
        seq_off = _array(lib.mgf_seq_offsets(handle), n + 1, np.int64)
        seqs = ctypes.string_at(
            lib.mgf_seq_chars(handle), lib.mgf_seq_chars_len(handle)
        ).decode("utf-8", "replace")
        peak_off = _array(lib.mgf_peak_offsets(handle), n + 1, np.int64)
        mz = _array(lib.mgf_mz(handle), n_peaks, np.float64)
        intensity = _array(lib.mgf_intensity(handle), n_peaks, np.float64)
    finally:
        lib.mgf_free(handle)

    for i in range(n):
        identifier = titles[title_off[i] : title_off[i + 1]] or str(i + 1)
        if not prec_mz[i] > 0:
            # Same rule as the Python reader: malformed / missing
            # PEPMASS spectra are skipped with a warning.
            logger.warning(
                "Skipping spectrum %s without a valid precursor m/z "
                "in %s", identifier, filename,
            )
            continue
        lo, hi = peak_off[i], peak_off[i + 1]
        spectrum = Spectrum(
            identifier=identifier,
            precursor_mz=float(prec_mz[i]),
            precursor_charge=(
                int(charge[i]) if charge[i] != 0 else None
            ),
            mz=mz[lo:hi],
            intensity=intensity[lo:hi],
            retention_time=(
                float(rt[i]) if not math.isnan(rt[i]) else None
            ),
            index=i + 1,
            is_decoy=bool(is_decoy[i]),
        )
        seq = seqs[seq_off[i] : seq_off[i + 1]]
        if seq:
            spectrum.peptide = mgf_seq_to_proforma(seq)
        yield spectrum
