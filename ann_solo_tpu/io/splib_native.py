"""ctypes bindings for the native C++ .splib parser (native/).

Builds the shared library on first use (g++ is part of the toolchain) and
exposes a columnar parse: all spectra of a .splib file decoded in one native
pass into packed NumPy arrays.  Falls back to the pure-Python parser when
the toolchain is unavailable (callers check `available()`).
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
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsplib_parser.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    from ann_solo_tpu.io._native_build import build_and_load

    lib = build_and_load("libsplib_parser.so", "splib_parser.cpp")
    if lib is None:
        logger.warning("Native splib parser unavailable; using the Python "
                       "parser")
        _build_failed = True
        return None
    lib.splib_parse.restype = ctypes.c_void_p
    lib.splib_parse.argtypes = [ctypes.c_char_p]
    for name in ("splib_num_spectra", "splib_num_peaks",
                 "splib_peptide_chars_len"):
        getattr(lib, name).restype = ctypes.c_int64
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    pointer_types = {
        "splib_identifiers": ctypes.POINTER(ctypes.c_uint32),
        "splib_precursor_mz": ctypes.POINTER(ctypes.c_double),
        "splib_precursor_charge": ctypes.POINTER(ctypes.c_int32),
        "splib_is_decoy": ctypes.POINTER(ctypes.c_uint8),
        "splib_peptide_offsets": ctypes.POINTER(ctypes.c_int64),
        "splib_peptide_chars": ctypes.POINTER(ctypes.c_char),
        "splib_peak_offsets": ctypes.POINTER(ctypes.c_int64),
        "splib_mz": ctypes.POINTER(ctypes.c_float),
        "splib_intensity": ctypes.POINTER(ctypes.c_float),
        "splib_ann_type": ctypes.POINTER(ctypes.c_uint8),
        "splib_ann_index": ctypes.POINTER(ctypes.c_int16),
        "splib_ann_charge": ctypes.POINTER(ctypes.c_uint8),
    }
    for name, restype in pointer_types.items():
        getattr(lib, name).restype = restype
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    lib.splib_free.argtypes = [ctypes.c_void_p]
    lib.splib_free.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


class NativeSplib:
    """Columnar view over a natively parsed .splib file."""

    def __init__(self, filename: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native splib parser unavailable")
        handle = lib.splib_parse(filename.encode())
        if not handle:
            raise OSError(f"Failed to parse {filename}")
        try:
            n = lib.splib_num_spectra(handle)
            n_peaks = lib.splib_num_peaks(handle)
            n_chars = lib.splib_peptide_chars_len(handle)

            def copy(fn, count, dtype):
                if count == 0:
                    return np.zeros(0, dtype)
                return np.ctypeslib.as_array(
                    fn(handle), shape=(count,)
                ).astype(dtype, copy=True)

            self.identifiers = copy(lib.splib_identifiers, n, np.uint32)
            self.precursor_mz = copy(
                lib.splib_precursor_mz, n, np.float64
            )
            self.precursor_charge = copy(
                lib.splib_precursor_charge, n, np.int32
            )
            self.is_decoy = copy(lib.splib_is_decoy, n, np.uint8)
            self.peptide_offsets = copy(
                lib.splib_peptide_offsets, n + 1, np.int64
            )
            raw = ctypes.string_at(
                lib.splib_peptide_chars(handle), n_chars
            )
            self.peptide_chars = raw.decode("utf-8", errors="replace")
            self.peak_offsets = copy(
                lib.splib_peak_offsets, n + 1, np.int64
            )
            self.mz = copy(lib.splib_mz, n_peaks, np.float32)
            self.intensity = copy(lib.splib_intensity, n_peaks, np.float32)
            self.ann_type = copy(lib.splib_ann_type, n_peaks, np.uint8)
            self.ann_index = copy(lib.splib_ann_index, n_peaks, np.int16)
            self.ann_charge = copy(lib.splib_ann_charge, n_peaks, np.uint8)
        finally:
            lib.splib_free(handle)

    @property
    def n_spectra(self) -> int:
        return len(self.identifiers)

    def peptide(self, i: int) -> str:
        return self.peptide_chars[
            self.peptide_offsets[i] : self.peptide_offsets[i + 1]
        ]

    def spectra(self) -> Iterator[Spectrum]:
        for i in range(self.n_spectra):
            lo, hi = self.peak_offsets[i], self.peak_offsets[i + 1]
            yield Spectrum(
                identifier=str(int(self.identifiers[i])),
                precursor_mz=float(self.precursor_mz[i]),
                precursor_charge=int(self.precursor_charge[i]),
                mz=self.mz[lo:hi],
                intensity=self.intensity[lo:hi],
                ann_type=self.ann_type[lo:hi],
                ann_index=self.ann_index[lo:hi],
                ann_charge=self.ann_charge[lo:hi],
                peptide=self.peptide(i),
                is_decoy=bool(self.is_decoy[i]),
            )


def read_splib_native(filename: str) -> Iterator[Spectrum]:
    yield from NativeSplib(filename).spectra()
