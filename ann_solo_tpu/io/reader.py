"""Format dispatch for library and query files.

Counterpart to the reference's reader facade (ann_solo/reader.py:262-287,
914-938).
"""

from __future__ import annotations

import logging
import os
from typing import Iterator, List

from ann_solo_tpu.models.spectrum import Spectrum

logger = logging.getLogger(__name__)


def verify_extension(supported_extensions: List[str], filename: str) -> None:
    """Check the file exists and has a supported extension
    (reference reader.py:631-654)."""
    _, ext = os.path.splitext(os.path.basename(filename))
    if ext.lower() not in supported_extensions:
        logger.error("Unrecognized file format: %s", filename)
        raise FileNotFoundError(
            f"Unrecognized file format (supported file formats: "
            f"{', '.join(supported_extensions)})"
        )
    elif not os.path.isfile(filename):
        logger.error("File not found: %s", filename)
        raise FileNotFoundError(f"File {filename} does not exist")


def read_library_file(filename: str, config) -> Iterator[Spectrum]:
    """Read/generate all spectra from a spectral library or FASTA file."""
    ext = os.path.splitext(os.path.basename(filename))[1].lower()
    if ext == ".splib":
        from ann_solo_tpu.io import splib_native

        if splib_native.available():
            yield from splib_native.read_splib_native(filename)
        else:
            from ann_solo_tpu.io.splib import read_splib

            yield from read_splib(filename)
    elif ext == ".sptxt":
        from ann_solo_tpu.io import sptxt_native

        if sptxt_native.available():
            yield from sptxt_native.read_sptxt_native(filename)
        else:
            from ann_solo_tpu.io.splib import read_sptxt

            yield from read_sptxt(filename)
    elif ext == ".mgf":
        from ann_solo_tpu.io.mgf import read_mgf

        yield from read_mgf(filename)
    elif ext == ".fasta":
        from ann_solo_tpu.io.fasta import read_fasta

        yield from read_fasta(filename, config)
    else:
        raise FileNotFoundError(f"Unsupported library format: {ext}")


def read_query_file(filename: str) -> Iterator[Spectrum]:
    """Read all query spectra from an mgf / mzML / mzXML file."""
    verify_extension([".mgf", ".mzml", ".mzxml"], filename)
    ext = os.path.splitext(os.path.basename(filename))[1].lower()
    if ext == ".mgf":
        from ann_solo_tpu.io.mgf import read_mgf

        yield from read_mgf(filename)
    elif ext == ".mzml":
        from ann_solo_tpu.io.mzml import read_mzml

        yield from read_mzml(filename)
    elif ext == ".mzxml":
        from ann_solo_tpu.io.mzml import read_mzxml

        yield from read_mzxml(filename)
