"""Shared build-and-load logic for the native C++ parsers.

One place for the rules every ctypes loader needs:

* rebuild when the source is newer than the shared library (live-edit
  development) or the library is missing (fresh clone -- binaries are
  never committed, see native/.gitignore rules in the repo root);
* if an existing .so fails to `dlopen` (foreign-architecture leftover,
  truncated build), force one rebuild and retry instead of crashing;
* any failure returns None so callers fall back to the Python readers.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

logger = logging.getLogger(__name__)

NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native"
)


def _make(target: str, force: bool) -> bool:
    # -C's directory argument must immediately follow it; -B goes after
    # (a round-3 sweep run on a fresh clone caught "-C -B <dir>" making
    # make chdir into a directory literally named "-B").
    cmd = ["make", "-C", NATIVE_DIR]
    if force:
        cmd.append("-B")
    cmd.append(target)
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (
        subprocess.CalledProcessError,
        subprocess.TimeoutExpired,
        FileNotFoundError,
    ) as e:
        logger.warning("Native build of %s failed (%s)", target, e)
        return False


def build_and_load(lib_name: str, src_name: str) -> Optional[ctypes.CDLL]:
    """Return a loaded CDLL for native/<lib_name>, building if needed."""
    lib_path = os.path.join(NATIVE_DIR, lib_name)
    src_path = os.path.join(NATIVE_DIR, src_name)
    stale = (
        os.path.isfile(lib_path)
        and os.path.isfile(src_path)
        and os.path.getmtime(src_path) > os.path.getmtime(lib_path)
    )
    if not os.path.isfile(lib_path) or stale:
        if not _make(lib_name, force=True):
            return None
    try:
        return ctypes.CDLL(lib_path)
    except OSError as first_err:
        # A leftover binary from another machine/toolchain: rebuild once.
        logger.warning(
            "Loading %s failed (%s); rebuilding", lib_name, first_err
        )
        if not _make(lib_name, force=True):
            return None
        try:
            return ctypes.CDLL(lib_path)
        except OSError as e:
            logger.warning("Rebuilt %s still fails to load (%s)", lib_name, e)
            return None
