"""Command-line interface (reference: ann_solo/ann_solo.py)."""

from __future__ import annotations

import logging
import sys
from typing import List, Optional, Union

from ann_solo_tpu import rndm

rndm.set_seeds()

from ann_solo_tpu.config import config


def ann_solo(
    spectral_library_filename: str,
    query_filename: str,
    out_filename: str,
    **kwargs: Union[bool, float, int, str],
) -> int:
    """Run a search with explicit settings (reference ann_solo.py:14-55).

    Keys must match the command-line arguments (without the '--' prefix);
    boolean flags toggle with True/False.
    """
    args = sum(
        [
            ["--" + k, str(v)]
            for k, v in kwargs.items()
            if not isinstance(v, bool)
        ],
        [],
    )
    flags = [
        "--" + k for k, v in kwargs.items() if v and isinstance(v, bool)
    ]
    return main(
        [spectral_library_filename, query_filename, out_filename,
         *args, *flags]
    )


def main(args: Optional[Union[str, List[str]]] = None) -> int:
    logging.captureWarnings(True)
    root = logging.getLogger()
    root.setLevel(logging.DEBUG)
    if not any(
        getattr(h, "_ann_solo_tpu", False) for h in root.handlers
    ):  # repeated main() calls must not stack handlers
        handler = logging.StreamHandler(sys.stderr)
        handler.setLevel(logging.DEBUG)
        handler.setFormatter(
            logging.Formatter(
                "{asctime} {levelname} [{name}/{processName}] "
                "{module}.{funcName} : {message}",
                style="{",
            )
        )
        handler._ann_solo_tpu = True
        root.addHandler(handler)
    logging.getLogger("jax").setLevel(logging.WARNING)

    config.parse(args)

    from ann_solo_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    from ann_solo_tpu import search
    from ann_solo_tpu.io import mztab

    spec_lib = search.SpectralLibrary(config.spectral_library_filename)
    identifications = spec_lib.search(config.query_filename)
    mztab.write_mztab(
        identifications,
        config.out_filename,
        spec_lib._store.get_version(),
        config,
    )
    spec_lib.shutdown()
    logging.getLogger().handlers[:] = [
        h for h in logging.getLogger().handlers
        if not getattr(h, "_ann_solo_tpu", False)
    ]
    return 0


if __name__ == "__main__":
    main()
