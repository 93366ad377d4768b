"""Persistent XLA compilation cache.

Remote TPU compiles in tunneled environments can take minutes per new
program shape; caching compiled executables on disk makes reruns (CLI
invocations, benchmarks, the per-file fan-out production pattern) start in
seconds.  Call once before building any jitted computation.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
    ".jax_cache",
)


def enable_persistent_cache(path: str = "") -> None:
    import jax

    path = path or os.environ.get(
        "ANN_SOLO_TPU_JAX_CACHE", _DEFAULT_DIR
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # cache support varies across jax versions
        logger.debug("Persistent compilation cache unavailable: %s", e)
