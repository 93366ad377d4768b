"""Persistent XLA compilation cache (opt-in).

Measured on the tunneled TPU environment this framework targets, the
persistent cache is a trap: executables deserialized from disk by a new
process stall or crash at dispatch because the serialized (AOT) program
embeds a libtpu build that can differ from the terminal's (the same
mismatch crashes loudly in `jax.device_put`, see round-1
MULTICHIP_r01.json).  Fresh compiles of every program in this codebase
take seconds, so caching is disabled unless the user explicitly points
`ANN_SOLO_TPU_JAX_CACHE` at a directory (useful on non-tunneled hosts
where client and runtime share one libtpu).

Round-3 retest (same experiment, current jax/libtpu stack): a cold
process compiled and ran a representative einsum+top_k program in 50 s
and populated the cache; a second process with the warm cache HUNG
indefinitely at first dispatch and had to be killed.  The trap is
current, not historical; opt-in-off stands.  A quick-self-check gate
(compile one tiny program from cache, verify a value, enable on
success) cannot help because the failure mode is a hang, not an error.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def enable_persistent_cache(path: str = "") -> None:
    path = path or os.environ.get("ANN_SOLO_TPU_JAX_CACHE", "")
    if not path:
        return
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # cache support varies across jax versions
        logger.debug("Persistent compilation cache unavailable: %s", e)
