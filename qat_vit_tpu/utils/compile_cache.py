"""Persistent XLA compilation cache setup.

First compiles of the big train-step programs cost minutes (more over a
tunneled TPU with remote compile); the persistent cache makes every
subsequent process start warm. Enabled by every CLI entry point; opt out
with QAT_VIT_TPU_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "qat_vit_tpu", "xla_cache"
)


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Turn on jax's persistent compilation cache (idempotent)."""
    if os.environ.get("QAT_VIT_TPU_NO_COMPILE_CACHE") == "1":
        return None
    cache_dir = (
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or DEFAULT_CACHE_DIR
    )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything, even fast compiles (the tunnel round-trip is the
        # cost, not local compile time)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return cache_dir
    except Exception as e:  # pragma: no cover - version-dependent knobs
        logger.info("compilation cache unavailable: %s", e)
        return None
