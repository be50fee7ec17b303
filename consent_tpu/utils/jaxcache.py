"""Persistent XLA compilation cache.

Compiles through the axon tunnel cost minutes per (shape, scoring)
combination; the persistent cache brings warm starts down to seconds.
Call enable() before building any jitted computation.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable(cache_dir: str | None = None) -> None:
    cache_dir = cache_dir or os.environ.get(
        "CONSENT_TPU_JAX_CACHE", _DEFAULT_DIR
    )
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
