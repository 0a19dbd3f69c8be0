"""Persistent compilation cache setup.

The reference caches compiled fatbins content-addressed by
sha256(source+flags) in a build dir (`ag-build/src/compile.rs:79-114`).  JAX's
persistent compilation cache is the same idea for XLA executables; this module
turns it on with a stable location so repeated test/bench runs skip
recompilation.  Override with TPU_EC_CACHE_DIR; disable with TPU_EC_CACHE=0.
"""

from __future__ import annotations

import os

import jax

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> str | None:
    from ..config import get_config

    cfg = get_config()
    if not cfg.cache:
        return None
    path = path or cfg.cache_dir or _DEFAULT
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    # cache across all backends including the CPU test backend
    jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    return path
