"""Persistent XLA compilation cache.

Compiles in this environment are expensive (tens of seconds even for small
graphs); the persistent cache makes every geometry a one-time cost. Enabled on
package import (see dehaze_tpu/__init__.py); opt out with DEHAZE_TPU_NO_CACHE=1
or override the location with DEHAZE_TPU_CACHE_DIR.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")

_enabled = False


def enable_compilation_cache(path: str | None = None) -> None:
    global _enabled
    if _enabled or os.environ.get("DEHAZE_TPU_NO_CACHE"):
        return
    import jax

    if path is None:
        path = os.environ.get("DEHAZE_TPU_CACHE_DIR", _DEFAULT_DIR)
        # Separate caches per platform: the remote (tunnel) compile service
        # emits XLA:CPU AOT artifacts for a different host CPU (AVX512-AMX);
        # loading those locally SIGILLs. Platform is decided before backend
        # init by JAX_PLATFORMS (the axon sitecustomize sets it to the TPU).
        platform = os.environ.get("JAX_PLATFORMS", "default").split(",")[0]
        path = os.path.join(path, platform or "default")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
