"""Persistent XLA compilation cache.

Serving restarts and CLI invocations re-pay 20-40s of XLA compilation per
bucketed program without it (the reference's torch eager mode has no compile
step to cache; a compiled TPU serving stack needs this to restart fast).
Enabled once per process, on-disk under ~/.cache/e2e_tts_tpu/xla by default;
opt out with E2E_TTS_NO_COMPILE_CACHE=1 or override via
E2E_TTS_COMPILE_CACHE_DIR.
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_cache() -> bool:
    """Idempotently point JAX's compilation cache at a durable directory.

    Returns True if the cache is active after the call."""
    global _enabled
    if _enabled:
        return True
    if os.environ.get("E2E_TTS_NO_COMPILE_CACHE"):
        return False
    import jax

    # TPU-only: XLA:CPU AOT results bake host machine features into the
    # cache, and reloading them under a different feature set warns about
    # possible SIGILL; CPU compiles are fast enough without a cache.
    if jax.default_backend() not in ("tpu",):
        return False

    path = os.environ.get(
        "E2E_TTS_COMPILE_CACHE_DIR",
        os.path.expanduser("~/.cache/e2e_tts_tpu/xla"),
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache anything that took meaningful compile time; tiny programs
        # aren't worth the disk round trip
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    except Exception:  # read-only fs, unknown flag on old jax
        return False
    return True
