"""Compile-cache helper.

Separate cache directories per backend platform: mixing them is unsafe —
the axon (TPU) remote-compile service writes CPU-AOT artifacts for a
different machine configuration, and loading those on the host CPU
segfaults (observed: SIGSEGV in backend_compile_and_load)."""

from __future__ import annotations

import os


def setup_cache(jax):
    platform = jax.devices()[0].platform
    path = f"/tmp/jax_cache_{platform}"
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
