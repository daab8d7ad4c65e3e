"""Compile-cache helper.

Separate cache directories per backend platform: mixing them is unsafe —
the axon (TPU) remote-compile service writes CPU-AOT artifacts for a
different machine configuration, and loading those on the host CPU
segfaults (observed: SIGSEGV in backend_compile_and_load).

The CPU cache path additionally carries a fingerprint of the host's CPU
feature flags: /tmp persists across rounds but the HOST can change, and
XLA:CPU AOT artifacts compiled for a different machine trigger
cpu_aot_loader "could lead to SIGILL" errors on every load (observed
round 4: a stale avx512-superset cache spamming the bench stderr)."""

from __future__ import annotations

import hashlib
import os


def _host_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("flags"):
                    return hashlib.sha256(
                        " ".join(sorted(line.split())).encode()
                    ).hexdigest()[:8]
    except OSError:
        pass
    return "unknown"


def setup_cache(jax):
    platform = jax.devices()[0].platform
    if platform == "cpu":
        path = f"/tmp/jax_cache_cpu_{_host_fingerprint()}"
    else:
        path = f"/tmp/jax_cache_{platform}"
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path
