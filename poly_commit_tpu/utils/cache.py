"""Persistent-compile-cache setup shared by tests, benches, and the driver
entry points.

Two hazards shape this:
  * CPU and TPU caches must be SEPARATE directories: axon (remote-TPU)
    compiles persist CPU-AOT executables for the *server's*
    microarchitecture, which SIGILL a local CPU process that loads them.
  * XLA:CPU AOT entries are specific to the HOST microarchitecture: an
    entry written by one machine segfaults another (observed: pytest
    crash inside jax compilation_cache.get_executable_and_time loading a
    cache written on an avx512-different box). The CPU cache dir is
    therefore keyed by a fingerprint of the host's CPU feature flags, so
    a repo checkout moved between machines never replays foreign code.
"""

from __future__ import annotations

import hashlib
import os

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def machine_fingerprint() -> str:
    """Stable per-microarchitecture id: hash of the CPU feature flags."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.md5(platform.processor().encode()).hexdigest()[:10]


def cache_dir(cpu: bool) -> str:
    if cpu:
        return os.path.join(_REPO, f".jax_cache_cpu_{machine_fingerprint()}")
    return os.path.join(_REPO, ".jax_cache")


def enable_compile_cache(cpu: bool | None = None) -> str:
    """Point jax's persistent compilation cache at the right directory.

    cpu=None auto-detects from JAX_PLATFORMS (the driver/bench convention).
    Must run before the first compilation; safe to call repeatedly.
    """
    import jax

    if cpu is None:
        cpu = os.environ.get("JAX_PLATFORMS", "") == "cpu"
    path = cache_dir(cpu)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # persist EVERY compile: the 1-core eval box re-pays thousands of
        # sub-second EC-op jits per cold run otherwise (round-3 lesson)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return path
