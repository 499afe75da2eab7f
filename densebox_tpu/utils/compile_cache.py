"""Persistent XLA compilation cache wiring.

The axon TPU tunnel compiles remotely and slowly (the landmark-enabled
pipeline takes 6-11 min on a fresh process — BASELINE.md round 3). JAX's
persistent compilation cache works through the tunnel (measured this
machine: a 43 s compile replays in 1.3 s from a second process), so every
perf harness opts in. The cache key includes the backend + compiler
version, so stale entries miss cleanly rather than mis-execute.

Opt out with DENSEBOX_NO_COMPILE_CACHE=1 (e.g. when timing cold compiles).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Point JAX at an on-disk compilation cache; returns the dir or None.

    Safe to call more than once; never raises (a perf harness must not die
    because a cache knob is missing on some jax version).
    """
    if os.environ.get("DENSEBOX_NO_COMPILE_CACHE"):
        return None
    import jax

    cache_dir = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                       _DEFAULT_DIR)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything: remote compiles are expensive at ANY size
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        return None
    return cache_dir
