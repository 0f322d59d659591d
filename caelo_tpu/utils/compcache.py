"""Persistent XLA compilation cache.

Remote-TPU compiles cost 1-4 minutes per distinct jitted program (and the
fused Pallas NMS kernel ~3 min of Mosaic compile); a persistent cache makes
them one-time costs per container instead of per process.  The reference has
no analog (its 'cache' is Keras .h5 re-loading); this is TPU-operational
infrastructure the framework owes its users.
"""
from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/caelo_tpu/xla")


def enable_compilation_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` (created if
    missing).  Call before the first jit dispatch; returns the directory.

    Safe to call multiple times; subsequent calls just update the path.
    """
    import jax

    p = os.path.abspath(os.path.expanduser(path or DEFAULT_CACHE_DIR))
    os.makedirs(p, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", p)
    # cache everything that took noticeable compile time; the big pipeline
    # programs are multi-minute, the threshold only filters trivial ops
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return p


def cache_entries(path: str | None = None) -> int:
    """Number of persisted executables (for tests/telemetry)."""
    p = os.path.abspath(os.path.expanduser(path or DEFAULT_CACHE_DIR))
    if not os.path.isdir(p):
        return 0
    return sum(1 for n in os.listdir(p) if not n.startswith("."))
