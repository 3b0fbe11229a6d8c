"""Persistent XLA compilation cache for bench/demo subprocesses.

The heavy fused-step programs (3D Ogden tangents, mixed-precision composite)
compile in minutes on a cold machine; the persistent cache makes every
subsequent bench run on the same machine pay dispatch only — the same
mechanism tests/conftest.py uses for the CPU suite. Guarded: some backends
(remote tunnels) may reject the cache config; benches must not die for it.
"""

from __future__ import annotations

import os


def enable_compile_cache(path=None):
    import jax

    # same directory bench.py's in-process cache uses: one machine-wide cache
    cache = path or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        ".jax_cache",
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - cache is an optimization only
        pass
