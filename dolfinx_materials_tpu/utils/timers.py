"""Namespaced wall-clock timers mirroring the reference's Timer taxonomy.

The reference instruments its hot path with ``dolfinx.common.Timer`` scopes
("dx_mat: Material integration", "jaxmat: Constitutive update", "SNES: solve", ...)
read back via ``timing(name)`` / ``list_timings`` (reference:
dolfinx_materials/quadrature_map.py:302-334, jaxmat.py:209-229, solvers.py:174-187,
demos/jax/elastoplasticity/plane_elastoplasticity.py:240-249).

Here: a process-global registry of (count, total seconds). For accurate device
timing call :func:`block` or pass arrays to ``timer(..., block_on=...)`` — JAX
dispatch is async, so unblocked scopes time dispatch, not execution (the reference
has the same caveat for its GPU path and separates the first JIT pass explicitly,
jaxmat.py:214-219).
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

import jax

_REGISTRY: dict = defaultdict(lambda: [0, 0.0])


@contextmanager
def timer(name: str, block_on=None):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if block_on is not None:
            jax.block_until_ready(block_on)
        entry = _REGISTRY[name]
        entry[0] += 1
        entry[1] += time.perf_counter() - t0


def timing(name: str):
    """Return ``(count, total_seconds)`` for a timer label."""
    count, total = _REGISTRY[name]
    return count, total


def list_timings():
    """Print all timers, reference-style."""
    width = max((len(k) for k in _REGISTRY), default=10)
    for name in sorted(_REGISTRY):
        count, total = _REGISTRY[name]
        print(f"{name:<{width}}  count={count:<6d} total={total:.6f}s")


def reset_timings():
    _REGISTRY.clear()
