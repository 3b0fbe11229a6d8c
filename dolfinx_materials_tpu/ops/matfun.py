"""Differentiable matrix functions of symmetric 3x3 tensors — without eigh.

The finite-strain models need logm/expm/powm of (near-)SPD 3x3 tensors
(Hencky strain measures, exponential-map plastic flow, Ogden stretch powers —
reference: mfront_materials/Ogden.mfront eigen-decomposition path,
demos/mfront/finite_strain_elastoplasticity `@StrainMeasure Hencky`). Standard
eigendecomposition AD (``jnp.linalg.eigh``) produces NaN derivatives at coincident
eigenvalues — and the reference configuration F = I is *exactly* that point.

TPU-first design: iterative matrix algorithms built ONLY from matmuls and adds,
with *fixed* iteration counts -> (a) infinitely differentiable everywhere incl.
repeated eigenvalues, (b) static control flow for XLA, (c) all FLOPs on the MXU.

- ``sqrtm``: Denman–Beavers iteration (quadratically convergent),
- ``logm``: inverse scaling-squaring (k square roots, then atanh-series),
- ``expm``: scaling-squaring with a Taylor core,
- ``powm``: expm(a * logm(X)).

Accuracy: ~1e-14 relative for SPD matrices with eigenvalues in [1e-3, 1e3]
(validated against scipy in tests/test_matfun.py).
"""

from __future__ import annotations

import jax.numpy as jnp

_I3 = jnp.eye(3)


def _eye(X):
    return jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), X.shape)


def sqrtm(X, iters: int = 12):
    """Principal square root of SPD ``(..., 3, 3)`` via Denman–Beavers.

    Scaled variant (determinant scaling) for fast convergence; 12 coupled
    iterations reach f64 machine precision for condition numbers up to ~1e6.
    """
    I = _eye(X)
    Y, Z = X, I

    for _ in range(iters):
        # determinant scaling accelerates convergence
        dY = jnp.linalg.det(Y)
        dZ = jnp.linalg.det(Z)
        g = (jnp.abs(dY * dZ)) ** (-1.0 / 6.0)
        g = jnp.where(jnp.isfinite(g) & (g > 0), g, 1.0)[..., None, None]
        Ys, Zs = g * Y, g * Z
        Yn = 0.5 * (Ys + jnp.linalg.inv(Zs))
        Zn = 0.5 * (Zs + jnp.linalg.inv(Ys))
        Y, Z = Yn, Zn
    return Y


def _sqrtm_db(X, iters):
    """Unscaled Denman–Beavers (used inside logm where scaling would shift the log)."""
    I = _eye(X)
    Y, Z = X, I
    for _ in range(iters):
        Yn = 0.5 * (Y + jnp.linalg.inv(Z))
        Zn = 0.5 * (Z + jnp.linalg.inv(Y))
        Y, Z = Yn, Zn
    return Y


def logm(X, roots: int = 6, series_terms: int = 12, db_iters: int = 10):
    """Principal logarithm of SPD ``(..., 3, 3)`` by inverse scaling-squaring.

    X^(1/2^roots) -> A = X_r - I small -> log via the atanh series
    ``log(X_r) = 2 atanh(S)`` with ``S = (X_r - I)(X_r + I)^{-1}`` (Gregory series,
    twice the convergence radius of the plain Mercator series), then multiply back
    by 2^roots. With 6 roots, eigenvalues in [1e-3, 1e3] map to [0.897, 1.114]:
    the Gregory series in S (norm < 0.06) converges to <1e-16 in 6 odd terms.
    """
    I = _eye(X)
    Xr = X
    for _ in range(roots):
        Xr = _sqrtm_db(Xr, db_iters)
    S = (Xr - I) @ jnp.linalg.inv(Xr + I)
    S2 = S @ S
    # 2*atanh(S) = 2*(S + S^3/3 + S^5/5 + ...)
    acc = I * 0.0
    term = S
    for k in range(series_terms):
        acc = acc + term / (2 * k + 1)
        term = term @ S2
    L = 2.0 * acc
    return L * (2.0**roots)


def expm(X, squarings: int = 12, series_terms: int = 14):
    """Matrix exponential of symmetric ``(..., 3, 3)`` by scaling-squaring + Taylor.

    12 squarings handle ||X|| up to ~1e3 with a 14-term Taylor core at f64
    precision; plastic-flow exponents in practice have ||X|| = O(1e-2).
    """
    s = 2.0**squarings
    A = X / s
    I = _eye(X)
    acc = I
    term = I
    for k in range(1, series_terms + 1):
        term = term @ A / k
        acc = acc + term
    for _ in range(squarings):
        acc = acc @ acc
    return acc


def powm(X, a, roots: int = 6, **kw):
    """X^a for SPD X via expm(a logm(X)); a may be traced."""
    return expm(a * logm(X, roots=roots), **kw)


def tr_powm(X, a, roots: int = 6):
    """trace(X^a) — the Ogden building block Σ lambda_i^a, eigh-free."""
    P = powm(X, a, roots=roots)
    return P[..., 0, 0] + P[..., 1, 1] + P[..., 2, 2]
