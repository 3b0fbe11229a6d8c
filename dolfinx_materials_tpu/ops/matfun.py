"""Differentiable matrix functions of symmetric 3x3 tensors — matmul-only.

The finite-strain models need logm/expm/powm of (near-)SPD 3x3 tensors
(Hencky strain measures, exponential-map plastic flow, Ogden stretch powers —
reference: mfront_materials/Ogden.mfront eigen-decomposition path,
demos/mfront/finite_strain_elastoplasticity `@StrainMeasure Hencky`). Standard
eigendecomposition AD (``jnp.linalg.eigh``) produces NaN derivatives at coincident
eigenvalues — and the reference configuration F = I is *exactly* that point.

TPU-first design: every algorithm here is built ONLY from matmuls/adds with
FIXED iteration counts ->
(a) infinitely differentiable everywhere incl. repeated eigenvalues,
(b) static control flow for XLA,
(c) all FLOPs on the MXU,
(d) NO linear solves: ``jnp.linalg.inv`` lowers to a batched LU whose (n,3,3)
    triangular solves pad ~57x on TPU (HBM blowup), and closed-form adjugate
    inverses explode AD graph sizes — Newton-Schulz coupled iterations avoid
    both.

- ``sqrtm``: trace-prescaled Newton-Schulz (also yields the inverse sqrt),
- ``logm``: inverse scaling-squaring (k Newton-Schulz roots, Gregory series with
  the (X+I)^{-1} from a Newton inverse iteration),
- ``expm``: scaling-squaring with a Taylor core,
- ``powm``: expm(a * logm(X)).

Accuracy: ~1e-13 relative for SPD matrices with eigenvalue condition up to ~1e4
(validated against scipy in tests/test_matfun.py).
"""

from __future__ import annotations

import jax.numpy as jnp


def _eye(X):
    return jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), X.shape)


def _tr(X):
    return X[..., 0, 0] + X[..., 1, 1] + X[..., 2, 2]


def sqrtm_ns(X, iters: int = 18):
    """Coupled Newton-Schulz: returns (sqrt(X), inv(sqrt(X))) for SPD X.

    Trace-prescaling maps the spectrum into (0, 3] where the iteration converges;
    18 iterations cover eigenvalue spread up to ~1e4 at f64 precision.
    """
    c = _tr(X) / 3.0
    c = jnp.where(c <= 0, 1.0, c)[..., None, None]
    A = X / c
    I = _eye(X)
    Y, Z = A, I
    for _ in range(iters):
        T = 0.5 * (3.0 * I - Z @ Y)
        Y = Y @ T
        Z = T @ Z
    s = jnp.sqrt(c)
    return s * Y, Z / s


def sqrtm(X, iters: int = 18):
    """Principal square root of SPD ``(..., 3, 3)``."""
    return sqrtm_ns(X, iters)[0]


def _inv_near(A, X0, iters: int = 8):
    """Newton inverse iteration X <- X (2I - A X); quadratic given a decent X0."""
    I2 = 2.0 * _eye(A)
    X = X0
    for _ in range(iters):
        X = X @ (I2 - A @ X)
    return X


def inv_spd(X, iters: int = 18):
    """Matmul-only SPD inverse via Newton-Schulz (inv(sqrt))^2."""
    _, Zi = sqrtm_ns(X, iters)
    return Zi @ Zi


def logm(X, roots: int = 5, series_terms: int = 10, ns_iters: int = 16):
    """Principal logarithm of SPD ``(..., 3, 3)`` by inverse scaling-squaring.

    X^(1/2^roots) -> Gregory series ``log(Xr) = 2 atanh(S)``,
    ``S = (Xr - I)(Xr + I)^{-1}``; multiply back by 2^roots. With 5 roots,
    eigenvalues in [1e-3, 1e3] map to [0.81, 1.24]: the series (|S| < 0.11)
    reaches <1e-16 in 5 odd terms. The single inverse uses a Newton iteration
    seeded at I/2 (Xr + I is within ~12% of 2I after the roots).
    """
    I = _eye(X)
    Xr = X
    for _ in range(roots):
        Xr = sqrtm(Xr, ns_iters)
    S = (Xr - I) @ _inv_near(Xr + I, 0.5 * I)
    S2 = S @ S
    acc = jnp.zeros_like(X)
    term = S
    for k in range(series_terms):
        acc = acc + term / (2 * k + 1)
        term = term @ S2
    return (2.0**(roots + 1)) * acc


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


def powm(X, a, roots: int = 5, **kw):
    """X^a for SPD X via expm(a logm(X)); a may be traced."""
    return expm(a * logm(X, roots=roots), **kw)


def tr_powm(X, a, roots: int = 5):
    """trace(X^a) — the Ogden building block Σ lambda_i^a, eigh-free."""
    P = powm(X, a, roots=roots)
    return _tr(P)
