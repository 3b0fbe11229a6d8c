"""Isotropic hardening laws: callables ``p -> sigma_Y(p)``.

Rebuild of the jaxmat hardening surface (reference call sites:
demos/jax/elastoplasticity/plane_elastoplasticity.py:69 ``VoceHardening``,
tests/test_FeFp_jax.py:13-19 arbitrary Python yield-stress callables) plus the
MFront behaviors' hardening semantics (IsotropicLinearHardeningPlasticity.mfront,
RambergOsgood test behavior). Plain functions compose with AD; any user callable
``p -> sigma_Y`` is accepted wherever these classes are.
"""

from __future__ import annotations

import jax.numpy as jnp


class LinearHardening:
    """sigma_Y(p) = sigma_0 + H p (reference:
    mfront_materials/IsotropicLinearHardeningPlasticity.mfront semantics)."""

    def __init__(self, sig0, H):
        self.sig0 = sig0
        self.H = H

    def __call__(self, p):
        return self.sig0 + self.H * p


class VoceHardening:
    """Saturating exponential hardening
    sigma_Y(p) = sigma_u + (sigma_0 - sigma_u) exp(-b p).

    Matches the saturation law exercised by the reference tests
    (tests/test_FeFp_jax.py:13-16: sig0 + (sigu-sig0)(1-exp(-b p))).
    """

    def __init__(self, sig0, sigu, b):
        self.sig0 = sig0
        self.sigu = sigu
        self.b = b

    def __call__(self, p):
        return self.sig0 + (self.sigu - self.sig0) * (1.0 - jnp.exp(-self.b * p))


class SwiftHardening:
    """Power-law hardening sigma_Y(p) = sigma_0 (1 + p/eps_0)^n."""

    def __init__(self, sig0, eps0, n):
        self.sig0 = sig0
        self.eps0 = eps0
        self.n = n

    def __call__(self, p):
        return self.sig0 * (1.0 + p / self.eps0) ** self.n


class RambergOsgoodHardening:
    """Hardening consistent with a Ramberg-Osgood uniaxial curve
    eps = sig/E + alpha (sig/sig0)^n * sig0/E, inverted as
    sigma_Y(p) = sig0 * (p E / (alpha sig0))^(1/n).

    Regularized near p=0 for AD-safety. Mirrors the reference's nonlinear
    elasticity/RambergOsgood MFront test behavior
    (tests/mfront/test_nonlinear_elasticity.py).
    """

    def __init__(self, sig0, E, alpha, n, p_eps=1e-12):
        self.sig0 = sig0
        self.E = E
        self.alpha = alpha
        self.n = n
        self.p_eps = p_eps

    def __call__(self, p):
        x = jnp.maximum(p, self.p_eps) * self.E / (self.alpha * self.sig0)
        return self.sig0 * x ** (1.0 / self.n)
