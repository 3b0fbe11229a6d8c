"""Non-smooth yield surfaces (Rankine / L1-Rankine / Hosford) via smoothed
principal-stress norms + the general return mapping.

Rebuild of the reference's cvxpy conic return-mapping demo
(demos/cvxpy/cvxpy_materials.py:54-110 builds von Mises / Rankine / Hosford /
L1Rankine yield surfaces with ``cp.lambda_max``/``lambda_min``/p-norms and solves
a conic projection per Gauss point, docs/cvxpy.md:22-92). TPU-native answer: the
same yield surfaces expressed as smooth-regularized isotropic stress norms (AD
provides the flow direction), solved by the batched IFT Newton of
:class:`~dolfinx_materials_tpu.models.plasticity.GeneralIsotropicHardening` —
thousands of tiny conic projections become one vmapped implicit solve.

The smoothing parameter trades sharpness of the vertex/edge against conditioning;
with ``smooth=1e-3 * sig0`` the stress error vs the exact non-smooth surface is
O(smooth) only at vertices (validated in tests/test_conic.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import tensors
from .plasticity import GeneralIsotropicHardening, hosford_norm


def _principal(sig):
    """AD-safe principal stresses (ascending) via the closed-form Cardano
    eigenvalues — finite derivatives at coincident eigenvalues, tiny graph."""
    return tensors.eigvals33_smooth(tensors.sym_to_mat(sig))


def rankine_norm(smooth=1e-3, scale=1.0):
    """(Smoothed) maximum principal stress lambda_max(sig)
    (demos/cvxpy/cvxpy_materials.py Rankine via cp.lambda_max), as a softmax over
    the closed-form principal stresses. Overshoot <= log(3)*smooth*scale."""
    beta = 1.0 / (smooth * scale)

    def norm(sig):
        lam = _principal(sig)
        m = jax.lax.stop_gradient(lam[-1])
        return m + jnp.log(jnp.sum(jnp.exp(beta * (lam - m)))) / beta

    return norm


def l1_rankine_norm(smooth=1e-3, scale=1.0):
    """L1-Rankine sum_i |lambda_i| (demos/cvxpy/cvxpy_materials.py L1Rankine),
    with smooth-abs regularization sqrt(x^2 + (smooth*scale)^2)."""
    eps = smooth * scale

    def norm(sig):
        lam = _principal(sig)
        return jnp.sum(jnp.sqrt(lam * lam + eps * eps))

    return norm


class RankinePlasticity(GeneralIsotropicHardening):
    """Associated plasticity with the (smoothed) Rankine yield surface."""

    def __init__(self, elasticity, yield_stress, smooth=1e-3, scale=None, **kw):
        # no float(): yield_stress(0.0) may be a tracer when the behavior is
        # built inside a jitted factory (calibration.fit_parameters) — the
        # norm closures compose fine with traced scales
        scale = scale if scale is not None else yield_stress(0.0)
        super().__init__(
            elasticity, yield_stress, stress_norm=rankine_norm(smooth, scale), **kw
        )


class L1RankinePlasticity(GeneralIsotropicHardening):
    def __init__(self, elasticity, yield_stress, smooth=1e-3, scale=None, **kw):
        scale = scale if scale is not None else yield_stress(0.0)
        super().__init__(
            elasticity, yield_stress, stress_norm=l1_rankine_norm(smooth, scale), **kw
        )


class HosfordPlasticity(GeneralIsotropicHardening):
    """Hosford yield surface of exponent a (demos/multimaterials Hosford MFront
    behavior; demos/cvxpy Hosford)."""

    def __init__(self, elasticity, yield_stress, a=10.0, eps_reg=1e-10, **kw):
        super().__init__(
            elasticity, yield_stress, stress_norm=hosford_norm(a, eps_reg), **kw
        )
