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

from ..ops import matfun, tensors
from .plasticity import GeneralIsotropicHardening, hosford_norm


def rankine_norm(smooth=1e-2, scale=1.0):
    """(Smoothed) maximum principal stress lambda_max(sig)
    (demos/cvxpy/cvxpy_materials.py Rankine via cp.lambda_max).

    Eigh-free spectral softmax: lambda_max ~= m + (1/beta) log tr(expm(beta(S - m I)))
    with m = stop_grad(lambda_max) as a numerical shift — AD through the
    matmul-only ``matfun.expm`` is finite even at coincident eigenvalues (where
    eigvalsh AD NaNs, e.g. uniaxial stress with a double zero eigenvalue).
    Overestimates by at most log(3)/beta = log(3)*smooth*scale.
    """
    beta = 1.0 / (smooth * scale)

    def norm(sig):
        S = tensors.sym_to_mat(sig)
        m = jax.lax.stop_gradient(jnp.max(jnp.linalg.eigvalsh(S)))
        # argument spectrum is [-beta*spread, 0]; 12 squarings keep the Taylor
        # core convergent up to |spectrum| ~ 2.5e3 (0.6 after 2^12 scaling)
        Eexp = matfun.expm(beta * (S - m * jnp.eye(3, dtype=sig.dtype)), squarings=12)
        return m + jnp.log(jnp.trace(Eexp)) / beta

    return norm


def l1_rankine_norm(smooth=1e-3, scale=1.0):
    """L1-Rankine sum_i |lambda_i| (demos/cvxpy/cvxpy_materials.py L1Rankine) as
    the eigh-free spectral form tr(sqrtm(S^2 + eps^2 I))."""
    eps = smooth * scale

    def norm(sig):
        S = tensors.sym_to_mat(sig)
        A = S @ S + (eps * eps) * jnp.eye(3, dtype=sig.dtype)
        return jnp.trace(matfun.sqrtm(A))

    return norm


class RankinePlasticity(GeneralIsotropicHardening):
    """Associated plasticity with the (smoothed) Rankine yield surface."""

    def __init__(self, elasticity, yield_stress, smooth=1e-3, scale=None, **kw):
        scale = scale if scale is not None else float(yield_stress(0.0))
        super().__init__(
            elasticity, yield_stress, stress_norm=rankine_norm(smooth, scale), **kw
        )


class L1RankinePlasticity(GeneralIsotropicHardening):
    def __init__(self, elasticity, yield_stress, smooth=1e-3, scale=None, **kw):
        scale = scale if scale is not None else float(yield_stress(0.0))
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
