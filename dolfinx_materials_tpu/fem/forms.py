"""Expression layer: per-quadrature-point kinematic expressions with AD variations.

Replaces the reference's UFL symbolic layer for the patterns it actually uses
(SURVEY.md §3.4): a registered gradient is a *function of the local field context*,
and its variation (UFL ``ufl.derivative`` / ``QuadratureExpression.variation``,
reference quadrature_function.py:53-60) is obtained by JAX AD of that function —
no symbolic algebra needed, and nonlinear expressions (finite-strain F(u)) come for
free.

An expression is ``expr(ctx) -> (size,)`` with ``ctx.u (ncomp,)``, ``ctx.grad
(ncomp, dim)``, ``ctx.x (dim,)`` evaluated at one Gauss point. Builders below
mirror the reference's kinematics helpers (dolfinx_materials/utils.py:215-258 and
the demos' ``strain(u)`` definitions, tests/uniaxial_tension.py:44-55).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

SQ2 = np.sqrt(2.0)


class Ctx(NamedTuple):
    u: jnp.ndarray  # (ncomp,) field value at the point
    grad: jnp.ndarray  # (ncomp, dim) field gradient
    x: jnp.ndarray  # (dim,) physical coordinates


def mandel_strain_2d(plane="strain"):
    """2D displacement -> Mandel strain 6-vector [exx, eyy, 0, s2 exy, 0, 0]
    (the demos' ``strain(u)``, tests/uniaxial_tension.py:44-55)."""

    def expr(ctx):
        g = ctx.grad
        exy = 0.5 * (g[0, 1] + g[1, 0])
        z = jnp.zeros((), g.dtype)
        return jnp.stack([g[0, 0], g[1, 1], z, SQ2 * exy, z, z])

    return expr


def plane_stress_strain_3():
    """2D displacement -> plane-stress Mandel 3-vector [exx, eyy, s2 exy] —
    the kinematics of the reference's cvxpy materials (gradient Strain (3,),
    cvxpy_materials.py:22-27), work-conjugate to their 3-vector Stress."""

    def expr(ctx):
        g = ctx.grad
        return jnp.stack(
            [g[0, 0], g[1, 1], SQ2 * 0.5 * (g[0, 1] + g[1, 0])]
        )

    return expr


def mandel_strain_3d():
    """3D displacement -> Mandel strain 6-vector (utils.py:246-248 semantics)."""

    def expr(ctx):
        g = ctx.grad
        return jnp.stack(
            [
                g[0, 0],
                g[1, 1],
                g[2, 2],
                SQ2 * 0.5 * (g[0, 1] + g[1, 0]),
                SQ2 * 0.5 * (g[0, 2] + g[2, 0]),
                SQ2 * 0.5 * (g[1, 2] + g[2, 1]),
            ]
        )

    return expr


def mandel_strain(dim):
    return mandel_strain_2d() if dim == 2 else mandel_strain_3d()


def deformation_gradient_2d():
    """2D displacement -> F = I + grad(u) as a 9-vector with F33 = 1
    (utils.py:251-253 with T22=1)."""

    def expr(ctx):
        g = ctx.grad
        one = jnp.ones((), g.dtype)
        z = jnp.zeros((), g.dtype)
        return jnp.stack(
            [1 + g[0, 0], 1 + g[1, 1], one, g[0, 1], g[1, 0], z, z, z, z]
        )

    return expr


def deformation_gradient_3d():
    def expr(ctx):
        g = ctx.grad
        return jnp.stack(
            [
                1 + g[0, 0], 1 + g[1, 1], 1 + g[2, 2],
                g[0, 1], g[1, 0], g[0, 2], g[2, 0], g[1, 2], g[2, 1],
            ]
        )

    return expr


def deformation_gradient(dim):
    return deformation_gradient_2d() if dim == 2 else deformation_gradient_3d()


def axisymmetric_strain():
    """Axisymmetric (r, z) displacement (u_r, u_z) -> Mandel strain
    [e_rr, e_tt, e_zz, 0, s2 e_rz, 0] with the hoop strain u_r / r
    (reference ``axi_grad``, utils.py:215-237). With axes ordered (r, theta, z),
    the r-z shear lives in the 13-slot (Mandel index 4), matching the reference's
    ``axi_grad`` + ``symmetric_tensor_to_vector`` convention — principal-stress
    models and rotation operators rely on this placement. Pair with a
    QuadratureDomain ``weight=lambda x: 2*pi*x[:, 0]`` measure."""

    def expr(ctx):
        g = ctx.grad
        r = ctx.x[0]
        z = jnp.zeros((), g.dtype)
        erz = 0.5 * (g[0, 1] + g[1, 0])
        return jnp.stack([g[0, 0], ctx.u[0] / r, g[1, 1], z, SQ2 * erz, z])

    return expr


def scalar_gradient():
    """Scalar field -> its spatial gradient (dim,) (heat conduction ∇T)."""

    def expr(ctx):
        return ctx.grad[0]

    return expr


def scalar_value():
    """Scalar field -> (1,) value (external-state-variable expressions, e.g. the
    temperature itself in generalized behaviors)."""

    def expr(ctx):
        return ctx.u[:1]

    return expr
