"""Mandel-convention tensor algebra (MFront ordering) as pure jnp kernels.

Conventions match the reference's UFL converters (reference:
dolfinx_materials/utils.py:146-212):

- symmetric 2nd-order tensor -> 6-vector ``[T11, T22, T33, s2*T12, s2*T13, s2*T23]``
  with ``s2 = sqrt(2)`` (Mandel: double contraction == plain dot product),
- non-symmetric 2nd-order tensor -> 9-vector
  ``[T11, T22, T33, T12, T21, T13, T31, T23, T32]``,
- 4th-order tensors on symmetric 2nd-order space -> 6x6 Mandel matrices, so that
  tensor composition == matrix multiply and no Voigt factor bookkeeping is needed.

All functions are shape-polymorphic over leading batch axes where noted, jit-safe,
and differentiable.
"""

import jax.numpy as jnp
import numpy as np

SQ2 = np.sqrt(2.0)

#: Second-order identity in Mandel 6-vector form.
I2 = np.array([1.0, 1.0, 1.0, 0.0, 0.0, 0.0])
#: Fourth-order symmetric identity in Mandel form (just the 6x6 identity).
I4 = np.eye(6)
#: Spherical projector J = (1/3) I2 (x) I2.
J4 = np.outer(I2, I2) / 3.0
#: Deviatoric projector K = I4 - J4.
K4 = I4 - J4

# Index maps for the non-symmetric 9-vector convention.
# vector position k -> (i, j) of the 3x3 tensor
_NS_IDX = np.array(
    [(0, 0), (1, 1), (2, 2), (0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)]
)
# (i, j) -> vector position
_NS_POS = np.zeros((3, 3), dtype=np.int64)
for _k, (_i, _j) in enumerate(_NS_IDX):
    _NS_POS[_i, _j] = _k

# transpose permutation on the 9-vector: swaps (i,j)<->(j,i)
T9_PERM = np.array([_NS_POS[j, i] for (i, j) in _NS_IDX])

#: Identity tensor as a 9-vector.
I9 = np.array([1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])


def tr(v):
    """Trace of a Mandel 6-vector (or 9-vector) ``(..., 6|9)``."""
    return v[..., 0] + v[..., 1] + v[..., 2]


def dev(v):
    """Deviatoric part of a Mandel 6-vector ``(..., 6)``."""
    m = tr(v)[..., None] / 3.0
    iso = m * jnp.asarray(I2, dtype=v.dtype)
    return v - iso


def ddot(a, b):
    """Double contraction a:b of two Mandel 6-vectors — a plain dot product."""
    return jnp.sum(a * b, axis=-1)


def norm(v):
    """Frobenius norm sqrt(v:v) of a Mandel 6-vector."""
    return jnp.sqrt(ddot(v, v))


def eq_vm(sig):
    """Von Mises equivalent stress sqrt(3/2 s:s) of a Mandel stress 6-vector."""
    s = dev(sig)
    return jnp.sqrt(1.5 * ddot(s, s))


def eq_vm_safe(sig, scale):
    """Von Mises stress with a smooth guard at s = 0.

    ``sqrt`` has an infinite derivative at the origin; under ``jacfwd`` the
    (correctly zero) plastic terms then produce 0 * inf = NaN tangents at
    stress-free points — the initial state of every simulation. The guard adds
    ``(1e-14 * scale)^2`` under the root: relative error < 1e-28, derivative
    finite everywhere.
    """
    s = dev(sig)
    tiny = (1e-14 * scale) ** 2
    return jnp.sqrt(1.5 * ddot(s, s) + tiny)


def outer66(a, b):
    """Tensor (dyadic) product of two 6-vectors -> (..., 6, 6) Mandel matrix."""
    return a[..., :, None] * b[..., None, :]


def sym_to_mat(v):
    """Mandel 6-vector ``(..., 6)`` -> full symmetric 3x3 tensor ``(..., 3, 3)``.

    Reference semantics: dolfinx_materials/utils.py:193-212 (``vector_to_tensor``).
    """
    a, b, c = v[..., 0], v[..., 1], v[..., 2]
    d = v[..., 3] / SQ2
    e = v[..., 4] / SQ2
    f = v[..., 5] / SQ2
    row0 = jnp.stack([a, d, e], axis=-1)
    row1 = jnp.stack([d, b, f], axis=-1)
    row2 = jnp.stack([e, f, c], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def mat_to_sym(T):
    """Symmetric 3x3 tensor ``(..., 3, 3)`` -> Mandel 6-vector ``(..., 6)``.

    Symmetrizes its input. Reference semantics: dolfinx_materials/utils.py:146-165.
    """
    S = 0.5 * (T + jnp.swapaxes(T, -1, -2))
    return jnp.stack(
        [
            S[..., 0, 0],
            S[..., 1, 1],
            S[..., 2, 2],
            SQ2 * S[..., 0, 1],
            SQ2 * S[..., 0, 2],
            SQ2 * S[..., 1, 2],
        ],
        axis=-1,
    )


def nonsym_to_mat(v):
    """9-vector ``(..., 9)`` -> full 3x3 tensor ``(..., 3, 3)``.

    Ordering [11,22,33,12,21,13,31,23,32] per dolfinx_materials/utils.py:168-190.
    """
    rows = [
        jnp.stack([v[..., 0], v[..., 3], v[..., 5]], axis=-1),
        jnp.stack([v[..., 4], v[..., 1], v[..., 7]], axis=-1),
        jnp.stack([v[..., 6], v[..., 8], v[..., 2]], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def mat_to_nonsym(T):
    """Full 3x3 tensor ``(..., 3, 3)`` -> 9-vector ``(..., 9)``."""
    return jnp.stack(
        [
            T[..., 0, 0],
            T[..., 1, 1],
            T[..., 2, 2],
            T[..., 0, 1],
            T[..., 1, 0],
            T[..., 0, 2],
            T[..., 2, 0],
            T[..., 1, 2],
            T[..., 2, 1],
        ],
        axis=-1,
    )


def transpose9(v):
    """Transpose acting on the 9-vector representation."""
    return v[..., jnp.asarray(T9_PERM)]


def _mandel_basis():
    """Orthonormal basis E_a of symmetric 3x3 tensors matching the Mandel map."""
    E = np.zeros((6, 3, 3))
    for a, (i, j) in enumerate([(0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2)]):
        if i == j:
            E[a, i, j] = 1.0
        else:
            E[a, i, j] = E[a, j, i] = 1.0 / SQ2
    return E


MANDEL_BASIS = _mandel_basis()


def rotation_to_mandel6(R):
    """Build the 6x6 Mandel rotation operator Q such that
    ``mandel(R A R^T) = Q @ mandel(A)`` for symmetric A.

    Since the Mandel map is a linear isometry with orthonormal basis ``E_a``,
    ``Q_ab = <E_a, R E_b R^T>_F``. R: ``(..., 3, 3)`` rotation matrices. Replaces the
    reference's MGIS ``rotateGradients``/``rotateThermodynamicForces`` C++ rotation
    machinery (dolfinx_materials/mfront.py:336-343) by a batched dense operator so
    that frame rotations become plain (MXU-friendly) matmuls.
    """
    E = jnp.asarray(MANDEL_BASIS, dtype=R.dtype)
    return jnp.einsum("aij,...ik,bkl,...jl->...ab", E, R, E, R)


def rotation_to_9(R):
    """Build the 9x9 operator Q9 with ``vec9(R A R^T) = Q9 @ vec9(A)`` for general A."""
    i, j = _NS_IDX[:, 0], _NS_IDX[:, 1]
    k, l = _NS_IDX[:, 0], _NS_IDX[:, 1]
    return R[..., i[:, None], k[None, :]] * R[..., j[:, None], l[None, :]]


def det33(T):
    """Determinant of ``(..., 3, 3)``; closed form (no LU) — cheap under vmap/pallas."""
    return (
        T[..., 0, 0] * (T[..., 1, 1] * T[..., 2, 2] - T[..., 1, 2] * T[..., 2, 1])
        - T[..., 0, 1] * (T[..., 1, 0] * T[..., 2, 2] - T[..., 1, 2] * T[..., 2, 0])
        + T[..., 0, 2] * (T[..., 1, 0] * T[..., 2, 1] - T[..., 1, 1] * T[..., 2, 0])
    )


def inv33(T):
    """Closed-form inverse of ``(..., 3, 3)`` via the adjugate."""
    c00 = T[..., 1, 1] * T[..., 2, 2] - T[..., 1, 2] * T[..., 2, 1]
    c01 = T[..., 0, 2] * T[..., 2, 1] - T[..., 0, 1] * T[..., 2, 2]
    c02 = T[..., 0, 1] * T[..., 1, 2] - T[..., 0, 2] * T[..., 1, 1]
    c10 = T[..., 1, 2] * T[..., 2, 0] - T[..., 1, 0] * T[..., 2, 2]
    c11 = T[..., 0, 0] * T[..., 2, 2] - T[..., 0, 2] * T[..., 2, 0]
    c12 = T[..., 0, 2] * T[..., 1, 0] - T[..., 0, 0] * T[..., 1, 2]
    c20 = T[..., 1, 0] * T[..., 2, 1] - T[..., 1, 1] * T[..., 2, 0]
    c21 = T[..., 0, 1] * T[..., 2, 0] - T[..., 0, 0] * T[..., 2, 1]
    c22 = T[..., 0, 0] * T[..., 1, 1] - T[..., 0, 1] * T[..., 1, 0]
    adj = jnp.stack(
        [
            jnp.stack([c00, c01, c02], axis=-1),
            jnp.stack([c10, c11, c12], axis=-1),
            jnp.stack([c20, c21, c22], axis=-1),
        ],
        axis=-2,
    )
    return adj / det33(T)[..., None, None]


def eigh33(S):
    """Eigendecomposition of symmetric ``(..., 3, 3)``; thin wrapper for now.

    Kept as a seam so a closed-form (trig) batched implementation / Pallas kernel can
    replace ``jnp.linalg.eigh`` on the hot finite-strain path later.
    """
    return jnp.linalg.eigh(S)


def eigvals33_smooth(S, eps=1e-12, delta=1e-12):
    """Closed-form (trigonometric/Cardano) eigenvalues of symmetric ``(...,3,3)``,
    ascending, with smooth guards so AD stays FINITE at coincident eigenvalues.

    ``jnp.linalg.eigvalsh``'s derivative NaNs at degenerate spectra (the zero
    stress / hydrostatic states every simulation visits); this form degrades to a
    bounded, slightly-inexact derivative there instead (errors O(sqrt(delta))
    only near degeneracy). ~50 elementwise ops — no iterative algorithm, so
    forward-over-reverse AD through it is cheap (the matrix-function alternative
    compiles to thousands of ops).
    """
    # dtype-aware guards: in f32, 1 - 1e-12 rounds to EXACTLY 1.0, the clip
    # becomes a no-op, and d(arccos)/dr = -1/sqrt(1-r^2) returns inf -> NaN
    # tangents at coincident eigenvalues (f32 TPU pipelines hit this; f64 does
    # not). Clamp both guards to a few ulps of the input dtype.
    feps = jnp.finfo(S.dtype).eps
    eps = jnp.maximum(eps, 4.0 * feps)
    delta = jnp.maximum(delta, 8.0 * feps)

    q = (S[..., 0, 0] + S[..., 1, 1] + S[..., 2, 2]) / 3.0
    B = S - q[..., None, None] * jnp.eye(3, dtype=S.dtype)
    p2 = jnp.sum(B * B, axis=(-2, -1))
    scale2 = jnp.sum(S * S, axis=(-2, -1))
    p = jnp.sqrt(p2 / 6.0 + eps * eps * (scale2 + 1.0))
    Bn = B / p[..., None, None]
    r = det33(Bn) / 2.0
    r = jnp.clip(r, -1.0 + delta, 1.0 - delta)
    phi = jnp.arccos(r) / 3.0
    lam1 = q + 2.0 * p * jnp.cos(phi)  # largest
    lam3 = q + 2.0 * p * jnp.cos(phi + 2.0 * np.pi / 3.0)  # smallest
    lam2 = 3.0 * q - lam1 - lam3
    return jnp.stack([lam3, lam2, lam1], axis=-1)


def isotropic_C(E, nu, dtype=None):
    """6x6 Mandel stiffness of isotropic linear elasticity.

    Reference semantics: dolfinx_materials/python_materials/elasticity.py:14-19
    (2*mu*I + lambda on the upper-left 3x3 block).
    """
    lmbda = E * nu / (1 + nu) / (1 - 2 * nu)
    mu = E / 2.0 / (1 + nu)
    C = 2 * mu * np.eye(6)
    C[:3, :3] += lmbda
    if dtype is not None:
        C = C.astype(dtype)
    return jnp.asarray(C)
