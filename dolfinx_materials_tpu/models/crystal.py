"""Crystal (visco)plasticity: Meric-Cailletaud single crystal, FCC octahedral slip.

Rebuild of the reference's MFront behaviors
(mfront_materials/MericCailletaudSingleCrystalViscoPlasticity.mfront — Implicit
DSL, 12 slip systems, Norton flow per system, per-system isotropic hardening with
an interaction matrix and Armstrong-Frederick-type back-strain;
FCCMericCailletaudFiniteStrainSingleCrystalViscoPlasticity.mfront for the finite-
strain variant, obtained here by composing with
:class:`~dolfinx_materials_tpu.models.finite_strain.HenckyFiniteStrain`).

TPU design: the 12 slip increments are ONE batched 12-unknown IFT Newton solve per
Gauss point (ops/newton.py); resolved shears are a single (12,6)x(6,) matmul in
Mandel form; the consistent tangent falls out of the adapter's forward-mode pass
through the implicit solve. Crystal orientation is handled by the Material
rotation machinery (batched Mandel rotations, material.py) replacing MGIS's C++
rotation calls.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops import tensors
from ..ops.newton import newton_solve
from .base import SmallStrainBehavior


def fcc_slip_systems():
    """The 12 FCC octahedral systems {111}<110> as (normals, directions), unit
    vectors, deduplicated up to direction sign. Deterministic order: planes
    (1,1,1), (-1,1,1), (1,-1,1), (1,1,-1), three <110> directions each."""
    planes = [(1, 1, 1), (-1, 1, 1), (1, -1, 1), (1, 1, -1)]
    dirs_all = []
    for a in range(3):
        for b in range(a + 1, 3):
            for s in (1, -1):
                d = np.zeros(3)
                d[a], d[b] = 1, s
                dirs_all.append(d)
    normals, dirs = [], []
    for n in planes:
        n = np.asarray(n, float)
        for d in dirs_all:
            if abs(np.dot(n, d)) < 1e-12:
                # dedupe +-d within the plane
                if any(
                    np.allclose(d, -dd) and np.allclose(n, nn)
                    for nn, dd in zip(normals, dirs)
                ):
                    continue
                normals.append(n)
                dirs.append(np.asarray(d, float))
    normals = np.array(normals) / np.sqrt(3.0)
    dirs = np.array(dirs) / np.sqrt(2.0)
    assert len(normals) == 12
    return normals, dirs


def schmid_tensors_mandel(normals, dirs):
    """Symmetrized Schmid orientation tensors mu_s = sym(d (x) n) as Mandel
    6-vectors, (nss, 6); resolved shear tau_s = sig . mu_s is then one matmul."""
    mus = 0.5 * (
        dirs[:, :, None] * normals[:, None, :] + normals[:, :, None] * dirs[:, None, :]
    )
    return np.asarray(tensors.mat_to_sym(jnp.asarray(mus)))


def fcc_interaction_matrix(
    h_self=1.0,
    h_coplanar=1.0,
    h_hirth=0.6,
    h_lomer=1.8,
    h_glissile=1.6,
    h_collinear=12.3,
):
    """12x12 FCC interaction matrix from the 6 Madec-Kubin interaction classes
    (self, coplanar, Hirth lock, Lomer lock, glissile junction, collinear).

    The reference's ``@InteractionMatrix{1, 1, 0.6, 1.8, 1.6, 12.3, 1.6}``
    (MericCailletaudSingleCrystalViscoPlasticity.mfront:28) uses TFEL's positional
    convention; we expose NAMED coefficients instead — classification is computed
    geometrically below, so the physics (which pairs share a class) is identical
    even if positional order differs.
    """
    normals, dirs = fcc_slip_systems()
    nss = len(normals)
    H = np.zeros((nss, nss))
    for i in range(nss):
        for j in range(nss):
            ni, di = normals[i], dirs[i]
            nj, dj = normals[j], dirs[j]
            if i == j:
                H[i, j] = h_self
            elif abs(abs(np.dot(ni, nj)) - 1.0) < 1e-9:
                H[i, j] = h_coplanar
            elif abs(abs(np.dot(di, dj)) - 1.0) < 1e-9:
                H[i, j] = h_collinear
            elif abs(np.dot(di, dj)) < 1e-9:
                H[i, j] = h_hirth
            else:
                # junction direction: the +-combination that is a <110> direction
                for s in (1.0, -1.0):
                    b = di + s * dj
                    nb = np.linalg.norm(b)
                    if abs(nb - 1.0) < 1e-9:  # unit <110>/sqrt(2) combination
                        glissile = (
                            abs(np.dot(b, ni)) < 1e-9 or abs(np.dot(b, nj)) < 1e-9
                        )
                        H[i, j] = h_glissile if glissile else h_lomer
                        break
                else:
                    H[i, j] = h_glissile
    return H


def cubic_elasticity_C(E, nu, G):
    """Mandel 6x6 stiffness of a cubic crystal (E, nu, G on the cube axes)."""
    S = np.zeros((6, 6))
    S[:3, :3] = -nu / E
    np.fill_diagonal(S[:3, :3], 1.0 / E)
    S[3, 3] = S[4, 4] = S[5, 5] = 1.0 / (2.0 * G)
    return np.linalg.inv(S)


class MericCailletaudCrystalPlasticity(SmallStrainBehavior):
    """Meric-Cailletaud single-crystal viscoplasticity (small strain, theta = 1).

    Per slip system s: Norton flow dg_s = dt ((|tau_s - x_s| - r_s)_+ / K)^n
    sgn(tau_s - x_s), isotropic hardening r_s = tau0 + Q sum_j H_sj (1 - e^{-b p_j}),
    back-stress x_s = C_kin (a_s + da_s), da_s = (dg_s - d a_s |dg_s|)/(1 + d |dg_s|).
    Internal state: eps_p (6), g (nss), p (nss), a (nss) — the reference's
    ViscoplasticSlip / EquivalentViscoplasticSlip / BackStrain ISVs.
    """

    def __init__(
        self,
        E=208000.0,
        nu=0.3,
        G=80000.0,
        n=10.0,
        K=25.0,
        tau0=66.62,
        Q=11.43,
        b=2.1,
        d=494.0,
        C_kin=14363.0,
        interaction_matrix=None,
        tol=1e-12,
        max_iter=60,
    ):
        self.C6 = jnp.asarray(cubic_elasticity_C(E, nu, G))
        normals, dirs = fcc_slip_systems()
        self.mus = jnp.asarray(schmid_tensors_mandel(normals, dirs))  # (nss, 6)
        self.nss = self.mus.shape[0]
        self.H = jnp.asarray(
            interaction_matrix if interaction_matrix is not None
            else fcc_interaction_matrix()
        )
        self.n = n
        self.K = K
        self.tau0 = tau0
        self.Q = Q
        self.b = b
        self.d = d
        self.C_kin = C_kin
        self.tol = tol
        self.max_iter = max_iter

    def init_state(self):
        z = jnp.zeros(self.nss)
        return {"eps_p": jnp.zeros(6), "g": z, "p": z, "a": z}

    def small_strain_update(self, eps, state, dt):
        eps_p, g, p, a = state["eps_p"], state["g"], state["p"], state["a"]
        dt = jnp.asarray(dt, eps.dtype)
        dt_safe = jnp.maximum(dt, 1e-14)

        def residual(dg, eps, eps_p, p, a, dt_safe):
            abs_dg = jnp.abs(dg)
            eps_el = eps - eps_p - dg @ self.mus
            sig = self.C6 @ eps_el
            tau = self.mus @ sig
            r = self.tau0 + self.Q * self.H @ (1.0 - jnp.exp(-self.b * (p + abs_dg)))
            da = (dg - self.d * a * abs_dg) / (1.0 + self.d * abs_dg)
            x = self.C_kin * (a + da)
            f = jnp.maximum(jnp.abs(tau - x) - r, 0.0)
            return dg - dt_safe * (f / self.K) ** self.n * jnp.sign(tau - x)

        dg, _ = newton_solve(
            residual,
            jnp.zeros(self.nss, eps.dtype),
            args=(eps, eps_p, p, a, dt_safe),
            tol=self.tol * self.nss,
            max_iter=self.max_iter,
        )
        abs_dg = jnp.abs(dg)
        deps_p = dg @ self.mus
        eps_el = eps - eps_p - deps_p
        sig = self.C6 @ eps_el
        da = (dg - self.d * a * abs_dg) / (1.0 + self.d * abs_dg)
        new_state = {
            "eps_p": eps_p + deps_p,
            "g": g + dg,
            "p": p + abs_dg,
            "a": a + da,
        }
        return sig, new_state
