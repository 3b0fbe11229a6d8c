"""Finite-strain plasticity: multiplicative FeFp and the Hencky log-strain wrapper.

Rebuild of:
- jaxmat's ``FeFpJ2Plasticity(elasticity=..., yield_stress=...)`` — gradient F (9),
  flux PK1 (9), ISVs ``be`` (elastic left Cauchy-Green, init identity) and ``p``
  (reference call sites: tests/test_FeFp_jax.py:19-31,
  demos/jax/finite_strain_elastoplasticity.py:169-184);
- MFront's Hencky logarithmic-strain framework (``@StrainMeasure Hencky``) that
  wraps any small-strain behavior into a finite-strain one
  (demos/mfront/finite_strain_elastoplasticity/LogarithmicStrainPlasticity.mfront).

TPU-first: the exponential-map return uses the eigh-free ``ops.matfun`` log/exp
(matmul-only, AD-safe at F = I) and reuses the scalar IFT radial return of the
small-strain J2 model, so the consistent tangent dPK1/dF costs 9 forward-mode
directions through one scalar implicit solve.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import matfun, tensors
from ..ops.newton import scalar_newton_solve
from .base import FiniteStrainBehavior


class FeFpJ2Plasticity(FiniteStrainBehavior):
    """Multiplicative J2 elastoplasticity, Simo exponential return mapping.

    Hencky (logarithmic) hyperelastic response in the elastic logarithmic strain
    eps_e = 1/2 log(be): Kirchhoff stress tau = lambda tr(eps_e) I + 2 mu eps_e.
    Yield: von Mises on tau with isotropic hardening sigma_Y(p).

    Internal state: ``be`` (Mandel 6, init identity), ``p`` (scalar), plus
    ``F_prev`` (9-vector, init identity) carrying the previous converged
    deformation gradient needed by the relative-deformation predictor
    be_trial = f be_old f^T, f = F F_prev^{-1}.
    """

    def __init__(self, elasticity, yield_stress, tol=1e-10, max_iter=50,
                 fm_gregory_terms=5, fm_newton_iters=16, fm_stretch_guard=0.33,
                 use_batched_fast=True, tangent_mode="analytic"):
        self.elasticity = elasticity
        self.yield_stress = yield_stress
        self.tol = tol
        self.max_iter = max_iter
        # whole-batch fast-path tuning (see batched_update): Gregory log terms,
        # unrolled radial-return Newton count, and the envelope guard on
        # ||S||_F, S = (be_tr - I)(be_tr + I)^{-1} — points beyond it (elastic
        # stretch ~> +-40%, unphysical for metal J2) are poisoned with NaN so
        # the solver's line-search containment backtracks instead of silently
        # integrating a truncated series. None disables the guard.
        self.fm_gregory_terms = fm_gregory_terms
        self.fm_newton_iters = fm_newton_iters
        self.fm_stretch_guard = fm_stretch_guard
        #: "analytic" (default): factored consistent tangent — 6 jvp seeds
        #: through the log series only, everything else closed form (see
        #: batched_update). "jvp": 9 jvp seeds through the full core (the
        #: rounds-2-4 path, kept for A/B and as the reference semantics).
        self.tangent_mode = tangent_mode
        if not use_batched_fast:
            # instance attrs shadow the methods; Material then uses the
            # robust per-point vmapped path (ops.matfun logm/expm)
            self.batched_update = None
            self.batched_flux = None

    def init_state(self):
        return {
            "be": jnp.asarray(tensors.I2),
            "p": jnp.zeros(()),
            "F_prev": jnp.asarray(tensors.I9),
        }

    def finite_strain_update(self, Fvec, state, dt):
        el = self.elasticity
        mu = el.mu
        F = tensors.nonsym_to_mat(Fvec)
        F_prev = tensors.nonsym_to_mat(state["F_prev"])
        be_old = tensors.sym_to_mat(state["be"])
        p = state["p"]

        # trial elastic left Cauchy-Green via the relative deformation gradient
        f_rel = F @ tensors.inv33(F_prev)
        be_tr = f_rel @ be_old @ f_rel.T
        eps_e_tr = tensors.mat_to_sym(0.5 * matfun.logm(be_tr))

        tau_tr = el.stress(eps_e_tr)
        s_tr = tensors.dev(tau_tr)
        sigY0 = self.yield_stress(p)
        q_tr = tensors.eq_vm_safe(tau_tr, 1.0 + sigY0)

        def residual(dp, f_act, p0):
            return f_act - 3.0 * mu * dp - (
                self.yield_stress(p0 + dp) - self.yield_stress(p0)
            )

        f_act = jnp.maximum(q_tr - sigY0, 0.0)
        dp, _ = scalar_newton_solve(
            residual,
            jnp.zeros_like(q_tr),
            args=(f_act, p),
            tol=self.tol * (1.0 + sigY0),
            max_iter=self.max_iter,
            lower=0.0,
        )

        n = 1.5 * s_tr / q_tr
        eps_e = eps_e_tr - dp * n
        tau = tau_tr - 2.0 * mu * dp * n

        be_new = matfun.expm(2.0 * tensors.sym_to_mat(eps_e))
        # PK1 = tau F^{-T}
        P = tensors.sym_to_mat(tau) @ tensors.inv33(F).T
        new_state = {
            "be": tensors.mat_to_sym(be_new),
            "p": p + dp,
            "F_prev": Fvec,
        }
        return tensors.mat_to_nonsym(P), new_state

    # ------------------------------------------------- TPU whole-batch path
    def _fm_eps_tr(self, be_tr):
        """Trial logarithmic elastic strain eps_tr = 1/2 log(be_tr), Mandel
        (6, n), via the Gregory series with the envelope NaN guard (see
        ``_fm_core``). Shared by the primal core AND the analytic tangent's
        6-seed jvp (the only AD the factored tangent needs)."""
        from ..ops import matfun_fm as fm

        dtype = be_tr.dtype
        I = fm.eye_like(be_tr)
        S = fm.bmm(be_tr - I, fm.inv33(be_tr + I))
        S2 = fm.bmm(S, S)
        term = S
        acc = S
        for k in range(1, self.fm_gregory_terms):
            term = fm.bmm(term, S2)
            acc = acc + term / (2 * k + 1)
        logbe = 2.0 * acc
        if self.fm_stretch_guard is not None:
            s2 = fm.trace(S2)  # ||S||_F^2 (S symmetric)
            bad = s2 > jnp.asarray(self.fm_stretch_guard**2, dtype)
            logbe = jnp.where(bad[None, None, :], jnp.nan, logbe)
        return fm.to_sym_cols(0.5 * logbe)

    def _fm_core(self, Fv, state):
        """Feature-major whole-batch update core: Fv (n,9) -> (PK1 (n,9),
        eps_e (6,n), p_new (n,)) — everything EXCEPT the be = exp(2 eps_e)
        commit, which PK1 (and hence the tangent) does not depend on.

        Every intermediate lives as (3,3,n) / (6,n) / (n,) arrays so the point
        axis sits on the 128-wide TPU lanes (the vmapped per-point path pads its
        (n,3,3) temporaries ~42x on (8,128) tiles), and every op is an UNROLLED
        elementwise chain XLA fuses end-to-end (no ``fori_loop`` carries
        round-tripping HBM). The matrix log is the Gregory series
        (matfun_fm.logm_gregory) — exact to ~1e-19 at metal-scale elastic
        strains, guarded by ``fm_stretch_guard`` (NaN-poison beyond the series
        envelope; the solver line search backtracks on NaN residuals), and
        AD-smooth at F = I where spectral (Cardano) formulas lose precision.
        """
        from ..ops import matfun_fm as fm

        el = self.elasticity
        mu = el.mu
        lmbda = el.lmbda
        dtype = Fv.dtype

        F = fm.from_nonsym_rows(Fv)
        F_prev = fm.from_nonsym_rows(state["F_prev"].astype(dtype))
        be_old = fm.from_sym_cols(state["be"].astype(dtype).T)
        p = state["p"].astype(dtype)

        f_rel = fm.bmm(F, fm.inv33(F_prev))
        be_tr = fm.bmm(fm.bmm(f_rel, be_old), fm.transpose(f_rel))
        eps_tr = self._fm_eps_tr(be_tr)  # (6, n) Mandel

        tr_e = eps_tr[0] + eps_tr[1] + eps_tr[2]
        iso = jnp.concatenate(
            [jnp.broadcast_to(tr_e / 3.0, (3,) + tr_e.shape),
             jnp.zeros((3,) + tr_e.shape, dtype)]
        )
        tau_tr = 2.0 * mu * eps_tr + lmbda * 3.0 * iso  # (6, n)
        s_tr = 2.0 * mu * (eps_tr - iso)

        sigY = self.yield_stress
        Y0 = sigY(p)
        tiny = (1e-14 * (1.0 + Y0)) ** 2
        q_tr = jnp.sqrt(1.5 * jnp.sum(s_tr * s_tr, axis=0) + tiny)
        f_act = jnp.maximum(q_tr - Y0, 0.0)

        ones = jnp.ones_like(p)
        dp = jnp.zeros_like(p)
        for _ in range(self.fm_newton_iters):  # unrolled; fuses fully
            r = f_act - 3.0 * mu * dp - (sigY(p + dp) - Y0)
            dY = jax.jvp(sigY, (p + dp,), (ones,))[1]
            dp = jnp.maximum(dp - r / (-3.0 * mu - dY), 0.0)

        n_dir = 1.5 * s_tr / q_tr  # (6, n)
        eps_e = eps_tr - dp * n_dir
        tau = tau_tr - 2.0 * mu * dp * n_dir

        P = fm.bmm(fm.from_sym_cols(tau), fm.transpose(fm.inv33(F)))
        return fm.to_nonsym_rows(P), eps_e, p + dp

    def _fm_state(self, Fv, eps_e, p_new):
        from ..ops import matfun_fm as fm

        be_new = fm.expm_unrolled(2.0 * fm.from_sym_cols(eps_e))
        return {"be": fm.to_sym_cols(be_new).T, "p": p_new, "F_prev": Fv}

    def batched_update(self, Fv, state, dt):
        """Whole-batch PK1 + consistent 9x9 tangent + new state (picked up by
        ``Material.integrate`` in place of the vmapped-jacfwd generic path).
        Dispatches on ``tangent_mode`` ("analytic" default, "jvp" for A/B)."""
        if self.tangent_mode == "analytic":
            return self._batched_update_analytic(Fv, state, dt)
        return self._batched_update_jvp(Fv, state, dt)

    def _batched_update_jvp(self, Fv, state, dt):
        """Rounds-2-4 tangent: one fused vmap-of-jvp over the 9 basis
        directions — the primal stays unbatched inside the vmap (computed
        once), the tangent ops ride a 9-wide leading axis, and the ``be``
        commit (expm) sits outside the differentiated core so its derivative
        is never built.
        """
        core = lambda x: self._fm_core(x, state)
        seeds = jnp.broadcast_to(
            jnp.eye(9, dtype=Fv.dtype)[:, None, :], (9, Fv.shape[0], 9)
        )

        def one(seed):
            prim, tang = jax.jvp(core, (Fv,), (seed,))
            return prim, tang[0]

        (pk1, eps_e, p_new), cols = jax.vmap(one, out_axes=(None, 0))(seeds)
        Ct = jnp.transpose(cols, (1, 2, 0)).reshape(Fv.shape[0], 81)
        return pk1, Ct, self._fm_state(Fv, eps_e, p_new)

    #: nonsym 9-vector component order (matfun_fm.from_nonsym_rows):
    #: index s -> (row i_s, col j_s) of the 3x3
    _NONSYM_IJ = ((0, 0), (1, 1), (2, 2), (0, 1), (1, 0),
                  (0, 2), (2, 0), (1, 2), (2, 1))

    def _batched_update_analytic(self, Fv, state, dt):
        """Factored consistent tangent (round 5 — the identified FeFp lever,
        docs/perf.md "family rooflines"): dPK1/dF assembled from closed-form
        pieces instead of 9 jvp replays of the whole core.

        The chain factors through the 6-dim symmetric trial state: tau depends
        on F ONLY via be_tr = f be_old f^T (f = F F_prev^{-1}), and after
        eps_tr = 1/2 log(be_tr) the algorithm IS the small-strain J2 radial
        return, whose consistent tangent is the Simo-Hughes closed form
        (ops/j2_fast.py): A = C - 2 mu beta K4 - gamma nbar (x) nbar. So

            dP = M(A : L : dbe_tr) F^{-T} - P dF^T F^{-T},
            dbe_tr = dF H + (dF H)^T,   H = F_prev^{-1} be_old f^T,

        where ONLY L = d(1/2 log)/d(be) (a per-point symmetric 6x6) needs AD:
        6 Mandel-seed jvps through the short Gregory-series helper
        ``_fm_eps_tr`` — not 9 seeds through inv33 + series + the unrolled
        Newton + the stress/PK1 wrap. Everything else (dbe_tr, A, the
        geometric term) is a handful of lane-resident FMAs per point; A is
        applied matrix-free (C w = lam tr(w) I + 2 mu w etc.), never formed.
        Parity vs the jvp path and the generic IFT path at 1e-8 (f64) in
        tests/test_fefp_batched.py. Reference semantics:
        jaxmat ``FeFpJ2Plasticity`` (reference tests/test_FeFp_jax.py:19-31).
        """
        from ..ops import matfun_fm as fm

        el = self.elasticity
        mu = el.mu
        lmbda = el.lmbda
        dtype = Fv.dtype
        n = Fv.shape[0]

        F = fm.from_nonsym_rows(Fv)
        F_prev = fm.from_nonsym_rows(state["F_prev"].astype(dtype))
        be_old = fm.from_sym_cols(state["be"].astype(dtype).T)
        p = state["p"].astype(dtype)

        Fp_inv = fm.inv33(F_prev)
        f_rel = fm.bmm(F, Fp_inv)
        be_tr = fm.bmm(fm.bmm(f_rel, be_old), fm.transpose(f_rel))
        be6_tr = fm.to_sym_cols(be_tr)

        # --- L = d eps_tr / d be6 via 6 Mandel seeds (shared primal) --------
        g6 = lambda b6: self._fm_eps_tr(fm.from_sym_cols(b6))
        seeds6 = jnp.broadcast_to(
            jnp.eye(6, dtype=dtype)[:, :, None], (6, 6, n)
        )

        def one(seed):
            prim, tang = jax.jvp(g6, (be6_tr,), (seed,))
            return prim, tang

        eps_tr, Lcols = jax.vmap(one, out_axes=(None, 0))(seeds6)
        # Lcols[q, p, :] = dL eps_p / d be_q  (seed axis first)

        # --- radial return (identical arithmetic to _fm_core) ---------------
        tr_e = eps_tr[0] + eps_tr[1] + eps_tr[2]
        iso = jnp.concatenate(
            [jnp.broadcast_to(tr_e / 3.0, (3,) + tr_e.shape),
             jnp.zeros((3,) + tr_e.shape, dtype)]
        )
        tau_tr = 2.0 * mu * eps_tr + lmbda * 3.0 * iso
        s_tr = 2.0 * mu * (eps_tr - iso)

        sigY = self.yield_stress
        Y0 = sigY(p)
        tiny = (1e-14 * (1.0 + Y0)) ** 2
        q_tr = jnp.sqrt(1.5 * jnp.sum(s_tr * s_tr, axis=0) + tiny)
        f_act = jnp.maximum(q_tr - Y0, 0.0)

        ones = jnp.ones_like(p)
        dp = jnp.zeros_like(p)
        for _ in range(self.fm_newton_iters):
            r = f_act - 3.0 * mu * dp - (sigY(p + dp) - Y0)
            dY = jax.jvp(sigY, (p + dp,), (ones,))[1]
            dp = jnp.maximum(dp - r / (-3.0 * mu - dY), 0.0)

        n_dir = 1.5 * s_tr / q_tr
        eps_e = eps_tr - dp * n_dir
        tau = tau_tr - 2.0 * mu * dp * n_dir

        Finv = fm.inv33(F)
        FinvT = fm.transpose(Finv)
        P3 = fm.bmm(fm.from_sym_cols(tau), FinvT)

        # --- analytic pieces -------------------------------------------------
        Hp = jax.jvp(sigY, (p + dp,), (ones,))[1]
        nbar = s_tr / q_tr  # (6, n) Mandel
        beta = 3.0 * mu * dp / q_tr
        gamma = 9.0 * mu**2 * (1.0 / (3.0 * mu + Hp) - dp / q_tr)
        plastic = (f_act > 0.0).astype(dtype)
        two_mu_beta = plastic * 2.0 * mu * beta
        gamma_m = plastic * gamma
        H = fm.bmm(Fp_inv, fm.bmm(be_old, fm.transpose(f_rel)))  # (3,3,n)
        sq2 = 2.0**0.5
        zero = jnp.zeros_like(tr_e)

        cols = []
        for i, j in self._NONSYM_IJ:
            # dbe_tr = e_i (x) h + h (x) e_i, h = H[j, :] — Mandel 6-vector
            h = H[j]
            diag = [zero, zero, zero]
            diag[i] = 2.0 * h[i]
            off = [  # [12, 13, 23] Mandel slots
                sq2 * ((h[1] if i == 0 else zero) + (h[0] if i == 1 else zero)),
                sq2 * ((h[2] if i == 0 else zero) + (h[0] if i == 2 else zero)),
                sq2 * ((h[2] if i == 1 else zero) + (h[1] if i == 2 else zero)),
            ]
            dbe6 = jnp.stack(diag + off)  # (6, n)

            # w = L dbe6 (per-point 6x6 apply; L[p,q] = Lcols[q,p])
            w = jnp.einsum("qpn,qn->pn", Lcols, dbe6)

            # dtau = A w, A applied matrix-free:
            # C w = lam tr(w) I2 + 2 mu w ; K4 w = w - tr(w)/3 I2
            trw = w[0] + w[1] + w[2]
            trw_iso = jnp.concatenate(
                [jnp.broadcast_to(trw, (3,) + trw.shape),
                 jnp.zeros((3,) + trw.shape, dtype)]
            )
            ndot = jnp.sum(nbar * w, axis=0)
            dtau = (
                2.0 * mu * w + lmbda * trw_iso
                - two_mu_beta * (w - trw_iso / 3.0)
                - (gamma_m * ndot) * nbar
            )

            # dP = M(dtau) F^{-T} - P3 (e_j (x) e_i) F^{-T}
            dP = fm.bmm(fm.from_sym_cols(dtau), FinvT)
            geo = jnp.stack(
                [jnp.stack([-P3[a][j] * Finv[b][i] for b in range(3)])
                 for a in range(3)]
            )
            cols.append(fm.to_nonsym_rows(dP + geo))  # (n, 9) output rows

        Ct = jnp.stack(cols, axis=-1).reshape(n, 81)  # (n, 9_out, 9_in)
        return fm.to_nonsym_rows(P3), Ct, self._fm_state(Fv, eps_e, p + dp)

    def batched_flux(self, Fv, state, dt):
        """Tangent-free whole-batch update (line-search residual trials)."""
        pk1, eps_e, p_new = self._fm_core(Fv, state)
        return pk1, self._fm_state(Fv, eps_e, p_new)


class HenckyFiniteStrain(FiniteStrainBehavior):
    """Lagrangian logarithmic-strain wrapper around ANY small-strain behavior.

    The MFront ``@StrainMeasure Hencky`` framework
    (demos/mfront/finite_strain_elastoplasticity): the total Hencky strain
    E_log = 1/2 log(C) feeds the wrapped small-strain update, whose output T is the
    work conjugate of E_log; the PK1 stress follows from conjugacy,
    P = (dE_log/dF)^T : T — computed here as one reverse-mode VJP through the
    eigh-free matrix log (the reference delegates this conversion to TFEL C++).
    """

    def __init__(self, small_strain_behavior):
        self.inner = small_strain_behavior

    def init_state(self):
        return self.inner.init_state()

    def finite_strain_update(self, Fvec, state, dt):
        def E_log(Fv):
            F = tensors.nonsym_to_mat(Fv)
            C = F.T @ F
            return tensors.mat_to_sym(0.5 * matfun.logm(C))

        eps, pullback = jax.vjp(E_log, Fvec)
        T, new_state = self.inner.small_strain_update(eps, state, dt)
        (pk1,) = pullback(T)
        return pk1, new_state
