"""Global nonlinear solver: Newton with matrix-free Krylov or host direct solves.

Rebuild of the reference's ``NonlinearMaterialProblem`` (dolfinx_materials/
solvers.py:99-196): a Newton loop whose residual callback FIRST runs the
constitutive update of every registered QuadratureMap, then assembles (reference
:31-96, hook at :72). TPU-native differences:

- the linear solve is matrix-free Jacobi-preconditioned CG/BiCGStab
  (``jax.scipy.sparse.linalg``) on assembly-free element-matrix SpMV — fully
  jittable, shardable; a scipy LU path covers the reference's "preonly + LU/MUMPS"
  test configuration (tests/uniaxial_tension.py:78-82) on host;
- Dirichlet BCs by masking (rows/cols to identity), the static-shape analogue of
  PETSc lifting (reference :84-96);
- ``solve()`` commits state via ``advance()`` on every map after convergence
  (reference :194).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .fem.bc import combine_bcs
from .fem.space import Function
from .quadrature_map import QuadratureMap
from .utils.timers import timer


class NonlinearMaterialProblem:
    """Newton solver for residuals of the form

        R(u) = sum_qmaps sum_k ∫ field_k(u) · expr_k(u) dx  -  F_ext  = 0

    ``residual_terms``: per qmap, a list of (field_name, expr) or
    (field_name, expr, scale) entries; defaults to pairing each flux with its
    registered work-conjugate gradient expression (the ``∫ sig · strain(v) dx``
    pattern, tests/uniaxial_tension.py:71). ``scale`` is a float or a 0-arg
    callable evaluated at each assembly (e.g. ``lambda: -dt * theta`` in the
    transient heat theta-scheme, reference phase_change.py:318-320); it multiplies
    the term's coefficient AND its tangent blocks without recompilation.
    """

    def __init__(
        self,
        qmaps,
        u: Function,
        bcs=(),
        residual_terms=None,
        external_force=None,
        options=None,
    ):
        self.qmaps = [qmaps] if isinstance(qmaps, QuadratureMap) else list(qmaps)
        self.u = u
        self.bcs = list(bcs)
        self.external_force = external_force
        o = dict(options or {})
        # dtype-aware defaults: 1e-10 is reachable in f64 but far below the f32
        # noise floor — on TPU (f32 default) Newton would line-search-stagnate
        # at ~1e-7 |R|/|R0| and report failure on perfectly converged solves
        self.rtol = o.pop("rtol", None)
        self.atol = o.pop("atol", None)
        self.max_it = o.pop("max_it", 25)
        self.ksp_type = o.pop("ksp_type", "cg")
        self.ksp_rtol = o.pop("ksp_rtol", None)  # dtype-aware, resolved in solve
        self.ksp_maxiter = o.pop("ksp_maxiter", 2000)
        #: "f32": run the Krylov solve in float32 on the SYMMETRICALLY
        #: DIAGONALLY SCALED operator (all CG vectors O(1)) even when the
        #: problem is f64 — the host-path port of the fused step's
        #: mixed-precision scheme (VERDICT r4 item 4). Each f32-solved
        #: correction is applied to the f64 iterate and the true f64 residual
        #: re-measured (iterative-refinement inexact Newton), so Newton still
        #: converges to the f64 tolerance; on TPU this avoids the ~10x cost
        #: of emulated-f64 Krylov arithmetic.
        self.ksp_precision = o.pop("ksp_precision", "same")
        #: secant load-step predictor (VERDICT r4 item 4, the fused scan's
        #: r4 lever): start Newton from the previous committed solution
        #: extrapolated by the previous committed increment — for a smooth
        #: load program the guess is second-order accurate, measured 2-4x
        #: fewer Newton iterations/step on the Ogden protocol. Only applies
        #: to committing solves whose entry ``u`` is the last committed
        #: solution (a caller-supplied initial guess is always respected);
        #: the line search guards non-smooth load programs.
        self.predictor = o.pop("predictor", True)
        self._u_committed = None  # last committed solution (numpy)
        self._du_committed = None  # last committed increment (numpy)
        #: Krylov preconditioner (VERDICT r1 weak #6):
        #: - "two_level" (default): Jacobi smoother + additive piecewise-
        #:   constant coarse correction over spatial node aggregates — the
        #:   AMG-lite that captures the low-frequency error modes pointwise
        #:   preconditioners cannot (measured: Jacobi stalls at |r|/|b| ~ 0.85
        #:   after 100 CG its on a 20:1-aspect strip; two-level converges)
        #: - "block_jacobi": per-node ncomp x ncomp blocks (marginal for
        #:   elasticity — the strong coupling is BETWEEN nodes — kept for
        #:   strongly node-coupled operators)
        #: - "jacobi": pure diagonal
        self.pc_type = o.pop("pc_type", "two_level")
        #: target number of coarse aggregates for "two_level" (dense coarse
        #: factorization: keep <= ~2048)
        self.pc_coarse_size = o.pop("pc_coarse_size", 1024)
        self._agg_ids = None  # lazy host-side aggregation cache
        self.line_search = o.pop("line_search", True)
        self.max_backtracks = o.pop("max_backtracks", 12)
        self.verbose = o.pop("verbose", False)
        self.converged = False
        self.iterations = 0
        #: per-solve structured metrics (residual history, wall times) — the
        #: observability the reference delegates to SNES monitors (SURVEY.md §5)
        self.metrics: dict = {}

        # --- per-qmap term/tangent wiring ---------------------------------
        self._terms = []  # per qmap: (exprs, residual_fn, Kel_fn, blocks)
        if residual_terms is None:
            residual_terms = [None] * len(self.qmaps)
        for qmap, terms in zip(self.qmaps, residual_terms):
            mat = qmap.material
            if terms is None:
                terms = [
                    (f, qmap.gradient_exprs[g])
                    for f, g in zip(mat.flux_names, mat.gradient_names)
                ]
            terms = [t if len(t) == 3 else (t[0], t[1], 1.0) for t in terms]
            field_names = [t[0] for t in terms]
            exprs = [t[1] for t in terms]
            scales = [t[2] for t in terms]
            # tangent structure: for term k with field y, every block (y, x)
            tangent_structure = []
            block_keys = []
            for k, y in enumerate(field_names):
                for (by, bx) in mat.tangent_blocks:
                    if by != y:
                        continue
                    x_expr = qmap.gradient_exprs.get(bx) or qmap.esv_exprs.get(bx)
                    if x_expr is None:
                        continue  # block w.r.t. an unregistered input: no coupling
                    tangent_structure.append((k, x_expr, None))
                    block_keys.append((k, by, bx))
            dom = qmap.domain
            self._terms.append(
                dict(
                    qmap=qmap,
                    field_names=field_names,
                    exprs=exprs,
                    scales=scales,
                    residual_fn=dom.make_residual(exprs),
                    Kel_fn=dom.make_element_matrices(exprs, tangent_structure),
                    block_keys=block_keys,
                )
            )

    # ------------------------------------------------------------------ core
    def _constitutive_update(self, u_arr):
        for qmap in self.qmaps:
            qmap.update(u_arr)

    def _constitutive_update_flux_only(self, u_arr):
        for qmap in self.qmaps:
            qmap.update_flux_only(u_arr)

    @staticmethod
    def _scale_value(s):
        return float(s()) if callable(s) else float(s)

    def _fields(self, t):
        return [
            self._scale_value(s) * t["qmap"].field_array(f)
            for f, s in zip(t["field_names"], t["scales"])
        ]

    def _residual(self, u_arr):
        ndofs = self.u.space.num_dofs
        R = jnp.zeros(ndofs)
        for t in self._terms:
            R = R + t["residual_fn"](u_arr, self._fields(t))
        if self.external_force is not None:
            F = self.external_force
            R = R - jnp.asarray(F(u_arr) if callable(F) else F)
        return R

    def _element_matrices(self, u_arr):
        out = []
        for t in self._terms:
            Cs = [
                self._scale_value(t["scales"][k]) * t["qmap"].tangent_block(y, x)
                for (k, y, x) in t["block_keys"]
            ]
            out.append(t["Kel_fn"](u_arr, self._fields(t), Cs))
        return out

    def _node_aggregates(self):
        """Spatial node aggregation for the two-level preconditioner: quantize
        node coordinates into boxes sized so ~``pc_coarse_size`` aggregates
        result (host-side, once per problem; works on any mesh/geometry)."""
        if self._agg_ids is not None:
            return self._agg_ids
        coords = np.asarray(self.u.space.node_coords, dtype=np.float64)
        nnodes, dim = coords.shape
        lo = coords.min(axis=0)
        span = np.maximum(coords.max(axis=0) - lo, 1e-30)
        # pc_coarse_size budgets coarse DOFS (= aggregates * ncomp): size the
        # boxes from target/ncomp so the dense coarse factorization stays
        # within the <=~2048 guidance even for 3D vector problems
        ncomp = max(1, self.u.space.num_dofs // nnodes)
        target = max(1, min(self.pc_coarse_size // ncomp, nnodes))
        boxes_per_dim = max(1, int(np.floor(target ** (1.0 / dim))))
        q = np.minimum(
            (coords - lo) / span * boxes_per_dim, boxes_per_dim - 1
        ).astype(np.int64)
        keys = q[:, 0]
        for d in range(1, dim):
            keys = keys * boxes_per_dim + q[:, d]
        _, agg = np.unique(keys, return_inverse=True)
        self._agg_ids = (
            jnp.asarray(agg.astype(np.int32)),
            int(agg.max()) + 1,
        )
        return self._agg_ids

    def _linear_solve(self, Kels, rhs, mask):
        """Solve J du = rhs with bc rows/cols as identity (du[bc] = 0).

        With ``ksp_precision="f32"`` on an f64 problem the iterative solve
        runs in float32 on the symmetrically scaled system
        (S K S)(S^-1 du) = S rhs, S = diag(1/sqrt(|diag K|)); the result is
        cast back to f64. The direct ("lu") path always stays in the
        problem dtype."""
        lo = (
            self.ksp_precision == "f32"
            and self.ksp_type != "lu"
            and rhs.dtype == jnp.float64
        )
        if not lo:
            return self._linear_solve_core(Kels, rhs, mask)
        mask_j = jnp.asarray(mask)
        diag = jnp.zeros_like(rhs)
        for t, K_e in zip(self._terms, Kels):
            diag = diag + t["qmap"].domain.matrix_diagonal(K_e, rhs.shape[0])
        diag = jnp.where(mask_j | (jnp.abs(diag) < 1e-30), 1.0, jnp.abs(diag))
        s = jax.lax.rsqrt(diag)
        f32 = jnp.float32
        Kels_s = []
        for t, K_e in zip(self._terms, Kels):
            s_e = s[t["qmap"].domain.dofmap]
            Kels_s.append(
                (K_e * s_e[:, :, None] * s_e[:, None, :]).astype(f32)
            )
        # the f64 default ksp_rtol (1e-12) is unreachable in f32: clamp to
        # just above the f32 Krylov floor — Newton's iterative refinement
        # recovers the f64 accuracy
        du_s = self._linear_solve_core(
            Kels_s, (rhs * s).astype(f32), mask,
            tol=max(self.ksp_rtol or 0.0, 1e-6),
        )
        return du_s.astype(rhs.dtype) * s

    def _linear_solve_core(self, Kels, rhs, mask, tol=None):
        tol = self.ksp_rtol if tol is None else tol
        mask_j = jnp.asarray(mask)

        if self.ksp_type == "lu":
            import scipy.sparse as sp
            import scipy.sparse.linalg as spla

            ndofs = rhs.shape[0]
            A = None
            for t, K_e in zip(self._terms, Kels):
                Ai = t["qmap"].domain.to_scipy_csr(np.asarray(K_e), ndofs)
                A = Ai if A is None else A + Ai
            A = A.tolil()
            bc_idx = np.nonzero(np.asarray(mask))[0]
            A[bc_idx, :] = 0.0
            A[:, bc_idx] = 0.0
            A[bc_idx, bc_idx] = 1.0
            b = np.asarray(jnp.where(mask_j, 0.0, rhs))
            return jnp.asarray(spla.spsolve(A.tocsr(), b))

        # feature-major pre-transposed operands on stencil domains: one
        # transpose per Newton iteration vs ~100 CG matvecs that reuse it
        Kprep = [
            t["qmap"].domain.spmv_prepare(K_e)
            for t, K_e in zip(self._terms, Kels)
        ]

        def Av(v):
            v0 = jnp.where(mask_j, 0.0, v)
            y = jnp.zeros_like(v)
            for t, K_p in zip(self._terms, Kprep):
                y = y + t["qmap"].domain.spmv(K_p, v0)
            return jnp.where(mask_j, v, y)

        diag = jnp.zeros_like(rhs)
        for t, K_e in zip(self._terms, Kels):
            diag = diag + t["qmap"].domain.matrix_diagonal(K_e, rhs.shape[0])
        diag = jnp.where(mask_j | (jnp.abs(diag) < 1e-30), 1.0, diag)
        M = lambda v: v / diag

        ncomp = self.u.space.ncomp
        if self.pc_type == "block_jacobi" and ncomp > 1:
            nnodes = self.u.space.num_nodes
            B = jnp.zeros((nnodes, ncomp, ncomp), rhs.dtype)
            for t, K_e in zip(self._terms, Kels):
                B = B + t["qmap"].domain.matrix_node_blocks(K_e, nnodes)
            # bc rows/cols -> identity within each node block
            mn = mask_j.reshape(nnodes, ncomp)
            off = mn[:, :, None] | mn[:, None, :]
            B = jnp.where(off, 0.0, B)
            B = B + jnp.where(mn, 1.0, 0.0)[:, :, None] * jnp.eye(
                ncomp, dtype=rhs.dtype
            )
            # singular-block guard: fall back to the scalar diagonal there
            detB = jnp.linalg.det(B)
            dscale = jnp.mean(jnp.abs(jnp.diagonal(B, axis1=1, axis2=2)), axis=1)
            ok = jnp.abs(detB) > (1e-12 * dscale) ** ncomp
            B_safe = jnp.where(
                ok[:, None, None],
                B,
                jnp.eye(ncomp, dtype=rhs.dtype)[None],
            )
            Binv = jnp.linalg.inv(B_safe)
            dinv_blocks = (1.0 / diag).reshape(nnodes, ncomp)

            def M(v):  # noqa: F811 — intentional upgrade of the jacobi M
                vb = v.reshape(nnodes, ncomp)
                xb = jnp.einsum("nab,nb->na", Binv, vb)
                xb = jnp.where(ok[:, None], xb, dinv_blocks * vb)
                return xb.reshape(-1)

        elif self.pc_type == "two_level":
            from jax.scipy.linalg import lu_factor, lu_solve

            agg, nagg = self._node_aggregates()
            nnodes = self.u.space.num_nodes
            ncoarse = nagg * ncomp
            # coarse operator Ac = P^T A P with P the piecewise-constant
            # aggregate prolongation: assembled directly from the element
            # matrices (bc rows/cols excluded), dense (ncoarse, ncoarse)
            notm = jnp.where(mask_j, 0.0, 1.0)
            Ac = jnp.zeros(ncoarse * ncoarse, rhs.dtype)
            for t, K_e in zip(self._terms, Kels):
                dm = t["qmap"].domain.dofmap  # (ne, ndof_el)
                w = notm[dm]
                Kw = K_e * w[:, :, None] * w[:, None, :]
                cd = agg[dm // ncomp] * ncomp + dm % ncomp  # coarse dofs
                idx = (cd[:, :, None] * ncoarse + cd[:, None, :]).ravel()
                Ac = Ac.at[idx].add(Kw.ravel())
            Ac = Ac.reshape(ncoarse, ncoarse)
            dAc = jnp.diagonal(Ac)
            ridge = 1e-10 * jnp.max(jnp.abs(dAc)) + 1e-30
            Ac = Ac + ridge * jnp.eye(ncoarse, dtype=rhs.dtype)
            # empty/bc-only aggregates: unit diagonal keeps the factor regular
            Ac = Ac + jnp.where(jnp.abs(dAc) < ridge, 1.0, 0.0) * jnp.eye(
                ncoarse, dtype=rhs.dtype
            )
            lu_piv = lu_factor(Ac)

            def M(v):  # noqa: F811 — additive two-level: smoother + coarse
                v0 = jnp.where(mask_j, 0.0, v)
                vb = v0.reshape(nnodes, ncomp)
                rc = (
                    jnp.zeros((nagg, ncomp), v.dtype).at[agg].add(vb).reshape(-1)
                )
                wc = lu_solve(lu_piv, rc).reshape(nagg, ncomp)
                coarse = wc[agg].reshape(-1)
                out = v0 / diag + coarse
                return jnp.where(mask_j, v, out)

        b = jnp.where(mask_j, 0.0, rhs)
        if self.ksp_type == "bicgstab":
            du, _ = jax.scipy.sparse.linalg.bicgstab(
                Av, b, tol=tol, maxiter=self.ksp_maxiter, M=M
            )
        elif self.ksp_type == "gmres":
            du, _ = jax.scipy.sparse.linalg.gmres(
                Av, b, tol=tol, maxiter=self.ksp_maxiter, M=M
            )
        else:
            du, _ = jax.scipy.sparse.linalg.cg(
                Av, b, tol=tol, maxiter=self.ksp_maxiter, M=M
            )
        # Krylov quality guard: on (near-)singular tangents the iteration can
        # diverge and return enormous garbage. Fall back to a preconditioned
        # gradient step — a guaranteed descent-ish direction for the line search.
        lin_res = jnp.linalg.norm(Av(du) - b)
        b_norm = jnp.linalg.norm(b)
        bad = jnp.logical_or(
            ~jnp.isfinite(lin_res), lin_res > 0.9 * b_norm
        )
        du = jnp.where(bad, M(b), du)
        return du

    # ----------------------------------------------------------------- solve
    def solve(self, commit: bool = True):
        """Newton iterations; returns (converged, iterations) like the
        reference's ``problem.solve()`` contract (solvers.py:182-196).

        ``commit=False`` skips ``advance()`` on convergence — used by coupled
        outer iterations that must only commit once the WHOLE multi-field step
        has converged (solve_coupled)."""
        ndofs = self.u.space.num_dofs
        mask, bc_vals = combine_bcs(self.bcs, ndofs)
        u_arr = jnp.asarray(self.u.x)
        if (
            self.predictor
            and commit
            and self._du_committed is not None
            and np.array_equal(np.asarray(self.u.x), self._u_committed)
        ):
            # secant predictor: the caller left u at the last committed
            # solution, so extrapolate by the last committed increment
            u_arr = jnp.asarray(self._u_committed + self._du_committed)
        # enforce Dirichlet values exactly (then Newton corrections vanish there)
        u_arr = jnp.where(jnp.asarray(mask), jnp.asarray(bc_vals), u_arr)
        eps_dtype = float(jnp.finfo(u_arr.dtype).eps)
        f64 = eps_dtype < 1e-9
        rtol = self.rtol if self.rtol is not None else (
            1e-10 if f64 else 50.0 * eps_dtype
        )
        atol = self.atol if self.atol is not None else (1e-10 if f64 else 0.0)
        if self.ksp_rtol is None:
            self.ksp_rtol = 1e-12 if f64 else 1e-7

        norm0 = None
        self.converged = False
        import time as _time

        t_start = _time.perf_counter()
        res_history = []
        with timer("solver: Newton solve"):
            for it in range(self.max_it):
                try:
                    with timer("solver: constitutive update"):
                        self._constitutive_update(u_arr)
                except FloatingPointError:
                    if self.verbose:
                        print("  non-finite constitutive state; aborting Newton")
                    break  # converged stays False -> caller cuts the load step
                R = self._residual(u_arr)
                Rm = jnp.where(jnp.asarray(mask), 0.0, R)
                norm = float(jnp.linalg.norm(Rm))
                if not np.isfinite(norm):
                    # NaN/inf in the constitutive state propagates into |R|,
                    # which we fetch anyway — free non-finite detection without
                    # the dedicated check_nans host sync (off by default)
                    if self.verbose:
                        print("  non-finite residual; aborting Newton")
                    break
                res_history.append(norm)
                if norm0 is None:
                    norm0 = norm if norm > 0 else 1.0
                if self.verbose:
                    print(f"  Newton it {it}: |R| = {norm:.6e}")
                if norm < atol or norm < rtol * norm0:
                    self.converged = True
                    self.iterations = it
                    break
                with timer("solver: jacobian assembly"):
                    Kels = self._element_matrices(u_arr)
                with timer("solver: linear solve"):
                    du = self._linear_solve(Kels, -R, mask)
                if self.line_search:
                    # backtracking on the residual norm (SNES newtonls role,
                    # reference solvers.py petsc_options "snes_linesearch_type")
                    alpha = 1.0
                    best_alpha, best_n = None, np.inf
                    for _ in range(self.max_backtracks):
                        u_try = u_arr + alpha * du
                        try:
                            # flux-only: trials need the residual norm, not
                            # tangents (VERDICT r1 item 8)
                            self._constitutive_update_flux_only(u_try)
                            R_try = self._residual(u_try)
                            n_try = float(
                                jnp.linalg.norm(
                                    jnp.where(jnp.asarray(mask), 0.0, R_try)
                                )
                            )
                        except FloatingPointError:
                            n_try = np.inf  # overflowed trial: keep backtracking
                        if np.isfinite(n_try) and n_try < best_n:
                            best_alpha, best_n = alpha, n_try
                        if np.isfinite(n_try) and n_try < (1 - 1e-4 * alpha) * norm:
                            break
                        alpha *= 0.5
                    if best_alpha is None or best_n >= norm:
                        # the line-search trials overwrote s1 with REJECTED
                        # trial states; restore the state of the u we keep
                        # before any exit that might commit (advance) it
                        self._constitutive_update_flux_only(u_arr)
                        self.iterations = it
                        # stagnation at the dtype's residual-assembly noise
                        # floor IS convergence: f32 sums of nearly-cancelling
                        # element contributions bottom out around
                        # sqrt(eps)·|R0| and no step can reduce them further
                        if norm < np.sqrt(eps_dtype) * norm0:
                            self.converged = True
                            if self.verbose:
                                print(
                                    "  converged at the dtype noise floor "
                                    f"(|R|/|R0| = {norm / norm0:.2e})"
                                )
                            break
                        # total line-search failure: do not walk into garbage
                        if self.verbose:
                            print("  line search stagnated; aborting Newton")
                        break
                    u_arr = u_arr + best_alpha * du
                    # align s1 with the ACCEPTED trial (the loop above may
                    # have evaluated a smaller alpha last)
                    if best_n != n_try:
                        self._constitutive_update_flux_only(u_arr)
                else:
                    u_arr = u_arr + du

        self.u.x = np.array(u_arr)  # writable copy
        self.metrics = {
            "converged": self.converged,
            "newton_iterations": self.iterations,
            "residual_history": res_history,
            "wall_time_s": _time.perf_counter() - t_start,
            "gauss_points": sum(q.num_points for q in self.qmaps),
        }
        if self.converged and commit:
            if self._u_committed is not None:
                self._du_committed = self.u.x - self._u_committed
            self._u_committed = self.u.x.copy()
            for qmap in self.qmaps:
                qmap.advance()
        return self.converged, self.iterations


def solve_coupled(problems, transfers, max_outer=25, rtol=1e-8, atol=1e-12):
    """Monolithic-by-iteration multi-field solve (block Gauss-Seidel).

    The reference supports blocked/nest multi-space problems through PETSc
    (solvers.py:75-95); here the partitioned equivalent: iterate over the
    single-field Newton problems, pushing fields between them via ``transfers``
    (callables run before each sub-solve, e.g. updating the mechanical
    material's Temperature ESV from the current thermal solution), until no
    field's solution changes. State commits (``advance``) happen only once, on
    outer convergence — intermediate sub-solves run with ``commit=False`` so
    history variables are not polluted by unconverged passes.

    Returns (converged, n_outer).
    """
    import numpy as _np

    for outer in range(max_outer):
        change = 0.0
        scale = 0.0
        for prob, transfer in zip(problems, transfers):
            if transfer is not None:
                transfer()
            u_old = prob.u.x.copy()
            ok, _ = prob.solve(commit=False)
            if not ok:
                return False, outer
            change = max(change, float(_np.linalg.norm(prob.u.x - u_old)))
            scale = max(scale, float(_np.linalg.norm(prob.u.x)))
        if change <= atol + rtol * max(scale, 1.0):
            for prob in problems:
                for qmap in prob.qmaps:
                    qmap.advance()
            return True, outer + 1
    return False, max_outer


def solve_adaptive(problem, set_load, t_end, nsteps0=10, max_cutbacks=10, growth=1.5):
    """Load stepping with automatic cutback: on Newton failure, restore the last
    converged solution, revert the trial state (the reference's dormant
    ``DataManager.revert()`` capability, SURVEY.md §5 / generic.py:215-216), halve
    the step, retry; grow the step again after successes.

    ``set_load(t)`` applies the load parameter t in [0, t_end].
    Returns the list of accepted t values.
    """
    t, dt_step = 0.0, t_end / nsteps0
    accepted = []
    cutbacks = 0
    u_backup = problem.u.x.copy()
    while t < t_end - 1e-12 * t_end:
        t_try = min(t + dt_step, t_end)
        set_load(t_try)
        converged, _ = problem.solve()
        if converged:
            t = t_try
            accepted.append(t)
            u_backup = problem.u.x.copy()
            cutbacks = 0
            dt_step = min(dt_step * growth, t_end - t + 1e-30)
        else:
            problem.u.x = u_backup.copy()
            for qmap in problem.qmaps:
                qmap.revert()
            # the failed step's size is about to change: the stored secant
            # increment no longer matches, so drop the predictor baseline
            problem._du_committed = None
            dt_step *= 0.5
            cutbacks += 1
            if cutbacks > max_cutbacks:
                raise RuntimeError(
                    f"load stepping failed at t={t_try:.4g} after "
                    f"{max_cutbacks} cutbacks"
                )
    return accepted


class BlockedNonlinearProblem:
    """Monolithic multi-field Newton: all fields in ONE residual/operator with
    cross-field consistent-tangent blocks.

    The reference assembles blocked/nest multi-space problems through PETSc
    block matrices (reference solvers.py:75-95); here the TPU-native analogue:
    the concatenated dof vector is solved matrix-free with a block SpMV —
    diagonal blocks are each field's element matrices, off-diagonal blocks are
    ``K_rc = ∫ B_y^T C_(y,x) B_x^col dx`` where ``C_(y,x)`` is a declared
    flux x external-state-variable tangent block (computed in the material's
    single jacfwd pass) and ``B_x^col`` differentiates the ESV expression with
    respect to the OTHER field's element dofs.

    ``problems``: list of single-field :class:`NonlinearMaterialProblem`
    (their ``u``/``bcs``/``qmaps``/terms are reused verbatim).
    ``couplings``: list of tuples
        (row, col, qmap, y_name, x_name, x_expr[, scale])
    declaring that ``qmap`` (one of ``problems[row]``'s maps) has a tangent
    block ``(y_name, x_name)`` whose input ``x_name`` is an ESV evaluated from
    ``problems[col]``'s field by ``x_expr`` (a forms.py expression of the col
    field's local context). The coupling also OWNS the transfer: before every
    constitutive update the ESV is refreshed from the current col iterate —
    no manual ``transfers`` as in :func:`solve_coupled`.

    Strongly-coupled problems where block Gauss-Seidel limit-cycles converge
    here at full Newton rate (VERDICT r1 missing item 2).
    """

    def __init__(self, problems, couplings=(), interfaces=(), options=None):
        from .fem.assembly import QuadratureDomain

        self.problems = list(problems)
        #: interface-law terms (fem.submesh.InterfaceTerm) joining two fields
        self.interfaces = list(interfaces)
        o = dict(options or {})
        self.rtol = o.pop("rtol", None)
        self.atol = o.pop("atol", None)
        self.max_it = o.pop("max_it", 25)
        self.ksp_type = o.pop("ksp_type", "bicgstab")
        self.ksp_rtol = o.pop("ksp_rtol", None)
        self.ksp_maxiter = o.pop("ksp_maxiter", 2000)
        self.line_search = o.pop("line_search", True)
        self.max_backtracks = o.pop("max_backtracks", 12)
        self.verbose = o.pop("verbose", False)
        self.converged = False
        self.iterations = 0
        self.metrics: dict = {}

        # dof offsets of each field in the concatenated vector
        self.sizes = [p.u.space.num_dofs for p in self.problems]
        self.offsets = np.concatenate([[0], np.cumsum(self.sizes)])
        self.ndofs = int(self.offsets[-1])

        # --- coupling wiring -------------------------------------------------
        self._couplings = []
        for c in couplings:
            row, col, qmap, y, x, x_expr = c[:6]
            scale = c[6] if len(c) > 6 else 1.0
            if (y, x) not in qmap.material.tangent_blocks:
                raise KeyError(
                    f"material '{qmap.material.name}' declares no tangent "
                    f"block ({y}, {x})"
                )
            col_space = self.problems[col].u.space
            # col-field basis tables on the SAME cells/quadrature as the qmap
            col_dom = QuadratureDomain(
                col_space, qmap.domain.quad_degree, np.asarray(qmap.cells)
            )
            self._couplings.append(
                dict(
                    row=row,
                    col=col,
                    qmap=qmap,
                    y=y,
                    x=x,
                    scale=scale,
                    eval_x=col_dom.make_eval(x_expr),
                    B_x=col_dom.make_B(x_expr),
                    col_dom=col_dom,
                    # raw expression kept for the fused sharded blocked step
                    # (parallel/sharding.py: make_sharded_blocked_step)
                    x_expr_fn=x_expr,
                )
            )

    # ------------------------------------------------------------------ split
    def _split(self, z):
        return [
            z[self.offsets[i] : self.offsets[i + 1]]
            for i in range(len(self.problems))
        ]

    def _refresh_esvs(self, parts):
        for c in self._couplings:
            c["qmap"].material.update_external_state_variable(
                c["x"], c["eval_x"](parts[c["col"]])
            )

    def _constitutive_update(self, parts, flux_only=False):
        self._refresh_esvs(parts)
        for p, u_i in zip(self.problems, parts):
            if flux_only:
                p._constitutive_update_flux_only(u_i)
            else:
                p._constitutive_update(u_i)

    def _residual(self, parts):
        rs = [p._residual(u_i) for p, u_i in zip(self.problems, parts)]
        for itf in self.interfaces:
            r_i, r_j = itf.residuals(
                parts[itf.i], parts[itf.j], self.sizes[itf.i], self.sizes[itf.j]
            )
            rs[itf.i] = rs[itf.i] + r_i
            rs[itf.j] = rs[itf.j] + r_j
        return jnp.concatenate(rs)

    def _masks(self):
        masks, vals = [], []
        for p in self.problems:
            m, v = combine_bcs(p.bcs, p.u.space.num_dofs)
            masks.append(jnp.asarray(m))
            vals.append(jnp.asarray(v))
        return jnp.concatenate(masks), jnp.concatenate(vals)

    # --------------------------------------------------------------- operator
    def _coupling_matrices(self, parts):
        """Element coupling blocks K_e^{rc} (ne, ndof_row_el, ndof_col_el)."""
        out = []
        for c in self._couplings:
            qmap = c["qmap"]
            C = qmap.tangent_block(c["y"], c["x"])  # (npts, sy, sx)
            dom = qmap.domain
            ne, nq = dom.ne, dom.nq
            C = C.reshape(ne, nq, C.shape[-2], C.shape[-1])
            # row-side test-function derivative of the y-conjugate expression:
            # the row term pairing flux y with its work-conjugate expr
            row_p = self.problems[c["row"]]
            t = next(
                t for t in row_p._terms if t["qmap"] is qmap
            )
            k_term = t["field_names"].index(c["y"])
            # d(expr_y)/d(row dofs): the B of the y-term's TEST expression,
            # scaled by the term's own scale (theta-scheme etc.)
            if "B_y" not in c:
                c["B_y"] = dom.make_B(t["exprs"][k_term])
            term_scale = row_p._scale_value(t["scales"][k_term])
            By = c["B_y"](parts[c["row"]])  # (ne, nq, sy, ndof_row)
            Bx = c["B_x"](parts[c["col"]])  # (ne, nq, sx, ndof_col)
            K = (c["scale"] * term_scale) * jnp.einsum(
                "eqai,eqab,eqbj,eq->eij", By, C, Bx, dom.wdetJ
            )
            out.append(K)
        for itf in self.interfaces:
            out.append(itf.matrices(parts[itf.i], parts[itf.j]))
        return out

    def _apply_blocked(self, diag_Kels, coup_Ks, v, mask):
        """y = J v with bc rows/cols as identity."""
        v0 = jnp.where(mask, 0.0, v)
        parts_v = self._split(v0)
        ys = []
        for i, p in enumerate(self.problems):
            y_i = jnp.zeros(self.sizes[i])
            for t, K_e in zip(p._terms, diag_Kels[i]):
                y_i = y_i + t["qmap"].domain.spmv(K_e, parts_v[i])
            ys.append(y_i)
        for c, K in zip(self._couplings, coup_Ks):
            row_dom = c["qmap"].domain
            col_dom = c["col_dom"]
            v_e = col_dom.gather(parts_v[c["col"]])  # (ne, ndof_col)
            y_e = jnp.einsum("eij,ej->ei", K, v_e)
            # scatter-free assembly (gather-map / stencil), same semantics as
            # .at[dofmap].add but ~regular-memory-speed on TPU (docs/perf.md)
            ys[c["row"]] = ys[c["row"]] + row_dom.scatter_dofs(y_e)
        for itf, Ks in zip(self.interfaces, coup_Ks[len(self._couplings):]):
            K_ii, K_ij, K_ji, K_jj = Ks
            d_i, d_j = itf.scatter_dofs()
            vi, vj = parts_v[itf.i][d_i], parts_v[itf.j][d_j]
            ys[itf.i] = ys[itf.i].at[d_i.ravel()].add(
                (jnp.einsum("fab,fb->fa", K_ii, vi)
                 + jnp.einsum("fab,fb->fa", K_ij, vj)).ravel()
            )
            ys[itf.j] = ys[itf.j].at[d_j.ravel()].add(
                (jnp.einsum("fab,fb->fa", K_ji, vi)
                 + jnp.einsum("fab,fb->fa", K_jj, vj)).ravel()
            )
        y = jnp.concatenate(ys)
        return jnp.where(mask, v, y)

    def _linear_solve(self, diag_Kels, coup_Ks, rhs, mask):
        if self.ksp_type == "lu":
            import scipy.sparse as sp
            import scipy.sparse.linalg as spla

            A = sp.coo_matrix((self.ndofs, self.ndofs)).tocsr()
            for i, p in enumerate(self.problems):
                for t, K_e in zip(p._terms, diag_Kels[i]):
                    Ai = t["qmap"].domain.to_scipy_csr(
                        np.asarray(K_e), self.sizes[i]
                    )
                    off = int(self.offsets[i])
                    pad = sp.coo_matrix(
                        (Ai.tocoo().data,
                         (Ai.tocoo().row + off, Ai.tocoo().col + off)),
                        shape=(self.ndofs, self.ndofs),
                    ).tocsr()
                    A = A + pad
            for c, K in zip(self._couplings, coup_Ks):
                rdm = np.asarray(c["qmap"].domain.dofmap)
                cdm = np.asarray(c["col_dom"].dofmap)
                ner, ndr = rdm.shape
                ndc = cdm.shape[1]
                rows = np.repeat(rdm, ndc, axis=1).ravel() + int(
                    self.offsets[c["row"]]
                )
                cols = np.tile(cdm, (1, ndr)).ravel() + int(
                    self.offsets[c["col"]]
                )
                A = A + sp.coo_matrix(
                    (np.asarray(K).ravel(), (rows, cols)),
                    shape=(self.ndofs, self.ndofs),
                ).tocsr()
            for itf, Ks in zip(
                self.interfaces, coup_Ks[len(self._couplings):]
            ):
                d_i, d_j = itf.scatter_dofs()
                d_i = np.asarray(d_i) + int(self.offsets[itf.i])
                d_j = np.asarray(d_j) + int(self.offsets[itf.j])
                for K, rdofs, cdofs in zip(
                    Ks, (d_i, d_i, d_j, d_j), (d_i, d_j, d_i, d_j)
                ):
                    k = rdofs.shape[1]
                    rows = np.repeat(rdofs, k, axis=1).ravel()
                    cols = np.tile(cdofs, (1, k)).ravel()
                    A = A + sp.coo_matrix(
                        (np.asarray(K).ravel(), (rows, cols)),
                        shape=(self.ndofs, self.ndofs),
                    ).tocsr()
            A = A.tolil()
            bc_idx = np.nonzero(np.asarray(mask))[0]
            A[bc_idx, :] = 0.0
            A[:, bc_idx] = 0.0
            A[bc_idx, bc_idx] = 1.0
            b = np.asarray(jnp.where(mask, 0.0, rhs))
            return jnp.asarray(spla.spsolve(A.tocsr(), b))

        Av = lambda v: self._apply_blocked(diag_Kels, coup_Ks, v, mask)
        # block-Jacobi: each field's own diagonal
        diag = jnp.zeros(self.ndofs)
        for i, p in enumerate(self.problems):
            d_i = jnp.zeros(self.sizes[i])
            for t, K_e in zip(p._terms, diag_Kels[i]):
                d_i = d_i + t["qmap"].domain.matrix_diagonal(
                    K_e, self.sizes[i]
                )
            diag = diag.at[self.offsets[i] : self.offsets[i + 1]].set(d_i)
        for itf, Ks in zip(self.interfaces, coup_Ks[len(self._couplings):]):
            K_ii, _, _, K_jj = Ks
            d_i, d_j = itf.scatter_dofs()
            diag = diag.at[self.offsets[itf.i] + d_i.ravel()].add(
                jnp.diagonal(K_ii, axis1=1, axis2=2).ravel()
            )
            diag = diag.at[self.offsets[itf.j] + d_j.ravel()].add(
                jnp.diagonal(K_jj, axis1=1, axis2=2).ravel()
            )
        diag = jnp.where(mask | (jnp.abs(diag) < 1e-30), 1.0, diag)
        M = lambda v: v / diag
        b = jnp.where(mask, 0.0, rhs)
        solver = (
            jax.scipy.sparse.linalg.gmres
            if self.ksp_type == "gmres"
            else jax.scipy.sparse.linalg.bicgstab
        )
        ksp_rtol = self.ksp_rtol
        if ksp_rtol is None:
            ksp_rtol = 1e-12 if jnp.finfo(rhs.dtype).eps < 1e-9 else 1e-7
        du, _ = solver(Av, b, tol=ksp_rtol, maxiter=self.ksp_maxiter, M=M)
        lin_res = jnp.linalg.norm(Av(du) - b)
        bad = jnp.logical_or(
            ~jnp.isfinite(lin_res), lin_res > 0.9 * jnp.linalg.norm(b)
        )
        return jnp.where(bad, M(b), du)

    # ----------------------------------------------------------------- solve
    def solve(self, commit: bool = True):
        import time as _time

        mask, bc_vals = self._masks()
        z = jnp.concatenate([jnp.asarray(p.u.x) for p in self.problems])
        z = jnp.where(mask, bc_vals, z)
        eps_dtype = float(jnp.finfo(z.dtype).eps)
        f64 = eps_dtype < 1e-9
        rtol = self.rtol if self.rtol is not None else (
            1e-10 if f64 else 50.0 * eps_dtype
        )
        atol = self.atol if self.atol is not None else (1e-10 if f64 else 0.0)

        norm0 = None
        self.converged = False
        res_history = []
        t_start = _time.perf_counter()
        for it in range(self.max_it):
            parts = self._split(z)
            self._constitutive_update(parts)
            R = self._residual(parts)
            Rm = jnp.where(mask, 0.0, R)
            norm = float(jnp.linalg.norm(Rm))
            if not np.isfinite(norm):
                break
            res_history.append(norm)
            if norm0 is None:
                norm0 = norm if norm > 0 else 1.0
            if self.verbose:
                print(f"  blocked Newton it {it}: |R| = {norm:.6e}")
            if norm < atol or norm < rtol * norm0:
                self.converged = True
                self.iterations = it
                break
            diag_Kels = [p._element_matrices(u_i) for p, u_i in
                         zip(self.problems, parts)]
            coup_Ks = self._coupling_matrices(parts)
            du = self._linear_solve(diag_Kels, coup_Ks, -R, mask)
            if self.line_search:
                alpha, best_alpha, best_n = 1.0, None, np.inf
                for _ in range(self.max_backtracks):
                    z_try = z + alpha * du
                    parts_try = self._split(z_try)
                    self._constitutive_update(parts_try, flux_only=True)
                    n_try = float(jnp.linalg.norm(
                        jnp.where(mask, 0.0, self._residual(parts_try))
                    ))
                    if np.isfinite(n_try) and n_try < best_n:
                        best_alpha, best_n = alpha, n_try
                    if np.isfinite(n_try) and n_try < (1 - 1e-4 * alpha) * norm:
                        break
                    alpha *= 0.5
                if best_alpha is None or best_n >= norm:
                    # restore s1 to the kept z (trials overwrote it) before
                    # any exit that might commit
                    self._constitutive_update(self._split(z), flux_only=True)
                    self.iterations = it
                    if norm < np.sqrt(eps_dtype) * norm0:
                        self.converged = True
                    break
                z = z + best_alpha * du
                if best_n != n_try:
                    self._constitutive_update(self._split(z), flux_only=True)
            else:
                z = z + du

        for p, u_i in zip(self.problems, self._split(z)):
            p.u.x = np.array(u_i)  # writable copy (np.asarray of a jax array is read-only)
        self.metrics = {
            "converged": self.converged,
            "newton_iterations": self.iterations,
            "residual_history": res_history,
            "wall_time_s": _time.perf_counter() - t_start,
        }
        if self.converged and commit:
            for p in self.problems:
                for qmap in p.qmaps:
                    qmap.advance()
        return self.converged, self.iterations
