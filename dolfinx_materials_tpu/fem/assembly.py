"""Batched einsum assembly: tabulated domains, residuals, element matrices, SpMV.

This is the TPU-native replacement for FFCx-generated C kernels + PETSc matrices
(reference L0, SURVEY.md §1). Design:

- ALL element data lives in dense batched arrays (ncells, nq, ...) — assembly is a
  handful of einsums (MXU) plus one scatter-add (``.at[].add``), fully jittable and
  shardable over the cell axis;
- the global Jacobian is never stored as a sparse matrix on device: Newton-Krylov
  uses element matrices K_e with gather -> batched matmul -> scatter-add SpMV
  ("assembly-free FEM"), the standard high-order trick that maps perfectly onto
  XLA. A host-side CSR export supports scipy direct solves for small/validation
  problems (the reference's LU/MUMPS role, tests/uniaxial_tension.py:78-82).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .element import ReferenceElement
from .forms import Ctx
from .space import FunctionSpace


class QuadratureDomain:
    """Tabulated geometry/basis for (space, quadrature degree, cell subset).

    Plays the role of the reference's ``qmap.dx`` measure + Quadrature function
    space (quadrature_map.py:74-117): it fixes the Gauss-point set on which
    material state lives, and provides evaluation/assembly kernels on it.
    """

    def __init__(self, space: FunctionSpace, quad_degree: int, cells=None, weight=None):
        """``weight``: optional callable x (m, dim) -> (m,) multiplying the
        integration measure (e.g. ``lambda x: 2*pi*x[:, 0]`` for axisymmetry,
        the reference's axi_grad + r-measure pattern, utils.py:215-237)."""
        mesh = space.mesh
        self.space = space
        self.quad_degree = quad_degree
        self.cells = (
            np.arange(mesh.num_cells, dtype=np.int32)
            if cells is None
            else np.asarray(cells, dtype=np.int32)
        )
        elem = ReferenceElement(mesh.cell_type, space.degree, quad_degree)
        # isoparametric: curved meshes (mesh.geom_degree == 2, see
        # fem/mesh.py:curve_mesh) push geometry through the same AD-tabulated
        # degree-2 element; straight meshes stay multilinear from the vertices
        geo = ReferenceElement(mesh.cell_type, mesh.geom_degree, quad_degree)
        self.element = elem
        self.nq = elem.nq
        self.ne = len(self.cells)
        self.num_points = self.ne * self.nq
        self.nloc = space.nloc
        self.ncomp = space.ncomp
        self.ndof_el = self.nloc * self.ncomp

        if mesh.geom_degree == 1:
            coords = mesh.points[mesh.cells[self.cells]]  # (ne, nverts, dim)
        else:
            coords = mesh.geom_points[mesh.geom_cells[self.cells]]
        J = np.einsum("cvi,qvj->cqij", coords, geo.dN)  # dx/dxi
        detJ = np.linalg.det(J)
        invJ = np.linalg.inv(J)  # dxi/dx
        # dN/dx_i = dN/dxi_j * dxi_j/dx_i
        dNdx = np.einsum("qvj,cqji->cqvi", elem.dN, invJ)
        self.dNdx = jnp.asarray(dNdx)  # (ne, nq, nloc, dim)
        self.N = jnp.asarray(elem.N)  # (nq, nloc)
        x_q = np.einsum("qv,cvi->cqi", geo.N, coords)  # (ne, nq, dim)
        wdetJ = elem.qweights[None, :] * np.abs(detJ)
        if weight is not None:
            wdetJ = wdetJ * np.asarray(
                weight(x_q.reshape(-1, x_q.shape[-1]))
            ).reshape(wdetJ.shape)
        self.wdetJ = jnp.asarray(wdetJ)  # (ne, nq)
        self.x_q = jnp.asarray(x_q)
        self.dofmap = jnp.asarray(space.dofmap[self.cells])  # (ne, ndof_el)
        self.cell_volumes = jnp.sum(self.wdetJ, axis=1)
        self._build_gather_map()
        # stencil (shifted-slice) gather/assembly on structured P1 grids:
        # TPU scalar gathers/scatters measured ~100x slower than slices
        # (docs/perf.md "assembly-free SpMV")
        self._stencil = None
        if (
            getattr(mesh, "grid", None) is not None
            and space.degree == 1
            and cells is None
            and mesh.cell_type in ("quad", "hexahedron")
        ):
            self._stencil = tuple(int(g) for g in mesh.grid)
        # banded lane-gather engine on UNSTRUCTURED meshes / cell subsets
        # (ops/banded_gather.py): plans built host-side here, Pallas kernels
        # lazily on first TPU use; quality-gated so badly-numbered meshes
        # (use fem/reorder.py) silently keep the gather-map path
        self._banded = None
        self._banded_takes = {}
        if self._stencil is None and self.ne * self.ndof_el >= (1 << 13):
            self._build_banded()

    def _build_banded(self):
        """Host-side banded-gather plans (cell-major gather, feature-major
        gather, slot-wise assembly); kept only if the mesh numbering is banded
        enough that windows stay small and patches rare."""
        from ..ops import banded_gather as bg

        dm = np.asarray(self.dofmap)
        ndofs = self.space.num_dofs

        def plan_ok(p):
            if p is None or p.frac_patched >= 0.02:
                return False
            # kernel selection (_best_take) compares the PADDED f32 table
            # (plan.nrows rows of 128 lanes) against the VMEM budget — gate
            # with the same quantity so an accepted plan runs the kernel its
            # branch reasoned about
            if p.nrows * bg.LANE * 4 <= bg.VMEM_TABLE_BYTES:
                # VMEM-resident kernel: per-chunk cost is the OCCUPIED
                # sub-block count (plan.nq), not the global p99 window R — a
                # fat tail in a few chunks is fine as long as the average
                # walk stays short
                return (
                    p.R <= 256
                    and float(np.asarray(p.nq).mean()) * p.sub <= 64
                )
            return p.R <= 64  # streaming kernel pays R/sub steps per chunk

        def best_plan(fn, chunks=(2048, 1024, 512, 256)):
            """Smaller chunks shrink per-chunk windows (key on small meshes
            — the reference's ~3k-cell benchmark meshes — where 2048 outputs
            cover most of the mesh); plans are cheap host-side numpy, so just
            try a few sizes and keep the first that passes the gate."""
            for ch in chunks:
                p = fn(chunk=ch)
                if plan_ok(p):
                    return p
            return None

        plans = {
            "cell": best_plan(
                lambda chunk: bg.plan_banded_take(
                    dm.ravel(), ndofs, chunk=chunk, max_R=256
                ),
            ),
            "fm": best_plan(
                lambda chunk: bg.plan_banded_take(
                    dm.T.ravel(), ndofs, chunk=chunk, max_R=256
                ),
            ),
            # max_R=256 here too: the gate's VMEM branch admits R <= 256,
            # and the planner's default 64 would clip wider assembly windows
            # into mass-patching -> silent rejection of the whole engine
            "asm": best_plan(
                lambda chunk: bg.plan_slotwise_assembly(
                    dm, ndofs, chunk=chunk, max_R=256
                ),
                chunks=(1024, 512, 256),
            ),
        }
        # the fused sharded step needs cell+asm; the host spmv additionally
        # needs fm — keep whatever subset passed (consumers check per key)
        if plans["cell"] is not None and plans["asm"] is not None:
            self._banded = plans

    def _banded_take(self, key, table):
        """Dispatch one planned take: Pallas on TPU, XLA fallback elsewhere."""
        import jax as _jax

        from ..ops import banded_gather as bg

        plan = self._banded[key]
        if _jax.default_backend() != "tpu":
            return bg.banded_take_xla(table, plan)
        dtype = jnp.asarray(table).dtype
        fn = self._banded_takes.get((key, dtype))
        if fn is None:
            fn = bg._best_take(plan, dtype)
            self._banded_takes[(key, dtype)] = fn
        return fn(table)

    @property
    def banded_active(self):
        """True when the banded lane-gather engine serves this domain's
        gather/assembly/SpMV (unstructured fast path)."""
        import jax as _jax

        return self._banded is not None and _jax.default_backend() == "tpu"

    _CORNERS_2D = ((0, 0), (1, 0), (1, 1), (0, 1))
    _CORNERS_3D = (
        (0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
        (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1),
    )

    def _build_gather_map(self):
        """Transpose of the dofmap scatter: for every global dof, the (padded)
        positions of its element contributions in the flattened element-value
        array. Assembly then runs as ONE gather + row-sum — TPU scatter-add
        with duplicate indices measured 1-2 GB/s effective (300x off the
        memory roofline, docs/perf.md); gathers run at memory speed."""
        dm = np.asarray(self.dofmap).ravel()
        ndofs = self.space.num_dofs
        order = np.argsort(dm, kind="stable")
        sorted_dofs = dm[order]
        counts = np.bincount(sorted_dofs, minlength=ndofs)
        kmax = int(counts.max()) if len(dm) else 0
        gm = np.full((ndofs, kmax), len(dm), dtype=np.int64)  # pad -> zero slot
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        idx_within = np.arange(len(dm)) - np.repeat(starts, counts)
        gm[sorted_dofs, idx_within] = order
        self._gather_map = jnp.asarray(gm.astype(np.int32))

    def scatter_dofs(self, vals_e):
        """Sum element-local values (ne, ndof_el) into a global (ndofs,)
        vector. Structured P1 grids use shifted-slice adds onto the node grid
        (stencil assembly, no scatter); otherwise the precomputed gather map
        (one gather + row-sum)."""
        nc = self.ncomp
        if self._stencil is not None and len(self._stencil) == 2:
            nx, ny = self._stencil
            vals = vals_e.reshape(nx, ny, self.nloc, nc)
            y = jnp.zeros((nx + 1, ny + 1, nc), vals_e.dtype)
            for k, (di, dj) in enumerate(self._CORNERS_2D):
                y = y.at[di : di + nx, dj : dj + ny].add(vals[:, :, k])
            return y.reshape(-1)
        if self._stencil is not None:
            nx, ny, nz = self._stencil
            vals = vals_e.reshape(nx, ny, nz, self.nloc, nc)
            y = jnp.zeros((nx + 1, ny + 1, nz + 1, nc), vals_e.dtype)
            for k, (di, dj, dk) in enumerate(self._CORNERS_3D):
                y = y.at[di : di + nx, dj : dj + ny, dk : dk + nz].add(
                    vals[:, :, :, k]
                )
            return y.reshape(-1)
        if self.banded_active:
            # assembly-as-gather over feature-major element values
            return self._banded_take("asm", vals_e.T.reshape(-1))
        vals = jnp.concatenate(
            [vals_e.ravel(), jnp.zeros(1, vals_e.dtype)]
        )
        return jnp.sum(vals[self._gather_map], axis=1)

    # ------------------------------------------------------------- gathers
    def gather(self, u):
        """u (ndofs,) -> element dofs (ne, ndof_el); shifted-slice windows on
        structured P1 grids (see :meth:`scatter_dofs`)."""
        u = jnp.asarray(u)
        nc = self.ncomp
        if self._stencil is not None and len(self._stencil) == 2:
            nx, ny = self._stencil
            u2 = u.reshape(nx + 1, ny + 1, nc)
            parts = [
                u2[di : di + nx, dj : dj + ny].reshape(self.ne, nc)
                for (di, dj) in self._CORNERS_2D
            ]
            return jnp.concatenate(parts, axis=1)
        if self._stencil is not None:
            nx, ny, nz = self._stencil
            u3 = u.reshape(nx + 1, ny + 1, nz + 1, nc)
            parts = [
                u3[di : di + nx, dj : dj + ny, dk : dk + nz].reshape(self.ne, nc)
                for (di, dj, dk) in self._CORNERS_3D
            ]
            return jnp.concatenate(parts, axis=1)
        if self.banded_active:
            return self._banded_take("cell", u).reshape(self.ne, self.ndof_el)
        return u[self.dofmap]

    def _cell_eval(self, expr, u_e, dNdx_c, x_c):
        """expr at all qps of one cell given element dofs (ndof_el,)."""
        un = u_e.reshape(self.nloc, self.ncomp)
        u_q = self.N @ un  # (nq, ncomp)
        grad_q = jnp.einsum("qvi,vc->qci", dNdx_c, un)  # (nq, ncomp, dim)
        return jax.vmap(lambda u, g, x: expr(Ctx(u, g, x)))(u_q, grad_q, x_c)

    # --------------------------------------------------------- public kernels
    def make_eval(self, expr):
        """Jitted: u (ndofs,) -> expression values (ne*nq, size).

        The reference's gradient evaluation (quadrature_map.py:305-313 via
        fem.Expression.eval) — here one fused gather+einsum kernel."""

        def f(u):
            u_e = self.gather(u)
            vals = jax.vmap(
                lambda ue, d, x: self._cell_eval(expr, ue, d, x)
            )(u_e, self.dNdx, self.x_q)
            return vals.reshape(self.num_points, -1)

        return jax.jit(f)

    def make_B(self, expr):
        """Jitted: u -> B = d(expr)/d(u_e) per qp, (ne, nq, size, ndof_el)."""

        def f(u):
            u_e = self.gather(u)

            def cell(ue, d, x):
                return jax.jacfwd(lambda w: self._cell_eval(expr, w, d, x))(ue)

            return jax.vmap(cell)(u_e, self.dNdx, self.x_q)

        return jax.jit(f)

    def make_residual(self, exprs):
        """Jitted residual of the quadrature terms sum_k ∫ field_k · expr_k(u) dx.

        ``exprs``: list of expression fns. Returns ``f(u, fields) -> R (ndofs,)``
        with ``fields`` a list of (ne*nq, size_k) coefficient arrays (fluxes/ISVs
        from the material — held FIXED, exactly like UFL treats quadrature
        coefficients in the residual form, reference solvers.py:81).
        """

        def f(u, fields):
            u_e = self.gather(u)

            def cell_res(ue, d, x, w, *flds):
                def work(w_):
                    tot = 0.0
                    for expr, fld in zip(exprs, flds):
                        g = self._cell_eval(expr, w_, d, x)  # (nq, size)
                        tot = tot + jnp.sum(w[:, None] * g * fld)
                    return tot

                return jax.grad(work)(ue)

            fields_e = [
                f_.reshape(self.ne, self.nq, -1) for f_ in fields
            ]
            r_e = jax.vmap(cell_res)(u_e, self.dNdx, self.x_q, self.wdetJ, *fields_e)
            return self.scatter_dofs(r_e)

        return jax.jit(f)

    def make_element_matrices(self, exprs, tangent_structure):
        """Jitted consistent element tangent matrices K_e (ne, ndof_el, ndof_el).

        K_e = sum over material couplings (term k, input expr x):
                ∫ B_k^T C_(field_k, x) B_x dx        (material stiffness)
              + hessian_u of sum_k ∫ field_k · expr_k(u) dx   (geometric stiffness)

        ``tangent_structure``: list of (k_term, x_expr_fn, None) triples; the
        matching C blocks are passed at call time as (ne*nq, size_y, size_x)
        arrays. This reproduces qmap.derivative's block insertion
        (reference quadrature_map.py:132-158) with AD instead of UFL rewriting.
        Returns ``f(u, fields, Cs) -> K_e``.
        """

        def f(u, fields, Cs):
            u_e = self.gather(u)
            fields_e = [f_.reshape(self.ne, self.nq, -1) for f_ in fields]
            Cs_e = [C.reshape(self.ne, self.nq, C.shape[-2], C.shape[-1]) for C in Cs]

            def cell(ue, d, x, w, flds, Cblocks):
                Bcache = {}

                def B_of(expr):
                    key = id(expr)
                    if key not in Bcache:
                        Bcache[key] = jax.jacfwd(
                            lambda w_: self._cell_eval(expr, w_, d, x)
                        )(ue)
                    return Bcache[key]

                K = jnp.zeros((self.ndof_el, self.ndof_el), ue.dtype)
                for (k_term, x_expr, _), C in zip(tangent_structure, Cblocks):
                    By = B_of(exprs[k_term])  # (nq, size_y, ndof)
                    Bx = B_of(x_expr)  # (nq, size_x, ndof)
                    K = K + jnp.einsum("qai,qab,qbj,q->ij", By, C, Bx, w)

                # geometric stiffness (zero for linear expressions)
                def work(w_):
                    tot = 0.0
                    for expr, fld in zip(exprs, flds):
                        g = self._cell_eval(expr, w_, d, x)
                        tot = tot + jnp.sum(w[:, None] * g * fld)
                    return tot

                K = K + jax.hessian(work)(ue)
                return K

            return jax.vmap(cell)(
                u_e, self.dNdx, self.x_q, self.wdetJ, fields_e, Cs_e
            )

        return jax.jit(f)

    # ------------------------------------------------------------ operators
    def spmv_prepare(self, K_e):
        """Pre-transpose element matrices for repeated :meth:`spmv` calls.

        Stencil (structured-P1) domains store K feature-major as
        (ndof_el*ndof_el, ne) rows — the (ne, nd, nd) layout pads its tiny
        minor dims ~16x on TPU tiles and measured 6x slower per matvec
        (docs/perf.md). One transpose per Newton iteration amortizes over the
        ~100 CG matvecs that reuse it. General domains return K_e unchanged.
        """
        nd = self.ndof_el
        if self._stencil is None:
            # the banded spmv needs the feature-major gather plan too (it can
            # be absent while cell+asm passed the quality gate — _build_banded)
            if self.banded_active and self._banded.get("fm") is not None:
                return (
                    "bdfm",
                    jnp.transpose(K_e, (1, 2, 0)).reshape(nd * nd, self.ne),
                )
            return K_e
        return ("fm", jnp.transpose(K_e, (1, 2, 0)).reshape(nd * nd, self.ne))

    def spmv(self, K_e, v):
        """Assembly-free SpMV: y = A v from element matrices (raw (ne, nd, nd)
        or the output of :meth:`spmv_prepare`): stencil-slice gather ->
        per-entry FMA rows (feature-major) or batched einsum -> stencil /
        gather-map assembly. No scatter anywhere."""
        v = jnp.asarray(v)
        nd = self.ndof_el
        if isinstance(K_e, tuple) and K_e[0] == "bdfm":
            # banded unstructured path: feature-major lane-gather -> per-row
            # FMAs on (ne,) lanes -> slot-wise assembly-as-gather
            Kf = K_e[1]
            u = self._banded_take("fm", v).reshape(nd, self.ne)
            y = [
                sum(Kf[i * nd + j] * u[j] for j in range(nd))
                for i in range(nd)
            ]
            return self._banded_take(
                "asm", jnp.stack(y).reshape(-1)
            ).astype(v.dtype)
        if isinstance(K_e, tuple) and K_e[0] == "fm":
            Kf = K_e[1]
            vr = self._gather_rows(v)
            yr = [
                sum(Kf[i * nd + j] * vr[j] for j in range(nd))
                for i in range(nd)
            ]
            return self._scatter_rows(yr, v.dtype)
        # raw-K fallback (also the banded path when the feature-major plan is
        # absent but cell+asm built — P2 simplex meshes): the gather and the
        # scatter_dofs assembly each route through the banded engine when
        # active, so no scalar gather/scatter appears here either
        if self.banded_active:
            v_e = self._banded_take("cell", v).reshape(self.ne, nd)
        else:
            v_e = v[self.dofmap]  # (ne, ndof_el)
        y_e = jnp.einsum("eij,ej->ei", K_e, v_e)
        return self.scatter_dofs(y_e).astype(v.dtype)

    def _gather_rows(self, u):
        """Stencil gather as a LIST of (ne,) rows (feature-major, no (ne, nd)
        minor-dim padding)."""
        nc = self.ncomp
        if len(self._stencil) == 2:
            nx, ny = self._stencil
            u2 = u.reshape(nx + 1, ny + 1, nc)
            return [
                u2[di : di + nx, dj : dj + ny, c].reshape(self.ne)
                for (di, dj) in self._CORNERS_2D
                for c in range(nc)
            ]
        nx, ny, nz = self._stencil
        u3 = u.reshape(nx + 1, ny + 1, nz + 1, nc)
        return [
            u3[di : di + nx, dj : dj + ny, dk : dk + nz, c].reshape(self.ne)
            for (di, dj, dk) in self._CORNERS_3D
            for c in range(nc)
        ]

    def _scatter_rows(self, rows, dtype):
        nc = self.ncomp
        if len(self._stencil) == 2:
            nx, ny = self._stencil
            y = jnp.zeros((nx + 1, ny + 1, nc), dtype)
            i = 0
            for (di, dj) in self._CORNERS_2D:
                for c in range(nc):
                    y = y.at[di : di + nx, dj : dj + ny, c].add(
                        rows[i].reshape(nx, ny)
                    )
                    i += 1
            return y.reshape(-1)
        nx, ny, nz = self._stencil
        y = jnp.zeros((nx + 1, ny + 1, nz + 1, nc), dtype)
        i = 0
        for (di, dj, dk) in self._CORNERS_3D:
            for c in range(nc):
                y = y.at[di : di + nx, dj : dj + ny, dk : dk + nz, c].add(
                    rows[i].reshape(nx, ny, nz)
                )
                i += 1
        return y.reshape(-1)

    def matrix_diagonal(self, K_e, ndofs):
        d_e = jnp.diagonal(K_e, axis1=1, axis2=2)
        return self.scatter_dofs(d_e)

    def matrix_node_blocks(self, K_e, nnodes):
        """Per-NODE (ncomp x ncomp) diagonal blocks of the assembled operator,
        (nnodes, ncomp, ncomp) — the block-Jacobi preconditioner's data. Local
        dofs are node-blocked (``dof = node*ncomp + comp``), so the block
        diagonal is one einsum + scatter-add."""
        nc = self.ncomp
        Kb = K_e.reshape(self.ne, self.nloc, nc, self.nloc, nc)
        diagb = jnp.einsum("eiaib->eiab", Kb)  # (ne, nloc, nc, nc)
        nodes = self.dofmap[:, ::nc] // nc  # (ne, nloc)
        return (
            jnp.zeros((nnodes, nc, nc), K_e.dtype)
            .at[nodes.ravel()]
            .add(diagb.reshape(-1, nc, nc))
        )

    def to_scipy_csr(self, K_e, ndofs):
        """Export the assembled sparse matrix for host direct solves."""
        import scipy.sparse as sp

        dm = np.asarray(self.dofmap)
        rows = np.repeat(dm, self.ndof_el, axis=1).ravel()
        cols = np.tile(dm, (1, self.ndof_el)).ravel()
        A = sp.coo_matrix(
            (np.asarray(K_e).ravel(), (rows, cols)), shape=(ndofs, ndofs)
        )
        return A.tocsr()


def assemble_scalar(domain: QuadratureDomain, values_q):
    """∫ f dx over the domain (values at quadrature points, (ne*nq,) or scalar)."""
    v = jnp.broadcast_to(
        jnp.asarray(values_q).reshape(-1), (domain.num_points,)
    ).reshape(domain.ne, domain.nq)
    return jnp.sum(domain.wdetJ * v)


def project_cg(domain: QuadratureDomain, values_q, degree=1, smooth=None):
    """L2-project a quadrature field onto a continuous Lagrange space on the
    same mesh: mass-matrix CG solve, all on device (the reference's
    ``utils.project`` role, utils.py:19-68). Returns (space, dof array (nnodes, k)).

    ``smooth``: optional Helmholtz filter length — adds
    ``smooth**2 * ∫ grad(Pv).grad(w) dx`` to the projection operator exactly
    as the reference's ``project(..., smooth=...)`` does (utils.py:51-53),
    damping sub-``smooth``-scale oscillations of the raw quadrature field
    (checkerboard stress modes on coarse meshes)."""
    from .space import FunctionSpace

    mesh = domain.space.mesh
    vals = jnp.asarray(values_q).reshape(domain.ne, domain.nq, -1)
    k = vals.shape[-1]
    target = FunctionSpace(mesh, degree, ())
    tdom = QuadratureDomain(target, domain.quad_degree, np.asarray(domain.cells))

    # element mass and rhs
    Me = jnp.einsum("eq,qi,qj->eij", tdom.wdetJ, tdom.N, tdom.N)
    if smooth is not None:
        Me = Me + float(smooth) ** 2 * jnp.einsum(
            "eq,eqid,eqjd->eij", tdom.wdetJ, tdom.dNdx, tdom.dNdx
        )
    rhs_e = jnp.einsum("eq,qi,eqc->eic", tdom.wdetJ, tdom.N, vals)
    ndofs = target.num_dofs
    dm = tdom.dofmap
    rhs = jnp.zeros((ndofs, k)).at[dm.ravel()].add(rhs_e.reshape(-1, k))
    diag = jnp.zeros(ndofs).at[dm.ravel()].add(
        jnp.diagonal(Me, axis1=1, axis2=2).ravel()
    )
    diag = jnp.where(diag <= 0, 1.0, diag)

    def Av(v):
        v_e = v[dm]
        return jnp.zeros(ndofs, v.dtype).at[dm.ravel()].add(
            jnp.einsum("eij,ej->ei", Me, v_e).ravel()
        )

    def solve_one(b):
        x, _ = jax.scipy.sparse.linalg.cg(Av, b, tol=1e-12, M=lambda v: v / diag)
        return x

    out = jax.vmap(solve_one, in_axes=1, out_axes=1)(rhs)
    return target, np.asarray(out)


def project_dg0(domain: QuadratureDomain, values_q):
    """Cell-averaged (DG-0) projection of a quadrature field, (ne, size).

    The reference's ``project_on(name, ("DG", 0))`` postprocessing
    (quadrature_map.py:362-401)."""
    v = jnp.asarray(values_q).reshape(domain.ne, domain.nq, -1)
    num = jnp.einsum("eq,eqk->ek", domain.wdetJ, v)
    return num / domain.cell_volumes[:, None]
