"""Submeshes + interface-law integrals for multi-material problems.

Rebuild of the reference's flagship composition pattern (reference
demos/multimaterials/multimaterials.py:242-353 and utils.py:6-161): two
displacement fields on two cell-subset submeshes — dofs DUPLICATED along the
shared interface — joined by an interface law

    R_interface(v) = ∫_Γ  t([[u]]) · [[v]]  dS,      [[u]] = u2 - u1,

with ``t`` an arbitrary traction-separation law (elastic ``t = K [[u]]``,
cohesive, ...). The law's tangent D = dt/d[[u]] comes from forward-mode AD, so
the blocked Newton stays consistent for nonlinear laws.

TPU-native design: the interface is tabulated host-side ONCE into dense facet
tables (per-side dof ids, facet basis, weighted area elements); residuals and
the four coupling blocks (11, 12, 21, 22) are then batched einsums over all
interface facets — no per-facet Python, jittable end-to-end. Plugs into
``BlockedNonlinearProblem`` via its ``interfaces=`` argument.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .element import FACETS, ReferenceElement
from .facets import _facet_cell_type, _facet_nodes
from .mesh import Mesh
from .space import FunctionSpace


def extract_submesh(mesh: Mesh, cells):
    """Extract the submesh of a cell subset with its own (renumbered) vertices.

    Returns ``(submesh, vertex_map)`` where ``vertex_map[i_sub] = i_parent``.
    Vertices shared by two submeshes are DUPLICATED across them — each submesh
    field carries independent dofs, exactly the reference's
    ``mesh.create_submesh`` semantics (multimaterials.py; utils.py:6-22).
    """
    cells = np.asarray(cells, dtype=np.int32)
    sub_cells_parent = mesh.cells[cells]  # (ne_sub, nverts), parent ids
    vertex_map, inverse = np.unique(sub_cells_parent, return_inverse=True)
    sub_cells = inverse.reshape(sub_cells_parent.shape).astype(np.int32)
    sub = Mesh(mesh.points[vertex_map], sub_cells, mesh.cell_type)
    return sub, vertex_map.astype(np.int32)


def interface_facets(mesh: Mesh, cells1, cells2):
    """Facets shared by one cell of ``cells1`` and one of ``cells2``.

    Returns ``facet_verts (nf, nfv)`` in PARENT vertex ids (the role of the
    reference's interface meshtag transfer, utils.py:25-161).
    """
    lf = np.array(FACETS[mesh.cell_type])  # (nlf, nfv)
    fv = mesh.cells[:, lf]  # (ncells, nlf, nfv)
    ncells, nlf, nfv = fv.shape
    flat = fv.reshape(-1, nfv)
    keys = np.sort(flat, axis=1)
    uniq, first_occurrence, inv = np.unique(
        keys, axis=0, return_index=True, return_inverse=True
    )
    owner_cell = np.repeat(np.arange(ncells), nlf)
    in1 = np.zeros(ncells, bool)
    in1[np.asarray(cells1, dtype=np.int64)] = True
    in2 = np.zeros(ncells, bool)
    in2[np.asarray(cells2, dtype=np.int64)] = True

    # vectorized side membership (a Python loop over ncells*nlf incidences
    # costs tens of seconds on production meshes)
    side1 = np.bincount(inv, weights=in1[owner_cell], minlength=len(uniq)) > 0
    side2 = np.bincount(inv, weights=in2[owner_cell], minlength=len(uniq)) > 0
    on_interface = side1 & side2
    return flat[first_occurrence[on_interface]].astype(np.int32)


class InterfaceDomain:
    """Tabulated interface quadrature joining two fields across facing submeshes.

    ``space1``/``space2`` live on submeshes extracted from the same parent mesh;
    ``facet_verts_parent`` are interface facets in parent vertex ids;
    ``vmap1``/``vmap2`` the submesh->parent vertex maps from
    :func:`extract_submesh`. Fields must share ``ncomp``.
    """

    def __init__(
        self,
        space1: FunctionSpace,
        space2: FunctionSpace,
        facet_verts_parent,
        vmap1,
        vmap2,
        quad_degree=4,
    ):
        assert space1.ncomp == space2.ncomp, "interface fields must match ncomp"
        self.space1, self.space2 = space1, space2
        self.ncomp = space1.ncomp
        fvp = np.asarray(facet_verts_parent, dtype=np.int32)
        self.num_facets = len(fvp)

        # parent -> submesh vertex id maps
        def inv_map(vmap, npar):
            m = np.full(npar, -1, np.int32)
            m[vmap] = np.arange(len(vmap), dtype=np.int32)
            return m

        npar = int(max(vmap1.max(), vmap2.max())) + 1
        inv1, inv2 = inv_map(vmap1, npar), inv_map(vmap2, npar)
        fv1, fv2 = inv1[fvp], inv2[fvp]
        assert (fv1 >= 0).all() and (fv2 >= 0).all(), (
            "interface facet has vertices missing from a submesh"
        )
        # conformity check: the two submeshes must be geometrically coincident
        # along the interface (side-1 geometry is used for the quadrature
        # below) — a mismatched pair would otherwise couple wrong locations
        # silently
        c1 = space1.mesh.points[fv1]
        c2 = space2.mesh.points[fv2]
        scale = max(1.0, float(np.abs(c1).max()))
        if not np.allclose(c1, c2, atol=1e-10 * scale):
            raise ValueError(
                "interface submeshes are not conforming: side-2 facet "
                f"coordinates deviate from side 1 by up to "
                f"{np.abs(c1 - c2).max():.3e}"
            )

        fct = _facet_cell_type(space1.mesh)
        geo = ReferenceElement(fct, 1, quad_degree)
        elem = ReferenceElement(fct, space1.degree, quad_degree)
        self.nq, self.nloc_f = elem.nq, elem.N.shape[1]

        coords = space1.mesh.points[fv1]  # (nf, nfv, dim) — same geometry both sides
        J = np.einsum("fvi,qvj->fqij", coords, geo.dN)
        G = np.einsum("fqij,fqik->fqjk", J, J)
        self.w = jnp.asarray(elem.qweights[None, :] * np.sqrt(np.linalg.det(G)))
        self.x_q = jnp.asarray(np.einsum("qv,fvi->fqi", geo.N, coords))
        self.N = jnp.asarray(elem.N)  # (nq, nloc_f)

        nodes1 = _facet_nodes(space1, fv1)  # (nf, nloc_f)
        nodes2 = _facet_nodes(space2, fv2)
        nc = self.ncomp
        comp = np.arange(nc)[None, None, :]
        self.dofs1 = jnp.asarray(nodes1[:, :, None] * nc + comp)  # (nf, nloc_f, nc)
        self.dofs2 = jnp.asarray(nodes2[:, :, None] * nc + comp)

    # ------------------------------------------------------------------ eval
    def _u_q(self, u, dofs):
        u_n = jnp.asarray(u)[dofs]  # (nf, nloc_f, nc)
        return jnp.einsum("qv,fvc->fqc", self.N, u_n)

    def jump(self, u1, u2):
        """[[u]] = u2 - u1 at interface quadrature points, (nf, nq, nc)."""
        return self._u_q(u2, self.dofs2) - self._u_q(u1, self.dofs1)


class InterfaceTerm:
    """An interface law between fields ``i`` and ``j`` of a blocked problem.

    ``traction``: jnp function ``jump (ncomp,) -> traction (ncomp,)`` (may close
    over parameters). Tangent via jacfwd. Residual contributions:

        R_i -= ∫ t([[u]]) · N_i dS,    R_j += ∫ t([[u]]) · N_j dS.
    """

    def __init__(self, i: int, j: int, domain: InterfaceDomain, traction):
        self.i, self.j = i, j
        self.domain = domain
        self.traction = traction
        d = domain
        self._t_batch = jax.jit(
            jax.vmap(jax.vmap(traction))
        )  # (nf, nq, nc) -> (nf, nq, nc)
        self._D_batch = jax.jit(jax.vmap(jax.vmap(jax.jacfwd(traction))))

    def residuals(self, u_i, u_j, ndofs_i, ndofs_j):
        d = self.domain
        t_q = self._t_batch(d.jump(u_i, u_j))  # (nf, nq, nc)
        wt = d.w[:, :, None] * t_q
        contrib = jnp.einsum("qv,fqc->fvc", d.N, wt)  # (nf, nloc_f, nc)
        r_i = jnp.zeros(ndofs_i).at[d.dofs1.ravel()].add(-contrib.ravel())
        r_j = jnp.zeros(ndofs_j).at[d.dofs2.ravel()].add(contrib.ravel())
        return r_i, r_j

    def matrices(self, u_i, u_j):
        """Facet coupling blocks K_aa, K_ab, K_ba, K_bb with
        K_xy (nf, nloc_f*nc, nloc_f*nc) relating side-x test dofs to side-y
        trial dofs (signs included: d(R)/d(u))."""
        d = self.domain
        D = self._D_batch(d.jump(u_i, u_j))  # (nf, nq, nc, nc)
        # base block: B[f, (v,c), (w,e)] = sum_q w N_v N_w D[c,e]
        base = jnp.einsum("fq,qv,qw,fqce->fvcwe", d.w, d.N, d.N, D)
        nf = base.shape[0]
        k = d.nloc_f * d.ncomp
        base = base.reshape(nf, k, k)
        # R_i gets -t (test side 1), R_j gets +t (test side 2);
        # jump depends -u_i, +u_j:
        K_ii = base  # (-t)(-u_i)
        K_ij = -base
        K_ji = -base
        K_jj = base
        return K_ii, K_ij, K_ji, K_jj

    def scatter_dofs(self):
        d = self.domain
        return (
            d.dofs1.reshape(d.num_facets, -1),
            d.dofs2.reshape(d.num_facets, -1),
        )


def elastic_interface(K):
    """Linear elastic interface law t = K [[u]] (reference multimaterials
    demo's ∫ K [[u]]·[[v]] dS, multimaterials.py:320-330). ``K``: scalar
    stiffness or (ncomp,) per-component stiffnesses."""

    def traction(jump):
        return jnp.asarray(K) * jump

    return traction
