"""Reference elements and quadrature rules, tabulated by AD.

Replaces Basix's C++ tabulation (reference: dolfinx_materials/utils.py:84-95 builds
``basix.ufl.quadrature_element`` spaces). Shape functions are written once as plain
jnp expressions on the reference cell; values AND gradients at quadrature points
come from ``jax.jacfwd`` — no hand-derived derivative tables to get wrong.

Canonical reference cells (own conventions, documented here):
- triangle: (0,0),(1,0),(0,1); quad: (0,0),(1,0),(1,1),(0,1)
- tetrahedron: (0,0,0),(1,0,0),(0,1,0),(0,0,1); hexahedron: unit cube, z-major
  vertex order (0,0,0),(1,0,0),(1,1,0),(0,1,0),(0,0,1),(1,0,1),(1,1,1),(0,1,1)
- P2 adds edge-midpoint nodes after vertices (edge lists below), quads add a
  center node (full Q2 tensor family).

Quadrature: Gauss-Legendre tensor products on quads/hexes; Duffy-collapsed
tensor rules on simplices (always-correct for any requested degree, at the cost
of a few extra points — a fine TPU tradeoff since Gauss points are the batch
axis, not a loop).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------- topology
EDGES = {
    "triangle": [(0, 1), (1, 2), (2, 0)],
    "quad": [(0, 1), (1, 2), (2, 3), (3, 0)],
    "tetrahedron": [(0, 1), (1, 2), (2, 0), (0, 3), (1, 3), (2, 3)],
    "hexahedron": [
        (0, 1), (1, 2), (2, 3), (3, 0),
        (4, 5), (5, 6), (6, 7), (7, 4),
        (0, 4), (1, 5), (2, 6), (3, 7),
    ],
}

CELL_DIM = {"interval": 1, "triangle": 2, "quad": 2, "tetrahedron": 3, "hexahedron": 3}
CELL_VERTS = {"interval": 2, "triangle": 3, "quad": 4, "tetrahedron": 4, "hexahedron": 8}

#: local facets (vertex tuples) per cell type — boundary integral support
FACETS = {
    "triangle": [(0, 1), (1, 2), (2, 0)],
    "quad": [(0, 1), (1, 2), (2, 3), (3, 0)],
    "tetrahedron": [(0, 1, 2), (0, 1, 3), (1, 2, 3), (0, 2, 3)],
    "hexahedron": [
        (0, 1, 2, 3), (4, 5, 6, 7), (0, 1, 5, 4),
        (1, 2, 6, 5), (2, 3, 7, 6), (3, 0, 4, 7),
    ],
}


# ------------------------------------------------------- shape functions
def _lag2(t):
    """1D quadratic Lagrange basis at nodes (0, 1/2, 1)."""
    return jnp.stack([(2 * t - 1) * (t - 1), 4 * t * (1 - t), t * (2 * t - 1)])


def _shape_functions(cell: str, degree: int):
    """Return ``N(xi) -> (nnodes,)`` and the node coordinates on the ref cell."""
    if cell == "interval":
        if degree == 1:
            nodes = np.array([[0.0], [1.0]])

            def N(xi):
                return jnp.stack([1 - xi[0], xi[0]])

        elif degree == 2:
            nodes = np.array([[0.0], [1.0], [0.5]])

            def N(xi):
                t = xi[0]
                return jnp.stack(
                    [(2 * t - 1) * (t - 1), t * (2 * t - 1), 4 * t * (1 - t)]
                )

        else:
            raise NotImplementedError(f"P{degree} on {cell}")
    elif cell == "triangle":
        if degree == 1:
            nodes = np.array([[0.0, 0], [1, 0], [0, 1]])

            def N(xi):
                x, y = xi
                return jnp.stack([1 - x - y, x, y])

        elif degree == 2:
            v = np.array([[0.0, 0], [1, 0], [0, 1]])
            mids = np.array([(v[a] + v[b]) / 2 for a, b in EDGES["triangle"]])
            nodes = np.vstack([v, mids])

            def N(xi):
                x, y = xi
                L = jnp.stack([1 - x - y, x, y])
                vertex = L * (2 * L - 1)
                edges = jnp.stack(
                    [4 * L[a] * L[b] for a, b in EDGES["triangle"]]
                )
                return jnp.concatenate([vertex, edges])

        else:
            raise NotImplementedError(f"P{degree} on {cell}")
    elif cell == "quad":
        if degree == 1:
            nodes = np.array([[0.0, 0], [1, 0], [1, 1], [0, 1]])

            def N(xi):
                x, y = xi
                return jnp.stack(
                    [(1 - x) * (1 - y), x * (1 - y), x * y, (1 - x) * y]
                )

        elif degree == 2:
            v = np.array([[0.0, 0], [1, 0], [1, 1], [0, 1]])
            mids = np.array([(v[a] + v[b]) / 2 for a, b in EDGES["quad"]])
            nodes = np.vstack([v, mids, [[0.5, 0.5]]])
            # (i,j) 1D-node indices per node, matching the order above
            ij = [(0, 0), (2, 0), (2, 2), (0, 2), (1, 0), (2, 1), (1, 2), (0, 1), (1, 1)]

            def N(xi):
                lx, ly = _lag2(xi[0]), _lag2(xi[1])
                return jnp.stack([lx[i] * ly[j] for i, j in ij])

        else:
            raise NotImplementedError(f"Q{degree} on {cell}")
    elif cell == "tetrahedron":
        if degree == 1:
            nodes = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])

            def N(xi):
                x, y, z = xi
                return jnp.stack([1 - x - y - z, x, y, z])

        elif degree == 2:
            v = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
            mids = np.array([(v[a] + v[b]) / 2 for a, b in EDGES["tetrahedron"]])
            nodes = np.vstack([v, mids])

            def N(xi):
                x, y, z = xi
                L = jnp.stack([1 - x - y - z, x, y, z])
                vertex = L * (2 * L - 1)
                edges = jnp.stack(
                    [4 * L[a] * L[b] for a, b in EDGES["tetrahedron"]]
                )
                return jnp.concatenate([vertex, edges])

        else:
            raise NotImplementedError(f"P{degree} on {cell}")
    elif cell == "hexahedron":
        verts = np.array(
            [
                [0.0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
            ]
        )
        if degree == 1:
            nodes = verts

            def N(xi):
                x, y, z = xi
                lx = jnp.stack([1 - x, x])
                ly = jnp.stack([1 - y, y])
                lz = jnp.stack([1 - z, z])
                ijk = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
                       (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)]
                return jnp.stack([lx[i] * ly[j] * lz[k] for i, j, k in ijk])

        elif degree == 2:
            mids = np.array([(verts[a] + verts[b]) / 2 for a, b in EDGES["hexahedron"]])
            # 27-node Q2: vertices, edge mids, face centers, body center
            faces = np.array(
                [
                    [0.5, 0.5, 0], [0.5, 0.5, 1],
                    [0.5, 0, 0.5], [0.5, 1, 0.5],
                    [0, 0.5, 0.5], [1, 0.5, 0.5],
                ]
            )
            nodes = np.vstack([verts, mids, faces, [[0.5, 0.5, 0.5]]])
            idx1d = {0.0: 0, 0.5: 1, 1.0: 2}
            ijk = [tuple(idx1d[c] for c in nd) for nd in nodes]
            # remap 1D index to lagrange order (0 -> node 0, 1 -> mid, 2 -> node 1)
            order = {0: 0, 1: 1, 2: 2}

            def N(xi):
                lx, ly, lz = _lag2(xi[0]), _lag2(xi[1]), _lag2(xi[2])
                lut = {0: 0, 1: 1, 2: 2}
                return jnp.stack(
                    [lx[lut[i]] * ly[lut[j]] * lz[lut[k]] for i, j, k in ijk]
                )

        else:
            raise NotImplementedError(f"Q{degree} on {cell}")
    else:
        raise NotImplementedError(cell)
    return N, nodes


# ------------------------------------------------------------ quadrature
def _gauss01(n):
    """n-point Gauss-Legendre on [0,1]."""
    x, w = np.polynomial.legendre.leggauss(n)
    return (x + 1) / 2, w / 2


def _tri_orbit3(a):
    """Barycentric (1-2a, a, a) orbit -> 3 reference-coordinate points."""
    return [(a, a), (1 - 2 * a, a), (a, 1 - 2 * a)]


def _tet_orbit4(a):
    """Barycentric (a, b, b, b), b=(1-a)/3 -> 4 points (x,y,z)=(l1,l2,l3)."""
    b = (1.0 - a) / 3.0
    return [(b, b, b), (a, b, b), (b, a, b), (b, b, a)]


def _tet_orbit6(a):
    """Barycentric (a, a, b, b) permutations, b=1/2-a -> 6 edge-type points."""
    b = 0.5 - a
    return [
        (a, b, b), (b, a, b), (b, b, a),
        (b, a, a), (a, b, a), (a, a, b),
    ]


def _symmetric_simplex_rule(cell: str, degree: int):
    """Minimal-point symmetric Gauss rules on simplices (positive weights),
    classic Dunavant (triangle) / Keast (tet) values; None -> caller falls
    back to the Duffy tensor rule. Cuts quadrature counts 2-3.4x vs Duffy
    (48 -> 14 points for the degree-4 rule P2 tets need — the reference
    protocol's discretization, reference demos/mfront/hyperelasticity).
    Exactness is verified numerically against closed-form monomial integrals
    in tests/test_fem.py::test_simplex_quadrature_exactness."""
    if cell == "triangle":  # weights sum to 1, scaled by area 1/2
        if degree <= 1:
            pts, wts = [(1 / 3, 1 / 3)], [1.0]
        elif degree == 2:
            pts, wts = _tri_orbit3(1 / 6), [1 / 3] * 3
        elif degree <= 4:  # Dunavant 6-point, degree 4
            pts = _tri_orbit3(0.091576213509771) + _tri_orbit3(
                0.445948490915965
            )
            wts = [0.109951743655322] * 3 + [0.223381589678011] * 3
        elif degree == 5:  # Dunavant 7-point
            pts = (
                [(1 / 3, 1 / 3)]
                + _tri_orbit3(0.101286507323456)
                + _tri_orbit3(0.470142064105115)
            )
            wts = (
                [0.225]
                + [0.125939180544827] * 3
                + [0.132394152788506] * 3
            )
        else:
            return None
        return np.array(pts), 0.5 * np.array(wts)
    if cell == "tetrahedron":  # weights sum to 1, scaled by volume 1/6
        if degree <= 1:
            pts, wts = [(0.25, 0.25, 0.25)], [1.0]
        elif degree == 2:  # 4-point, a = (5+3*sqrt(5))/20
            pts = _tet_orbit4((5.0 + 3.0 * np.sqrt(5.0)) / 20.0)
            wts = [0.25] * 4
        elif degree <= 5:  # Keast 14-point, degree 5
            pts = (
                _tet_orbit4(0.0673422422100983)
                + _tet_orbit4(0.7217942490673264)
                + _tet_orbit6(0.4544962958743506)
            )
            wts = (
                [0.1126879257180162] * 4
                + [0.0734930431163619] * 4
                + [0.0425460207770812] * 6
            )
        else:
            return None
        return np.array(pts), np.array(wts) / 6.0
    return None


def quadrature_rule(cell: str, degree: int):
    """Points (nq, dim) and weights (nq,) integrating polynomials of ``degree``
    exactly on the reference cell (tensor rules on quads/hexes; symmetric
    Dunavant/Keast rules on simplices, Duffy collapse beyond their range)."""
    if cell in ("triangle", "tetrahedron"):
        rule = _symmetric_simplex_rule(cell, degree)
        if rule is not None:
            return rule
    n1 = max(degree // 2 + 1, 1)
    x, w = _gauss01(n1)
    if cell == "interval":
        pts = x[:, None]
        wts = w
    elif cell == "quad":
        X, Y = np.meshgrid(x, x, indexing="ij")
        pts = np.stack([X.ravel(), Y.ravel()], axis=1)
        wts = np.outer(w, w).ravel()
    elif cell == "hexahedron":
        X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
        pts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)
        wts = np.einsum("i,j,k->ijk", w, w, w).ravel()
    elif cell == "triangle":
        # Duffy: (u, v) in square -> (u, v(1-u)), |J| = 1-u
        nu = max(degree // 2 + 1, 1) + 1  # extra point absorbs the collapse factor
        xu, wu = _gauss01(nu)
        U, V = np.meshgrid(xu, x, indexing="ij")
        WU, WV = np.meshgrid(wu, w, indexing="ij")
        pts = np.stack([U.ravel(), (V * (1 - U)).ravel()], axis=1)
        wts = (WU * WV * (1 - U)).ravel()
    elif cell == "tetrahedron":
        nu = max(degree // 2 + 1, 1) + 1
        xu, wu = _gauss01(nu)
        U, V, T = np.meshgrid(xu, xu, x, indexing="ij")
        WU, WV, WT = np.meshgrid(wu, wu, w, indexing="ij")
        # (u,v,t) -> (u, v(1-u), t(1-u)(1-v)) with |J| = (1-u)^2 (1-v)
        X = U
        Y = V * (1 - U)
        Z = T * (1 - U) * (1 - V)
        pts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)
        wts = (WU * WV * WT * (1 - U) ** 2 * (1 - V)).ravel()
    else:
        raise NotImplementedError(cell)
    return pts, wts


# ------------------------------------------------------------- tabulation
@dataclass
class ReferenceElement:
    """Tabulated Lagrange element: values and ref-gradients at quadrature points."""

    cell: str
    degree: int
    quad_degree: int

    def __post_init__(self):
        Nfun, nodes = _shape_functions(self.cell, self.degree)
        self.nodes = nodes  # (nnodes, dim) reference coordinates
        self.nnodes = len(nodes)
        self.dim = CELL_DIM[self.cell]
        pts, wts = quadrature_rule(self.cell, self.quad_degree)
        self.qpoints = pts  # (nq, dim)
        self.qweights = wts  # (nq,)
        self.nq = len(wts)
        # tabulate with AD (f64 on host at setup time)
        Nv = jax.vmap(Nfun)(jnp.asarray(pts))  # (nq, nnodes)
        dN = jax.vmap(jax.jacfwd(Nfun))(jnp.asarray(pts))  # (nq, nnodes, dim)
        self.N = np.asarray(Nv, dtype=np.float64)
        self.dN = np.asarray(dN, dtype=np.float64)
        self._Nfun = Nfun

    def tabulate(self, points):
        """Values at arbitrary reference points (for interpolation/eval)."""
        return np.asarray(jax.vmap(self._Nfun)(jnp.asarray(points)))
