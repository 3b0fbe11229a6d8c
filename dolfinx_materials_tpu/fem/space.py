"""Function spaces and Functions (dofmaps built host-side, data device-side).

Replaces ``dolfinx.fem.functionspace`` / ``fem.Function`` for the capability set the
reference exercises (vector/scalar Lagrange P1/P2 — tests/uniaxial_tension.py:13,
demos use ("P", order, shape)). Dof layout is blocked like DOLFINx:
``dof = node * ncomp + comp``.
"""

from __future__ import annotations

import numpy as np

from .element import _shape_functions
from .mesh import Mesh


class FunctionSpace:
    def __init__(
        self, mesh: Mesh, degree: int = 1, shape: tuple = (), renumber=True
    ):
        self.mesh = mesh
        self.degree = degree
        self.shape = tuple(shape)
        self.ncomp = int(np.prod(self.shape)) if self.shape else 1
        #: old node id -> new node id when the P2 node set was spatially
        #: renumbered (None = identity). Canonical-layout id arithmetic
        #: (vertices, then nv+edge, then face/center — facets.py) must map
        #: its results through this.
        self.node_renum = None

        cell = mesh.cell_type
        if degree == 1:
            self.node_coords = mesh.points
            self.cell_nodes = mesh.cells
        elif degree == 2:
            edge_verts, cell_edges = mesh.edges()
            self._edge_verts = edge_verts  # for facet-restricted dofs (facets.py)
            mid = mesh.points[edge_verts].mean(axis=1)
            parts = [mesh.points, mid]
            nv, ne = mesh.num_vertices, len(edge_verts)
            cn = [mesh.cells, nv + cell_edges]
            if cell == "quad":
                centers = mesh.points[mesh.cells].mean(axis=1)
                parts.append(centers)
                cn.append(nv + ne + np.arange(mesh.num_cells, dtype=np.int32)[:, None])
            elif cell == "hexahedron":
                # 27-node Q2: vertices, edge mids, face centers, body center.
                # element.py lists face-center nodes in [z0, z1, y0, y1, x0, x1]
                # order = FACETS indices [0, 1, 2, 4, 5, 3].
                face_verts, cell_faces = mesh.faces()
                self._face_verts = face_verts  # for facet-restricted dofs
                self._face_node_offset = nv + ne
                parts.append(mesh.points[face_verts].mean(axis=1))
                cn.append(nv + ne + cell_faces[:, [0, 1, 2, 4, 5, 3]])
                nf = len(face_verts)
                parts.append(mesh.points[mesh.cells].mean(axis=1))
                cn.append(
                    nv + ne + nf + np.arange(mesh.num_cells, dtype=np.int32)[:, None]
                )
            self.node_coords = np.vstack(parts)
            self.cell_nodes = np.hstack(cn).astype(np.int32)
            if mesh.geom_degree == 2:
                # isoparametric: degree-2 dof nodes sit at the CURVED geometry
                # nodes (same vertex/edge/face enumeration, fem/mesh.py:curve_mesh)
                assert mesh.geom_points.shape == self.node_coords.shape
                self.node_coords = mesh.geom_points
            if renumber:
                self._renumber_nodes()
        else:
            raise NotImplementedError(f"degree {degree}")

        # consistency with the reference element's local node ordering
        _, ref_nodes = _shape_functions(cell, degree)
        assert self.cell_nodes.shape[1] == len(ref_nodes)

        self.num_nodes = len(self.node_coords)
        self.num_dofs = self.num_nodes * self.ncomp
        # blocked dofmap (ncells, nloc*ncomp)
        nloc = self.cell_nodes.shape[1]
        dm = (
            self.cell_nodes[:, :, None] * self.ncomp
            + np.arange(self.ncomp)[None, None, :]
        )
        self.dofmap = dm.reshape(mesh.num_cells, nloc * self.ncomp).astype(np.int32)
        self.nloc = nloc

    def _renumber_nodes(self):
        """Renumber the P2 node set by interleaving edge/face/center nodes
        among the vertices they sit between. The canonical layout above
        appends them AFTER all vertices, so every element's dofs straddle
        distant id bands — which defeats the banded lane-gather engine's
        per-chunk windows (ops/banded_gather.py) and with it the unstructured
        fused-step fast path for P2 simplex meshes (the reference protocol's
        discretization). Sorting every node by the MEAN VERTEX ID it
        interpolates inherits whatever bandedness the vertex numbering
        already has (lattice order on built-in meshes, RCM/snake via
        fem/reorder.py on gmsh meshes) without introducing a new axis
        convention; kept only if it beats the canonical order on p99 element
        node span."""
        from .reorder import _elem_span_p99

        mesh = self.mesh
        cn = self.cell_nodes
        nn = len(self.node_coords)
        nv = mesh.num_vertices
        keys = [np.arange(nv, dtype=np.float64),
                self._edge_verts.mean(axis=1)]
        if mesh.cell_type == "quad":
            keys.append(mesh.cells.mean(axis=1))
        elif mesh.cell_type == "hexahedron":
            keys.append(self._face_verts.mean(axis=1))
            keys.append(mesh.cells.mean(axis=1))
        key = np.concatenate(keys)
        assert len(key) == nn
        perm = np.argsort(key, kind="stable")  # old ids in new order
        inv = np.empty(nn, np.int64)
        inv[perm] = np.arange(nn)
        if _elem_span_p99(inv[cn]) < _elem_span_p99(cn):
            self.node_coords = self.node_coords[perm]
            self.cell_nodes = inv[cn].astype(np.int32)
            self.node_renum = inv.astype(np.int32)

    def dof_coords(self):
        """Coordinates of every dof (repeated per component), (ndofs, dim)."""
        return np.repeat(self.node_coords, self.ncomp, axis=0)

    def component_dofs(self, comp: int):
        """All global dofs of one vector component (the reference's
        ``V.sub(i).collapse()`` pattern, tests/uniaxial_tension.py:26-30)."""
        return np.arange(self.num_nodes) * self.ncomp + comp


class Function:
    """A dof vector bound to a space. ``x`` is a numpy array (host mirror);
    solvers move it to device as needed."""

    def __init__(self, space: FunctionSpace, name: str | None = None):
        self.space = space
        self.name = name or "f"
        self.x = np.zeros(space.num_dofs)

    def interpolate(self, fn):
        """fn: coords (n, dim) -> values (n,) or (n, ncomp)."""
        vals = np.asarray(fn(self.space.node_coords))
        self.x = vals.reshape(self.space.num_dofs).astype(np.float64).copy()
        return self

    def copy(self):
        g = Function(self.space, self.name)
        g.x = self.x.copy()
        return g
