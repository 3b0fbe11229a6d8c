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
    def __init__(self, mesh: Mesh, degree: int = 1, shape: tuple = ()):
        self.mesh = mesh
        self.degree = degree
        self.shape = tuple(shape)
        self.ncomp = int(np.prod(self.shape)) if self.shape else 1

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
