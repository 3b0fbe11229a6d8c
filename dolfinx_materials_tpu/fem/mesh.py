"""Meshes: a minimal static-shape mesh container + structured generators.

Replaces the reference's ``dolfinx.mesh`` (C++) for the test/demo corpus
(``create_unit_square(..., CellType.quadrilateral)`` in tests/uniaxial_tension.py:12,
boxes in the 3D demos). Unstructured gmsh import can layer on top later — the
container is just (points, cells).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .element import CELL_DIM, CELL_VERTS, EDGES, FACETS


@dataclass
class Mesh:
    points: np.ndarray  # (npoints, dim) float64 vertex coordinates
    cells: np.ndarray  # (ncells, nverts) int32 vertex indices
    cell_type: str
    #: isoparametric geometry: 1 = affine/multilinear from ``points`` (default);
    #: 2 = curved, with per-cell degree-2 geometry nodes in geom_points/geom_cells
    #: (set by :func:`curve_mesh`; consumed by assembly.QuadratureDomain)
    geom_degree: int = 1
    geom_points: np.ndarray | None = None
    geom_cells: np.ndarray | None = None
    #: structured-grid metadata (nx, ny[, nz]) set by the structured
    #: generators: node v = i*(ny+1)+j (2D) / (i*(ny+1)+j)*(nz+1)+k (3D),
    #: cell e = i*ny+j / (i*ny+j)*nz+k. Enables stencil (shifted-slice)
    #: gathers/assembly in QuadratureDomain — TPU scalar gathers are ~100x
    #: slower than slices. None for unstructured/gmsh meshes.
    grid: tuple | None = None

    def __post_init__(self):
        self.points = np.asarray(self.points, dtype=np.float64)
        self.cells = np.ascontiguousarray(self.cells, dtype=np.int32)
        assert self.cells.shape[1] == CELL_VERTS[self.cell_type]

    @property
    def dim(self):
        return CELL_DIM[self.cell_type]

    @property
    def num_cells(self):
        return len(self.cells)

    @property
    def num_vertices(self):
        return len(self.points)

    def edges(self):
        """Unique edges as sorted vertex pairs + per-cell edge indices.

        Host-side 'mesh compilation' (the dofmap-builder role of DOLFINx's C++
        topology core, SURVEY.md §2.2); dispatched to the fastmesh C++ engine
        when available, numpy fallback otherwise. Returns
        (edge_verts (nedges, 2), cell_edges (ncells, nle)).
        """
        le = np.array(EDGES[self.cell_type])  # (nle, 2)
        ev = self.cells[:, le]  # (ncells, nle, 2)
        from .. import native

        out = native.unique_edges(ev)
        if out is not None:
            return out
        ev_sorted = np.sort(ev, axis=2).reshape(-1, 2)
        edge_verts, inverse = np.unique(ev_sorted, axis=0, return_inverse=True)
        cell_edges = inverse.reshape(len(self.cells), len(le)).astype(np.int32)
        return edge_verts, cell_edges

    def faces(self):
        """Unique 2D faces as sorted vertex tuples + per-cell face indices in
        the ``element.FACETS`` local order. 3D cells only. Returns
        (face_verts (nfaces, nfv), cell_faces (ncells, nlf))."""
        lf = np.array(FACETS[self.cell_type])  # (nlf, nfv)
        fv = self.cells[:, lf]
        from .. import native

        out = native.unique_faces(fv)
        if out is not None:
            return out
        fv_sorted = np.sort(fv, axis=2).reshape(-1, lf.shape[1])
        face_verts, inverse = np.unique(fv_sorted, axis=0, return_inverse=True)
        cell_faces = inverse.reshape(len(self.cells), len(lf)).astype(np.int32)
        return face_verts, cell_faces

    def cell_centers(self):
        return self.points[self.cells].mean(axis=1)


def curve_mesh(mesh: Mesh, transform):
    """Attach degree-2 (isoparametric) geometry to ``mesh``.

    ``transform``: callable ``(n, dim) -> (n, dim)`` mapping the STRAIGHT node
    positions (vertices + P2 edge/face/center nodes of the multilinear cell) to
    their curved positions — the standard parametric-geometry pattern (e.g. a
    polar map turning a structured rectangle into an exactly-curved annulus).
    The reference gets curved cells from gmsh second-order elements via basix
    push-forward (dolfinx C++); here the geometry basis is the same AD-tabulated
    Q2/P2 element the function spaces use (fem/element.py).

    Vertices are ALSO moved through ``transform`` so topology/BC queries stay
    consistent with the curved shape.
    """
    from .space import FunctionSpace

    # renumber=False: geometry stays in the CANONICAL layout (vertices, then
    # nv+edge mids, ...) that facets.py's _facet_geom_nodes id arithmetic and
    # the degree-2 space adoption both assume
    V2 = FunctionSpace(mesh, degree=2, shape=(), renumber=False)
    curved = Mesh(
        points=np.asarray(transform(mesh.points)),
        cells=mesh.cells,
        cell_type=mesh.cell_type,
        geom_degree=2,
        geom_points=np.asarray(transform(V2.node_coords)),
        geom_cells=V2.cell_nodes,
        grid=mesh.grid,  # topology unchanged: stencil gathers stay valid
    )
    return curved


def create_rectangle(p0, p1, n, cell_type="quad"):
    """Structured rectangle mesh of ``n=(nx, ny)`` cells ('quad' or 'triangle').

    Generation runs in the fastmesh C++ engine when available (numpy fallback)."""
    nx, ny = n
    from .. import native

    out = native.structured_quad_mesh(nx, ny, p0, p1)
    if out is not None:
        points, quads = out
    else:
        x = np.linspace(p0[0], p1[0], nx + 1)
        y = np.linspace(p0[1], p1[1], ny + 1)
        X, Y = np.meshgrid(x, y, indexing="ij")
        points = np.stack([X.ravel(), Y.ravel()], axis=1)

        def vid(i, j):
            return i * (ny + 1) + j

        quads = []
        for i in range(nx):
            for j in range(ny):
                quads.append(
                    [vid(i, j), vid(i + 1, j), vid(i + 1, j + 1), vid(i, j + 1)]
                )
        quads = np.array(quads, dtype=np.int32)
    if cell_type == "quad":
        return Mesh(points, quads, "quad", grid=(nx, ny))
    if cell_type == "triangle":
        tris = np.concatenate([quads[:, [0, 1, 2]], quads[:, [0, 2, 3]]], axis=0)
        return Mesh(points, tris, "triangle")
    raise ValueError(cell_type)


def create_unit_square(nx, ny, cell_type="quad"):
    """Reference-equivalent of ``dolfinx.mesh.create_unit_square``
    (tests/uniaxial_tension.py:12)."""
    return create_rectangle((0.0, 0.0), (1.0, 1.0), (nx, ny), cell_type)


def create_box(p0, p1, n, cell_type="hexahedron"):
    """Structured box mesh of ``n=(nx, ny, nz)`` cells ('hexahedron' or
    'tetrahedron', 6 tets per hex)."""
    nx, ny, nz = n
    from .. import native

    out = native.structured_hex_mesh(nx, ny, nz, p0, p1)
    if out is not None:
        points, hexes = out
    else:
        x = np.linspace(p0[0], p1[0], nx + 1)
        y = np.linspace(p0[1], p1[1], ny + 1)
        z = np.linspace(p0[2], p1[2], nz + 1)
        X, Y, Z = np.meshgrid(x, y, z, indexing="ij")
        points = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)

        def vid(i, j, k):
            return (i * (ny + 1) + j) * (nz + 1) + k

        hexes = []
        for i in range(nx):
            for j in range(ny):
                for k in range(nz):
                    hexes.append(
                        [
                            vid(i, j, k), vid(i + 1, j, k),
                            vid(i + 1, j + 1, k), vid(i, j + 1, k),
                            vid(i, j, k + 1), vid(i + 1, j, k + 1),
                            vid(i + 1, j + 1, k + 1), vid(i, j + 1, k + 1),
                        ]
                    )
        hexes = np.array(hexes, dtype=np.int32)
    if cell_type == "hexahedron":
        return Mesh(points, hexes, "hexahedron", grid=(nx, ny, nz))
    if cell_type == "tetrahedron":
        # Kuhn triangulation: 6 tets per hex, conforming across faces
        h = hexes
        tets = np.concatenate(
            [
                h[:, [0, 1, 2, 6]], h[:, [0, 2, 3, 6]], h[:, [0, 3, 7, 6]],
                h[:, [0, 7, 4, 6]], h[:, [0, 4, 5, 6]], h[:, [0, 5, 1, 6]],
            ],
            axis=0,
        )
        return Mesh(points, tets.astype(np.int32), "tetrahedron")
    raise ValueError(cell_type)


def create_unit_cube(nx, ny, nz, cell_type="hexahedron"):
    return create_box((0, 0, 0), (1, 1, 1), (nx, ny, nz), cell_type)
