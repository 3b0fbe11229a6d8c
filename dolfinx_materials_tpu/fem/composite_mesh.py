"""Analytic conforming tet mesh for the reference's composite benchmark.

The reference's ONLY committed timing study solves a unit cube of Ogden
matrix containing eight quasi-rigid SVK spherical inclusions of radius
R = 0.4 centered at the cube corners (reference
demos/mfront/hyperelasticity/hyperelasticity.py:55-119: gmsh occ spheres
intersected with the box, matrix tag 1 / inclusion tag 2, P1 tet geometry).
gmsh is not available in this environment, so this module builds the same
geometry ANALYTICALLY as a structured multi-block O-grid ("cubed sphere"):

- each cube octant holds one corner eighth-sphere. Inside the octant the
  eighth-ball is an inner cube ``[0, b]^3`` plus three shell blocks blending
  the inner-cube far faces radially onto the exact sphere surface; the
  matrix is three more blocks blending the sphere surface radially onto the
  octant's outer boundary. All blend segments are radial rays from the
  sphere center, so blocks tile the octant exactly and interface nodes lie
  EXACTLY on the sphere (the gmsh mesh only approximates it at hsize=0.1);
- the template octant is reflected to the 8 cube corners; reflected copies
  produce bitwise-identical coordinates on shared faces, so gluing is an
  exact-coordinate dedup;
- hexes are split into tets by CONING from each hex's minimum-global-id
  vertex over the face triangulations induced by the min-vertex-diagonal
  rule (every face's diagonal passes through its smallest global vertex id).
  Adjacent hexes therefore agree on the shared-face diagonal regardless of
  reflections or block seams — the classical consistent-subdivision
  criterion (Dompierre et al. 1999), realized here by star-coning, which
  needs no case tables.

The result is a conforming tagged tetrahedral mesh of the reference
benchmark geometry with an exactly-spherical interface, at element counts
matched to the reference's "coarse" (~3,000) and "fine" (~6,700) meshes.
"""

from __future__ import annotations

import numpy as np

from .mesh import Mesh

#: hex faces in the VTK/create_box local numbering (bottom 0123, top 4567)
_HEX_FACES = (
    (0, 1, 2, 3),
    (4, 5, 6, 7),
    (0, 1, 5, 4),
    (1, 2, 6, 5),
    (2, 3, 7, 6),
    (3, 0, 4, 7),
)


def _octant_blocks(R, h, n0, n1, n2, b_frac=0.5, grade=1.0):
    """Hex blocks of ONE octant ``[0, h]^3`` with an eighth-sphere of radius
    ``R`` at the origin. Returns ``(points (np, 3), hexes (ne, 8),
    tags (ne,))`` with tag 2 = inclusion, 1 = matrix. ``n0`` = inner-cube
    cells per axis, ``n1`` = shell layers (inner cube -> sphere), ``n2`` =
    matrix layers (sphere -> box). ``grade`` > 1 refines matrix layers
    toward the sphere interface (geometric spacing)."""
    if not (0.0 < R < h):
        raise ValueError(f"need 0 < R < {h}, got R={R}")
    b = b_frac * R  # inner cube half-side; corner radius b*sqrt(3) < R
    pts_blocks, hex_blocks, tag_blocks = [], [], []

    def add_block(P, tag):
        """P: (m0, m1, m2, 3) lattice -> hexes in VTK order."""
        m0, m1, m2 = P.shape[:3]
        base = sum(p.shape[0] for p in pts_blocks) if pts_blocks else 0
        pts_blocks.append(P.reshape(-1, 3))

        def vid(i, j, k):
            return base + (i * m1 + j) * m2 + k

        I, J, K = np.meshgrid(
            np.arange(m0 - 1), np.arange(m1 - 1), np.arange(m2 - 1),
            indexing="ij",
        )
        I, J, K = I.ravel(), J.ravel(), K.ravel()
        hx = np.stack(
            [
                vid(I, J, K), vid(I + 1, J, K),
                vid(I + 1, J + 1, K), vid(I, J + 1, K),
                vid(I, J, K + 1), vid(I + 1, J, K + 1),
                vid(I + 1, J + 1, K + 1), vid(I, J + 1, K + 1),
            ],
            axis=1,
        )
        hex_blocks.append(hx)
        tag_blocks.append(np.full(len(hx), tag, np.int32))

    # --- inclusion: inner cube [0, b]^3 ---------------------------------
    s = np.linspace(0.0, b, n0 + 1)
    X, Y, Z = np.meshgrid(s, s, s, indexing="ij")
    add_block(np.stack([X, Y, Z], axis=-1), 2)

    # face lattices of the inner cube's three far faces; ``axd`` is the
    # face's normal axis. q runs over the face; every further block is a
    # radial blend along rays from the origin through q, so blocks sharing
    # an edge of q-space share nodes bitwise.
    uu, vv = np.meshgrid(s, s, indexing="ij")

    def face_q(axd):
        q = np.empty(uu.shape + (3,))
        q[..., axd] = b
        q[..., (axd + 1) % 3] = uu
        q[..., (axd + 2) % 3] = vv
        return q

    for axd in range(3):
        q = face_q(axd)  # (n0+1, n0+1, 3)
        qn = np.linalg.norm(q, axis=-1, keepdims=True)
        d = q / qn  # unit ray directions
        sph = R * d  # exact sphere surface points
        # shell: inner-cube face -> sphere (inclusion, tag 2)
        w = np.linspace(0.0, 1.0, n1 + 1)[:, None, None, None]
        shell = (1.0 - w) * q[None] + w * sph[None]
        add_block(np.moveaxis(shell, 0, 2), 2)  # layers as axis 2
        # matrix: sphere -> octant box exit along the same rays (tag 1)
        t_exit = h / np.max(d, axis=-1, keepdims=True)
        box = t_exit * d
        w2 = np.linspace(0.0, 1.0, n2 + 1)
        if grade != 1.0:
            # geometric grading: first layer at the interface thinnest
            g = grade ** np.arange(n2)
            w2 = np.concatenate([[0.0], np.cumsum(g)]) / g.sum()
        w2 = w2[:, None, None, None]
        mat = (1.0 - w2) * sph[None] + w2 * box[None]
        add_block(np.moveaxis(mat, 0, 2), 1)

    return (
        np.concatenate(pts_blocks),
        np.concatenate(hex_blocks).astype(np.int64),
        np.concatenate(tag_blocks),
    )


def _dedup(points, cells, decimals=9):
    """Merge coincident nodes (reflection/block seams are bitwise equal;
    rounding only guards float noise)."""
    key = np.round(points, decimals)
    _, first, inv = np.unique(
        key, axis=0, return_index=True, return_inverse=True
    )
    return points[first], inv[cells]


def hexes_to_tets_minvertex(points, hexes):
    """Consistent hex->tet split: cone from each hex's min-global-id vertex
    over the min-vertex-diagonal face triangulations. 6 tets per hex;
    orientation fixed to positive volume. Vectorized over hexes."""
    ne = len(hexes)
    m_loc = np.argmin(hexes, axis=1)  # local index of hex-min vertex
    m_glob = hexes[np.arange(ne), m_loc]
    tets = []
    for f in _HEX_FACES:
        g = hexes[:, f]  # (ne, 4)
        k = np.argmin(g, axis=1)  # diagonal through face-min vertex
        idx = (k[:, None] + np.arange(4)[None, :]) % 4
        gr = np.take_along_axis(g, idx, axis=1)  # rotated: min first
        for tri in ((0, 1, 2), (0, 2, 3)):
            t = np.column_stack([m_glob, gr[:, tri[0]], gr[:, tri[1]], gr[:, tri[2]]])
            keep = (
                (t[:, 1] != m_glob) & (t[:, 2] != m_glob) & (t[:, 3] != m_glob)
            )
            tets.append((t[keep], keep))
    # interleave back into per-hex order so tags map contiguously
    out = np.empty((ne, 6, 4), np.int64)
    fill = np.zeros(ne, np.int64)
    for t, keep in tets:
        rows = np.nonzero(keep)[0]
        out[rows, fill[rows]] = t
        fill[rows] += 1
    if not (fill == 6).all():
        raise RuntimeError("min-vertex coning did not yield 6 tets per hex")
    tets = out.reshape(-1, 4)
    # fix orientation (reflected octants have negative-orientation hexes)
    p = points[tets]
    vol6 = np.einsum(
        "ij,ij->i",
        np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]),
        p[:, 3] - p[:, 0],
    )
    neg = vol6 < 0
    tets[neg, 2], tets[neg, 3] = tets[neg, 3].copy(), tets[neg, 2].copy()
    if np.any(vol6 == 0):
        raise RuntimeError("degenerate tet produced by coning")
    return tets


def create_inclusion_cube(
    n0=2, n1=1, n2=3, R=0.4, L=1.0, b_frac=0.5, grade=1.0
):
    """Conforming tagged tet mesh of the unit cube with eight corner
    eighth-sphere inclusions — the reference composite benchmark geometry
    (demos/mfront/hyperelasticity/hyperelasticity.py:55-119).

    Returns ``(mesh, cell_tags)`` with ``cell_tags[e]`` 1 = matrix (Ogden),
    2 = inclusion (SVK) per the reference's physical groups. Default
    ``(n0, n1, n2) = (2, 1, 3)`` gives ~2,700 tets ~ the reference "coarse"
    mesh; ``(3, 1, 3)`` ~6,500 ~ "fine"."""
    h = L / 2.0
    pts_t, hex_t, tag_t = _octant_blocks(R, h, n0, n1, n2, b_frac, grade)
    all_pts, all_hex, all_tags = [], [], []
    base = 0
    for cx in (0, 1):
        for cy in (0, 1):
            for cz in (0, 1):
                c = np.array([cx, cy, cz], float) * L
                sgn = 1.0 - 2.0 * np.array([cx, cy, cz], float)
                all_pts.append(c + sgn * pts_t)
                all_hex.append(hex_t + base)
                all_tags.append(tag_t)
                base += len(pts_t)
    points = np.concatenate(all_pts)
    hexes = np.concatenate(all_hex)
    tags = np.concatenate(all_tags)
    points, hexes = _dedup(points, hexes)
    tets = hexes_to_tets_minvertex(points, hexes)
    cell_tags = np.repeat(tags, 6)
    mesh = Mesh(points, tets.astype(np.int32), "tetrahedron")
    return mesh, cell_tags
