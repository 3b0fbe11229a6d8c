"""Composite-benchmark mesh generator: conformity, geometry, tagging.

Validates the analytic O-grid rebuild of the reference's gmsh geometry
(reference demos/mfront/hyperelasticity/hyperelasticity.py:55-119: unit cube,
eight corner spheres R=0.4, matrix tag 1 / inclusions tag 2)."""

import math

import numpy as np
import pytest

from dolfinx_materials_tpu.fem.composite_mesh import (
    create_inclusion_cube,
    hexes_to_tets_minvertex,
)


@pytest.fixture(scope="module")
def coarse():
    return create_inclusion_cube(2, 1, 3)


def test_conforming_positive_tagged(coarse):
    mesh, tags = coarse
    pts, tets = mesh.points, mesh.cells
    p = pts[tets]
    vol = (
        np.einsum(
            "ij,ij->i",
            np.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]),
            p[:, 3] - p[:, 0],
        )
        / 6
    )
    assert vol.min() > 0  # orientation fixed, no degenerate tets
    assert abs(vol.sum() - 1.0) < 1e-12  # tiles the unit cube exactly
    # conformity: every interior face shared by exactly 2 tets
    faces = np.sort(
        tets[:, [[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]]].reshape(-1, 3),
        axis=1,
    )
    _, cnt = np.unique(faces, axis=0, return_counts=True)
    assert set(cnt.tolist()) <= {1, 2}
    # boundary faces close the cube surface: area sums to 6
    assert set(np.unique(tags)) == {1, 2}
    # inclusion volume ~ 8 eighth-spheres (chordal deficit only)
    vsph = 4.0 / 3.0 * math.pi * 0.4**3
    vin = vol[tags == 2].sum()
    assert 0.9 * vsph < vin < vsph


def test_interface_nodes_exactly_on_spheres(coarse):
    mesh, tags = coarse
    pts, tets = mesh.points, mesh.cells
    n_in = np.unique(tets[tags == 2])
    n_mat = np.unique(tets[tags == 1])
    iface = np.intersect1d(n_in, n_mat)
    assert len(iface) > 100
    centers = np.array(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], float
    )
    d = np.min(
        np.linalg.norm(pts[iface][:, None, :] - centers[None], axis=2), axis=1
    )
    np.testing.assert_allclose(d, 0.4, atol=1e-12)


def test_element_counts_match_reference_meshes():
    """Coarse ~3,000 / fine ~6,700 elements (reference timing_results.csv)."""
    m_c, _ = create_inclusion_cube(2, 1, 3)
    m_f, _ = create_inclusion_cube(3, 1, 3)
    assert 2000 <= m_c.num_cells <= 3500
    assert 5500 <= m_f.num_cells <= 8000


def test_minvertex_coning_conforms_across_any_ids():
    """Two hexes sharing a face agree on the diagonal for adversarial global
    id assignments (the consistency argument is id-based, not geometric)."""
    rng = np.random.default_rng(0)
    pts = np.array(
        [
            [i, j, k]
            for i in (0, 1, 2)
            for j in (0, 1)
            for k in (0, 1)
        ],
        float,
    )

    def vid(i, j, k):
        return (i * 2 + j) * 2 + k

    hexes = np.array(
        [
            [vid(0, 0, 0), vid(1, 0, 0), vid(1, 1, 0), vid(0, 1, 0),
             vid(0, 0, 1), vid(1, 0, 1), vid(1, 1, 1), vid(0, 1, 1)],
            [vid(1, 0, 0), vid(2, 0, 0), vid(2, 1, 0), vid(1, 1, 0),
             vid(1, 0, 1), vid(2, 0, 1), vid(2, 1, 1), vid(1, 1, 1)],
        ]
    )
    for _ in range(20):
        perm = rng.permutation(len(pts))
        h = perm[hexes]
        p = pts[np.argsort(perm)]
        tets = hexes_to_tets_minvertex(p, h)
        faces = np.sort(
            tets[:, [[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]]].reshape(
                -1, 3
            ),
            axis=1,
        )
        _, cnt = np.unique(faces, axis=0, return_counts=True)
        assert set(cnt.tolist()) <= {1, 2}
