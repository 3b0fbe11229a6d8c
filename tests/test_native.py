"""fastmesh C++ engine vs the numpy fallbacks: identical meshes and equivalent
edge topology (numbering may differ; the induced topology must not)."""

import numpy as np

from dolfinx_materials_tpu import native
from dolfinx_materials_tpu.fem import create_rectangle, create_box
from dolfinx_materials_tpu.fem.element import EDGES


def test_native_builds():
    assert native._load() is not None, "C++ toolchain expected in this environment"


def test_quad_mesh_matches_fallback():
    out = native.structured_quad_mesh(7, 5, (0.0, 0.0), (2.0, 1.0))
    assert out is not None
    points, cells = out
    # numpy fallback (forced)
    x = np.linspace(0, 2.0, 8)
    y = np.linspace(0, 1.0, 6)
    X, Y = np.meshgrid(x, y, indexing="ij")
    pts_ref = np.stack([X.ravel(), Y.ravel()], axis=1)
    np.testing.assert_allclose(points, pts_ref, atol=1e-15)
    assert cells.shape == (35, 4)
    # CCW orientation: positive areas
    p = points[cells]
    area = 0.5 * np.abs(
        (p[:, 1, 0] - p[:, 0, 0]) * (p[:, 3, 1] - p[:, 0, 1])
        - (p[:, 3, 0] - p[:, 0, 0]) * (p[:, 1, 1] - p[:, 0, 1])
    ) * 2
    np.testing.assert_allclose(area, (2.0 / 7) * (1.0 / 5), rtol=1e-12)


def test_hex_mesh_valid():
    out = native.structured_hex_mesh(3, 2, 2, (0, 0, 0), (1, 1, 1))
    assert out is not None
    points, cells = out
    assert points.shape == (4 * 3 * 3, 3)
    assert cells.shape == (12, 8)
    assert cells.min() >= 0 and cells.max() < len(points)


def test_unique_edges_equivalent_topology():
    mesh = create_rectangle((0, 0), (1, 1), (4, 3), "quad")
    le = np.array(EDGES["quad"])
    ev = mesh.cells[:, le]
    out = native.unique_edges(ev)
    assert out is not None
    edge_verts, cell_edges = out
    # fallback
    ev_sorted = np.sort(ev, axis=2).reshape(-1, 2)
    ref_edges, inverse = np.unique(ev_sorted, axis=0, return_inverse=True)
    assert len(edge_verts) == len(ref_edges)
    # same SET of edges
    a = {tuple(e) for e in edge_verts.tolist()}
    b = {tuple(e) for e in ref_edges.tolist()}
    assert a == b
    # cell_edges indexes the same vertex pairs as the fallback
    np.testing.assert_array_equal(
        np.sort(edge_verts[cell_edges], axis=-1).reshape(-1, 2), ev_sorted
    )


def test_unique_faces_matches_numpy():
    from dolfinx_materials_tpu import native
    from dolfinx_materials_tpu.fem import create_box
    from dolfinx_materials_tpu.fem.element import FACETS

    mesh = create_box((0, 0, 0), (1, 1, 1), (3, 2, 2), "hexahedron")
    lf = np.array(FACETS["hexahedron"])
    fv = mesh.cells[:, lf]
    out = native.unique_faces(fv)
    if out is None:
        import pytest

        pytest.skip("native engine unavailable")
    face_verts, cell_faces = out
    # numpy reference (different face NUMBERING is fine; the per-cell sorted
    # tuples must agree)
    fv_sorted = np.sort(fv, axis=2)
    np.testing.assert_array_equal(face_verts[cell_faces], fv_sorted)
    # unique + complete
    assert len(np.unique(face_verts, axis=0)) == len(face_verts)
    nf_expected = len(np.unique(fv_sorted.reshape(-1, 4), axis=0))
    assert len(face_verts) == nf_expected
