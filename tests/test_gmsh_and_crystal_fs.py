"""gmsh reader round-trip + finite-strain crystal plasticity composition
(the reference's FCCMericCailletaudFiniteStrain... behavior as
HenckyFiniteStrain(crystal))."""

import jax.numpy as jnp
import numpy as np

from dolfinx_materials_tpu import Material
from dolfinx_materials_tpu.fem.assembly import QuadratureDomain, assemble_scalar
from dolfinx_materials_tpu.fem.gmsh_io import read_msh
from dolfinx_materials_tpu.fem.space import FunctionSpace
from dolfinx_materials_tpu.models import (
    HenckyFiniteStrain,
    MericCailletaudCrystalPlasticity,
)
from dolfinx_materials_tpu.ops import tensors as tn
import pytest

MSH_V2 = """$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
5
1 0 0 0
2 1 0 0
3 1 1 0
4 0 1 0
5 0.5 0.5 0
$EndNodes
$Elements
8
1 1 2 10 1 1 2
2 1 2 20 1 2 3
3 1 2 10 1 3 4
4 1 2 10 1 4 1
5 2 2 1 1 1 2 5
6 2 2 1 1 2 3 5
7 2 2 1 1 3 4 5
8 2 2 1 1 4 1 5
$EndElements
"""


def test_read_msh_v2(tmp_path):
    path = tmp_path / "square.msh"
    path.write_text(MSH_V2)
    mesh, cell_tags, facet_groups = read_msh(path)
    assert mesh.cell_type == "triangle"
    assert mesh.num_cells == 4
    assert mesh.num_vertices == 5
    np.testing.assert_array_equal(cell_tags, [1, 1, 1, 1])
    assert set(facet_groups) == {10, 20}
    assert len(facet_groups[10]) == 3
    # geometry is consistent: total area = 1
    V = FunctionSpace(mesh, 1, ())
    dom = QuadratureDomain(V, 2)
    np.testing.assert_allclose(float(assemble_scalar(dom, 1.0)), 1.0, rtol=1e-12)


@pytest.mark.slow
def test_finite_strain_crystal_composition():
    """HenckyFiniteStrain(MericCailletaud) = the reference's finite-strain FCC
    crystal behavior (FCCMericCailletaudFiniteStrainSingleCrystal...mfront):
    F in, PK1 out, slip-system state evolves, small-strain consistency holds."""
    crystal = MericCailletaudCrystalPlasticity()
    fs = Material(HenckyFiniteStrain(crystal))
    ss = Material(MericCailletaudCrystalPlasticity())

    n = 4
    fs.set_data_manager(n)
    ss.set_data_manager(n)
    gam = 4e-3  # simple shear beyond the slip threshold
    F = jnp.broadcast_to(jnp.asarray(tn.I9), (n, 9)).copy()
    F = F.at[:, 3].set(gam)  # F12 = gam
    P, isv_fs, Ct = fs.integrate(F, dt=0.1)
    assert np.isfinite(np.asarray(P)).all()
    p_fs = np.asarray(fs.data_manager.s1["p"])
    assert p_fs.max() > 1e-6, "slip must activate"

    eps = jnp.zeros((n, 6)).at[:, 3].set(gam / np.sqrt(2))  # Mandel small-strain
    sig, _, _ = ss.integrate(eps, dt=0.1)
    # small-strain consistency of the Kirchhoff/PK1 stress at small shear
    np.testing.assert_allclose(
        np.asarray(P)[:, 3], np.asarray(sig)[:, 3] / np.sqrt(2), rtol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(fs.data_manager.s1["p"]),
        np.asarray(ss.data_manager.s1["p"]),
        rtol=5e-2,
        atol=1e-9,
    )


def test_read_msh_reorder_remaps_tags(tmp_path):
    """read_msh(reorder=True) renumbers vertices/cells for the banded fast
    path and remaps cell_tags + facet_groups consistently: every tagged facet
    still addresses the same physical coordinates."""
    path = tmp_path / "square.msh"
    path.write_text(MSH_V2.replace("2 2 1 1 1 2 5", "2 2 7 1 1 2 5"))
    m0, tags0, fg0 = read_msh(path)
    m1, tags1, fg1 = read_msh(path, reorder=True)
    assert m1.num_cells == m0.num_cells and m1.num_vertices == m0.num_vertices
    # cell tag multiset preserved; the tag-7 cell still covers the same region
    assert sorted(tags1.tolist()) == sorted(tags0.tolist())
    ct0 = m0.points[m0.cells[np.asarray(tags0) == 7]].mean(axis=(0, 1))
    ct1 = m1.points[m1.cells[np.asarray(tags1) == 7]].mean(axis=(0, 1))
    np.testing.assert_allclose(ct1, ct0, atol=1e-14)
    # facet groups: same physical segments (compare coordinate sets)
    for tag in fg0:
        c0 = np.sort(m0.points[fg0[tag]].reshape(-1, 2), axis=0)
        c1 = np.sort(m1.points[fg1[tag]].reshape(-1, 2), axis=0)
        np.testing.assert_allclose(c1, c0, atol=1e-14)
    # total area preserved
    V = FunctionSpace(m1, 1, ())
    dom = QuadratureDomain(V, 2)
    np.testing.assert_allclose(float(assemble_scalar(dom, 1.0)), 1.0, rtol=1e-12)
