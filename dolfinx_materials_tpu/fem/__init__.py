"""Standalone TPU-native FEM layer.

Replaces the reference's external DOLFINx/Basix/FFCx/PETSc host stack (SURVEY.md
§2.2) with a jittable, shardable finite-element core: structured meshes, Lagrange
elements tabulated by AD, batched einsum assembly, and matrix-free operators.
Everything is static-shape and SPMD-friendly by construction.
"""

from .mesh import (  # noqa: F401
    Mesh,
    create_box,
    create_rectangle,
    create_unit_cube,
    create_unit_square,
    curve_mesh,
)
from .element import ReferenceElement, quadrature_rule  # noqa: F401
from .space import Function, FunctionSpace  # noqa: F401
from .bc import DirichletBC, locate_dofs_geometrical  # noqa: F401
from .facets import (  # noqa: F401
    assemble_body_force,
    assemble_traction,
    boundary_facets,
)
from .gmsh_io import read_msh  # noqa: F401
from .reorder import reorder_mesh  # noqa: F401
from .io import (  # noqa: F401
    TimeSeriesWriter,
    XDMFWriter,
    read_vtu,
    read_xdmf,
    write_vtk,
    write_vtu,
    write_xdmf,
)
from .submesh import (  # noqa: F401
    InterfaceDomain,
    InterfaceTerm,
    elastic_interface,
    extract_submesh,
    interface_facets,
)
