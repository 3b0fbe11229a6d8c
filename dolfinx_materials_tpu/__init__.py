"""dolfinx_materials_tpu — a TPU-native constitutive-material + FEM framework.

A from-scratch rebuild of the capabilities of ``dolfinx_materials`` (reference:
bleyerj/dolfinx_materials v0.4.0) designed TPU-first:

- batched constitutive updates as ``jax.vmap``-ed / Pallas kernels over Gauss points
  (reference: dolfinx_materials/jaxmat.py:147-155 uses eqx.filter_jit(filter_vmap(jacfwd))),
- consistent tangents via implicit-function-theorem custom roots (never unrolled Newton),
- an HBM-resident SoA state manager with s0/s1 double-buffering
  (reference: dolfinx_materials/generic.py:204-295),
- a standalone TPU-native FEM layer (structured meshes, Lagrange elements, quadrature,
  einsum assembly, matrix-free Newton-Krylov) replacing the reference's DOLFINx/PETSc
  host stack (reference: dolfinx_materials/quadrature_map.py, solvers.py),
- multi-chip scaling via ``jax.sharding.Mesh`` + ``shard_map`` over the Gauss-point /
  element axis (replacing the reference's MPI domain decomposition).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("DXM_TPU_MATMUL_PRECISION", "highest") != "default":
    # TPU matmuls default to bf16 inputs; that is right for NN training but
    # WRONG for FEM tangent assembly: a ~1e-3-relative Jacobian is inconsistent
    # with the f32 residual and Newton stalls (observed on hardware: a linear
    # elastic solve reduced |R| by only 7% per iteration). Consistent-tangent
    # Newton is the core product here, so default every matmul/einsum to full
    # f32. NN surrogate layers that want bf16 MXU throughput pass an explicit
    # ``precision=`` at their call sites. Opt out with
    # DXM_TPU_MATMUL_PRECISION=default.
    import jax as _jax

    _jax.config.update(
        "jax_default_matmul_precision",
        _os.environ.get("DXM_TPU_MATMUL_PRECISION", "highest"),
    )


class PerformanceWarning(UserWarning):
    """Warns of a performance-degrading fallback path.

    Mirrors the reference's category (dolfinx_materials/__init__.py:12-15), raised e.g.
    when a Python-loop or interpret-mode path is taken instead of a compiled kernel.
    """


from .material import Material  # noqa: E402,F401
from .state import DataManager, MaterialStateManager  # noqa: E402,F401
from .quadrature_map import QuadratureMap  # noqa: E402,F401
from .solvers import (  # noqa: E402,F401
    BlockedNonlinearProblem,
    NonlinearMaterialProblem,
    solve_adaptive,
    solve_coupled,
)
from .calibration import fit_parameters, make_path_simulator  # noqa: E402,F401
