"""Multi-chip scaling: device meshes + shard_map over the Gauss-point/cell axis.

Replaces the reference's MPI domain decomposition (SURVEY.md §5: each rank owns its
cells' Gauss points, ghost updates via PETSc — reference solvers.py:66,88-96).
Here: cells/points are sharded over a ``jax.sharding.Mesh``; the constitutive layer
is embarrassingly parallel (zero collectives, like the reference's rank-local
QuadratureMaps), and assembly reduces shared-dof contributions with one ``psum``
over ICI instead of ghost scatters.
"""

from .sharding import (  # noqa: F401
    device_mesh,
    make_sharded_constitutive_update,
    make_sharded_newton_step,
    make_sharded_blocked_step,
    make_sharded_newton_step_general,
    pad_to_multiple,
)
