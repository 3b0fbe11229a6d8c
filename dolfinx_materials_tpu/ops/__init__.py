"""Low-level tensor/convention kernels and batched local solvers (pure jnp + Pallas)."""

from . import tensors  # noqa: F401
from .newton import newton_solve, scalar_newton_solve  # noqa: F401
