"""Constitutive model library (the rebuild of the jaxmat/MFront behavior sets).

Every behavior is a plain-Python object exposing the protocol of
:class:`~dolfinx_materials_tpu.models.base.Behavior`; per-point updates are pure jnp
functions, batched by the :class:`~dolfinx_materials_tpu.material.Material` adapter.
"""

from .base import Behavior, SmallStrainBehavior, FiniteStrainBehavior  # noqa: F401
from .elasticity import (  # noqa: F401
    LinearElasticIsotropic,
    LinearElasticOrthotropic,
)
from .hardening import (  # noqa: F401
    LinearHardening,
    VoceHardening,
    SwiftHardening,
    RambergOsgoodHardening,
)
from .plasticity import (  # noqa: F401
    GeneralIsotropicHardening,
    hosford_norm,
    vonMisesIsotropicHardening,
)
from .hyperelasticity import (  # noqa: F401
    HyperelasticBehavior,
    NeoHooke,
    Ogden,
    SaintVenantKirchhoff,
)
from .finite_strain import FeFpJ2Plasticity, HenckyFiniteStrain  # noqa: F401
from .viscoplasticity import (  # noqa: F401
    GeneralizedStandardMaterial,
    NortonViscoplasticity,
)
from .viscoelasticity import (  # noqa: F401
    GeneralizedMaxwell,
    ZenerViscoelasticity,
)
from .thermal import (  # noqa: F401
    NonlinearHeatTransfer,
    PhaseChangeHeatTransfer,
    ThermoElasticIsotropic,
    ThermoMechanicalHeat,
)
from .nonlinear_elasticity import RambergOsgoodNonLinearElasticity  # noqa: F401
from .nn import NeuralBehavior  # noqa: F401
from .hypotheses import PlaneStress  # noqa: F401
from .conic import (  # noqa: F401
    HosfordPlasticity,
    L1RankinePlasticity,
    RankinePlasticity,
    l1_rankine_norm,
    rankine_norm,
)
from .conic_exact import (  # noqa: F401
    HosfordExact,
    L1RankineExact,
    PlaneStressVonMisesExact,
    RankineExact,
)
from .crystal import (  # noqa: F401
    MericCailletaudCrystalPlasticity,
    cubic_elasticity_C,
    fcc_interaction_matrix,
    fcc_slip_systems,
)
