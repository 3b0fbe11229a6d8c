"""Write-your-own-behavior worked example: Zener (standard linear solid)
viscoelasticity, authored entirely in user code.

The reference framework's extension point is an MFront DSL file compiled to a
shared library and loaded through MFrontMaterial (reference:
dolfinx_materials/mfront.py:41-343). Here the same user journey is a plain
Python class against the ``Behavior`` protocol — no DSL, no compiler, no
bindings — and the framework derives batching, consistent tangents, and the
fused/sharded solver compatibility from the one per-point update method.
Tutorial: docs/custom_behaviors.md. Golden test:
tests/test_custom_behavior_example.py.

The experiment is a stress-relaxation test: a homogeneous strain step
``eps_xx = exx`` is imposed through affine Dirichlet BCs on the whole
boundary and then held while time advances. Because the strain field is
exactly constant, the discrete solution has the closed form

    sigma_xx(t) = kappa*exx + (4/3)*mu_inf*exx + (4/3)*mu1*exx*exp(-t/tau)

which the demo checks against and writes out as a CSV relaxation curve.

Run: python demos/custom_behavior.py [N]
"""

import sys

import numpy as np

sys.path.insert(0, ".")
import jax

# f64 host demo: force CPU (the axon TPU plugin overrides JAX_PLATFORMS env);
# device throughput is bench.py's job
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from dolfinx_materials_tpu import Material, NonlinearMaterialProblem, QuadratureMap
from dolfinx_materials_tpu.fem import (
    DirichletBC,
    Function,
    FunctionSpace,
    create_unit_square,
    locate_dofs_geometrical,
)
from dolfinx_materials_tpu.fem.forms import mandel_strain_2d
from dolfinx_materials_tpu.models.base import SmallStrainBehavior
from dolfinx_materials_tpu.ops.tensors import I2, dev, tr


# ---------------------------------------------------------------------------
# the user-authored behavior — everything below this line is "your code"
# ---------------------------------------------------------------------------
class ZenerViscoelasticity(SmallStrainBehavior):
    """Standard linear solid: long-term spring (kappa, mu_inf) in parallel
    with a Maxwell branch (mu1, relaxation time tau).

    sigma = kappa*tr(eps)*I + 2*mu_inf*dev(eps) + 2*mu1*(dev(eps) - epsv)

    The viscous deviatoric strain ``epsv`` follows d(epsv)/dt =
    (dev(eps) - epsv)/tau, integrated with the exact exponential update for
    strain held constant over the step (dt=0 is a fixed point: no flow).
    """

    def __init__(self, kappa, mu_inf, mu1, tau):
        self.kappa, self.mu_inf, self.mu1, self.tau = kappa, mu_inf, mu1, tau

    def init_state(self):
        return {"epsv": jnp.zeros(6)}

    def small_strain_update(self, eps, state, dt):
        e = dev(eps)
        a = jnp.exp(-dt / self.tau)
        epsv = e + (state["epsv"] - e) * a
        sig = (
            self.kappa * tr(eps) * I2
            + 2 * self.mu_inf * e
            + 2 * self.mu1 * (e - epsv)
        )
        return sig, {"epsv": epsv}


def relaxation_modulus_xx(t, kappa, mu_inf, mu1, tau):
    """Closed-form sigma_xx/exx for the held uniaxial-strain state."""
    return kappa + (4.0 / 3.0) * (mu_inf + mu1 * np.exp(-t / tau))


def main(N=8, n_hold=40, write_outputs=True):
    kappa, mu_inf, mu1, tau = 1.0e3, 300.0, 700.0, 0.5
    exx = 1e-3

    material = Material(ZenerViscoelasticity(kappa, mu_inf, mu1, tau))

    mesh = create_unit_square(N, N, "quad")
    V = FunctionSpace(mesh, degree=1, shape=(2,))
    qmap = QuadratureMap(V, 2, material)
    qmap.register_gradient("Strain", mandel_strain_2d())

    # affine Dirichlet on the WHOLE boundary: u_x = exx * x, u_y = 0 ->
    # homogeneous strain [exx, 0, 0, 0, 0, 0] everywhere, for all time
    on_boundary = lambda x: (
        np.isclose(x[:, 0], 0.0)
        | np.isclose(x[:, 0], 1.0)
        | np.isclose(x[:, 1], 0.0)
        | np.isclose(x[:, 1], 1.0)
    )
    bx = locate_dofs_geometrical(V, on_boundary, component=0)
    by = locate_dofs_geometrical(V, on_boundary, component=1)
    x_of_bx = V.node_coords[bx // V.ncomp, 0]
    bc_x = DirichletBC(bx, exx * x_of_bx)
    bcs = [bc_x, DirichletBC(by, 0.0)]

    u = Function(V, name="u")
    problem = NonlinearMaterialProblem(
        qmap, u, bcs=bcs, options={"ksp_type": "lu", "atol": 1e-12, "rtol": 1e-12}
    )

    # instantaneous step (dt=0: the Maxwell branch is fully glassy)
    qmap.dt = 0.0
    converged, _ = problem.solve()
    assert converged
    qmap.advance()

    dt = tau / 8.0
    ts = [0.0]
    sig_xx = [float(np.asarray(qmap.material.data_manager.s0["Stress"])[0, 0])]

    qmap.dt = dt
    for k in range(n_hold):
        converged, _ = problem.solve()
        assert converged, f"hold step {k} failed"
        qmap.advance()
        ts.append((k + 1) * dt)
        sig_xx.append(float(np.asarray(qmap.material.data_manager.s0["Stress"])[0, 0]))

    ts = np.asarray(ts)
    sig_xx = np.asarray(sig_xx)
    analytic = exx * relaxation_modulus_xx(ts, kappa, mu_inf, mu1, tau)
    rel_err = float(np.max(np.abs(sig_xx - analytic) / np.abs(analytic)))

    print(f"relaxation steps: {n_hold}, dt = tau/8")
    print(f"sigma_xx(0)   = {sig_xx[0]:.6e}  (analytic {analytic[0]:.6e})")
    print(f"sigma_xx(end) = {sig_xx[-1]:.6e}  (analytic {analytic[-1]:.6e})")
    print(f"max rel error vs closed form: {rel_err:.3e}")

    if write_outputs:
        np.savetxt(
            "zener_relaxation.csv",
            np.column_stack([ts, sig_xx, analytic]),
            delimiter=",",
            header="t,sigma_xx,analytic",
            comments="",
        )
        print("wrote zener_relaxation.csv")

    return ts, sig_xx, analytic, rel_err


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
