"""Differentiable material parameters (VERDICT r1 item 10): calibrate Voce
hardening (sig0, sigu, b) to a synthetic stress-strain curve by Adam, gradients
flowing through the IFT radial-return solves."""

import jax
import jax.numpy as jnp
import numpy as np

from dolfinx_materials_tpu.calibration import fit_parameters, make_path_simulator
from dolfinx_materials_tpu.models import (
    LinearElasticIsotropic,
    VoceHardening,
    vonMisesIsotropicHardening,
)

E, nu = 70e3, 0.3
TRUE = dict(sig0=350.0, sigu=500.0, b=1e3)


def factory_from_multipliers(theta):
    """log-multiplier parameterization: O(1) Adam variables across scales."""
    sig0 = TRUE["sig0"] * jnp.exp(theta["ls0"])
    sigu = TRUE["sigu"] * jnp.exp(theta["lsu"])
    b = TRUE["b"] * jnp.exp(theta["lb"])
    return vonMisesIsotropicHardening(
        LinearElasticIsotropic(E, nu), VoceHardening(sig0, sigu, b)
    )


def strain_path(nsteps=40, emax=4 * 350.0 / 70e3):
    """Uniaxial Mandel strain ramp (deep into the hardening curve)."""
    e = np.linspace(0, emax, nsteps + 1)[1:]
    path = np.zeros((nsteps, 6))
    path[:, 0] = e
    return jnp.asarray(path)


def test_parameter_gradients_flow_through_ift():
    theta = {"ls0": jnp.asarray(0.0), "lsu": jnp.asarray(0.0), "lb": jnp.asarray(0.0)}
    sim = make_path_simulator(factory_from_multipliers, theta)
    path = strain_path(10)

    def loss(th):
        return jnp.sum(sim(th, path) ** 2)

    g = jax.grad(loss)(theta)
    for k in ("ls0", "lsu", "lb"):
        assert np.isfinite(float(g[k]))
        assert abs(float(g[k])) > 0.0, f"zero gradient for {k}"

    # finite-difference check of one sensitivity (IFT exactness)
    h = 1e-5
    th_p = dict(theta, ls0=jnp.asarray(h))
    th_m = dict(theta, ls0=jnp.asarray(-h))
    fd = (float(loss(th_p)) - float(loss(th_m))) / (2 * h)
    np.testing.assert_allclose(float(g["ls0"]), fd, rtol=1e-5)


def test_voce_calibration_recovers_parameters():
    path = strain_path()
    # target data from the TRUE parameters
    theta_true = {"ls0": jnp.zeros(()), "lsu": jnp.zeros(()), "lb": jnp.zeros(())}
    sim = make_path_simulator(factory_from_multipliers, theta_true)
    target = sim(theta_true, path)

    # perturbed start: sig0 x0.8, sigu x1.25, b x0.6 — on the PLASTIC side
    # (initializing the yield stress above the whole path puts the model in the
    # elastic dead zone where yield parameters have exactly zero gradient)
    theta0 = {
        "ls0": jnp.asarray(np.log(0.8)),
        "lsu": jnp.asarray(np.log(1.25)),
        "lb": jnp.asarray(np.log(0.6)),
    }
    theta_fit, hist = fit_parameters(
        factory_from_multipliers, theta0, path, target, steps=600, learning_rate=0.05
    )
    assert hist[-1] < 1e-8, f"loss did not converge: {hist[-1]:.2e}"
    sig0 = TRUE["sig0"] * float(jnp.exp(theta_fit["ls0"]))
    sigu = TRUE["sigu"] * float(jnp.exp(theta_fit["lsu"]))
    b = TRUE["b"] * float(jnp.exp(theta_fit["lb"]))
    np.testing.assert_allclose(sig0, TRUE["sig0"], rtol=1e-2)
    np.testing.assert_allclose(sigu, TRUE["sigu"], rtol=1e-2)
    np.testing.assert_allclose(b, TRUE["b"], rtol=1e-2)


def test_calibrate_rate_dependent_norton_with_dt():
    """Rate-dependent calibration must thread dt to the simulator (a dt=0.0
    default would make Norton predictions purely elastic with zero parameter
    gradients — review finding r2)."""
    from dolfinx_materials_tpu.calibration import fit_parameters, make_path_simulator
    from dolfinx_materials_tpu.models import (
        LinearElasticIsotropic,
        NortonViscoplasticity,
    )

    E, nu, sig0 = 70e3, 0.3, 200.0
    K_true = 150.0

    def factory(theta):
        # log-multiplier parameterization (the fit_parameters docstring tip):
        # Adam sees O(1) variables for an O(100) physical parameter
        return NortonViscoplasticity(
            LinearElasticIsotropic(E, nu),
            lambda p: sig0,
            K=100.0 * jnp.exp(theta["logK"]),
            n=3.0,
        )

    nsteps, dt = 12, 0.05
    eps_axx = np.linspace(0, 8e-3, nsteps)
    path = np.zeros((nsteps, 6))
    path[:, 0] = eps_axx
    theta_true = {"logK": jnp.log(K_true / 100.0)}
    sim = make_path_simulator(factory, theta_true, dt=dt)
    target = np.asarray(sim(theta_true, jnp.asarray(path)))
    # viscoplastic flow must actually be active in the data
    elastic = np.asarray(sim({"logK": jnp.log(1e10)}, jnp.asarray(path)))
    assert np.max(np.abs(target - elastic)) > 1.0

    fit, hist = fit_parameters(
        factory,
        {"logK": jnp.asarray(0.0)},  # K0 = 100, true 150
        path,
        target,
        steps=200,
        learning_rate=0.05,
        dt=dt,
    )
    K_fit = 100.0 * float(jnp.exp(fit["logK"]))
    assert abs(K_fit - K_true) / K_true < 0.05, (K_fit, hist[-1])
