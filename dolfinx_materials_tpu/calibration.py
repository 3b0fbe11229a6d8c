"""Differentiable material parameters: pytree behaviors + gradient calibration.

The reference's jaxmat behaviors are equinox pytrees whose leaves are
calibrated/learned parameters (reference docs/jax.md:36-44, jaxmat.py:121-132).
Here the same capability, TPU-native: a ``behavior_factory(params)`` rebuilds
the behavior from a parameter PYTREE inside the trace, so every parameter leaf
is differentiable through the constitutive update — including through the
implicit local Newton solves (ops/newton.py uses ``lax.custom_root``, whose
closure conversion routes parameter derivatives through the implicit function
theorem, never through unrolled iterations).

``simulate_path`` drives a strain path through sequential updates with a
``lax.scan`` threading the internal state — one compiled program per path
length, state HBM-resident. ``fit_parameters`` wraps it in an optax loop
(the reference's NN-surrogate/Adam calibration pattern generalized to
classical models: fit Voce (sig0, sigu, b) to a stress-strain curve).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_path_simulator(behavior_factory, example_params, dt=0.0):
    """Returns ``simulate(params, grad_path) -> flux_path`` where ``grad_path``
    is ``(nsteps, k)`` (one material point) or ``(nsteps, npts, k)`` (batched
    over points via vmap). Sequential in steps (state-dependent), jitted."""
    beh0 = behavior_factory(example_params)
    gname = next(iter(beh0.gradients))
    fname = next(iter(beh0.fluxes))

    def simulate(params, grad_path):
        beh = behavior_factory(params)

        def point_path(path_1pt):
            def step(state, g):
                flux, new_state = beh.constitutive_update({gname: g}, state, dt)
                return new_state, flux[fname]

            _, fluxes = jax.lax.scan(step, beh.init_state(), path_1pt)
            return fluxes

        if grad_path.ndim == 3:
            return jax.vmap(point_path, in_axes=1, out_axes=1)(grad_path)
        return point_path(grad_path)

    return jax.jit(simulate)


def fit_parameters(
    behavior_factory,
    params0,
    grad_path,
    target_flux,
    steps=300,
    learning_rate=0.05,
    optimizer=None,
    loss_fn=None,
    dt=0.0,
):
    """Calibrate behavior parameters to observed flux (stress) history.

    ``params0``: parameter pytree (dict/array leaves). ``grad_path``/
    ``target_flux``: (nsteps, k) arrays (or (nsteps, npts, k)). Gradients of the
    loss flow through the IFT local solves — exact consistent sensitivities, no
    unrolling. Returns ``(params_fit, loss_history)``.

    Tip: for parameters spanning decades (sig0 ~ 1e2, b ~ 1e3), parameterize the
    factory in log-multipliers so Adam sees O(1) variables. Initialize yield
    parameters BELOW the data's stress levels: if the model starts fully
    elastic over the whole path, yield parameters have exactly zero gradient
    (the elastic dead zone) and the optimizer cannot recover.
    """
    import optax

    # dt matters: rate-dependent behaviors (Norton, crystal) integrate
    # dp ~ dt * rate — calibrating them at the default dt = 0 would make the
    # predictions purely elastic with exactly-zero parameter gradients
    sim = make_path_simulator(behavior_factory, params0, dt=dt)
    target = jnp.asarray(target_flux)
    scale = jnp.mean(target**2) + 1e-30

    if loss_fn is None:

        def loss_fn(params):
            pred = sim(params, jnp.asarray(grad_path))
            return jnp.mean((pred - target) ** 2) / scale

    opt = optimizer if optimizer is not None else optax.adam(learning_rate)

    @jax.jit
    def update(params, opt_state):
        loss, g = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    params = jax.tree.map(jnp.asarray, params0)
    opt_state = opt.init(params)
    history = []
    for _ in range(steps):
        params, opt_state, loss = update(params, opt_state)
        history.append(float(loss))
    return params, history
