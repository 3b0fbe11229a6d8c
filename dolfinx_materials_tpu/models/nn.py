"""Neural-network surrogate constitutive models.

The reference's design note: jaxmat behaviors are pytrees whose leaves are
calibrated/learned parameters, so NN surrogate constitutive models "fall out" of
the design (reference docs/jax.md:36-44, SURVEY.md §2.3). Here: a plain-pytree
MLP behavior + an optax training helper. Because the Material adapter computes
consistent tangents by forward-mode AD of the behavior, a trained surrogate
immediately provides exact d(sigma)/d(eps) for the global Newton solve — no
finite differencing, no re-deriving tangents.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import SmallStrainBehavior


def init_mlp_params(layers, seed=0, scale=None):
    rng = np.random.default_rng(seed)
    params = []
    for fan_in, fan_out in zip(layers[:-1], layers[1:]):
        s = scale or np.sqrt(2.0 / fan_in)
        W = rng.normal(size=(fan_in, fan_out)) * s
        b = np.zeros(fan_out)
        params.append({"W": jnp.asarray(W), "b": jnp.asarray(b)})
    return params


def mlp_apply(params, x, activation=jnp.tanh):
    for layer in params[:-1]:
        x = activation(x @ layer["W"] + layer["b"])
    last = params[-1]
    return x @ last["W"] + last["b"]


class NeuralBehavior(SmallStrainBehavior):
    """MLP surrogate sigma(eps): Mandel strain (6,) -> Mandel stress (6,).

    ``input_scale``/``output_scale`` normalize strain/stress magnitudes (strains
    ~1e-3, stresses ~1e2-1e3: without scaling the net trains badly). Stateless by
    default; subclass and extend ``init_state`` for history-dependent surrogates.
    """

    def __init__(
        self,
        layers=(6, 64, 64, 6),
        params=None,
        activation=jnp.tanh,
        input_scale=1e3,
        output_scale=1e3,
        seed=0,
    ):
        self.params = params if params is not None else init_mlp_params(layers, seed)
        self.activation = activation
        self.input_scale = input_scale
        self.output_scale = output_scale

    def small_strain_update(self, eps, state, dt):
        sig = self.output_scale * mlp_apply(
            self.params, self.input_scale * eps, self.activation
        )
        return sig, state

    # ------------------------------------------------------------- training
    def fit(self, eps_data, sig_data, steps=2000, learning_rate=1e-3):
        """Fit the surrogate to (strain, stress) data with optax Adam.

        Returns the loss history. The behavior's params are updated in place;
        re-wrap with Material afterwards (or call material.update_material_property
        to force a rebuild) so the compiled update sees the new weights.
        """
        import optax

        eps_data = jnp.asarray(eps_data)
        sig_data = jnp.asarray(sig_data)
        xs = self.input_scale * eps_data
        ys = sig_data / self.output_scale

        def loss_fn(params):
            pred = mlp_apply(params, xs, self.activation)
            return jnp.mean((pred - ys) ** 2)

        opt = optax.adam(learning_rate)
        params = self.params
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state):
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        hist = []
        for _ in range(steps):
            params, opt_state, loss = step(params, opt_state)
            hist.append(float(loss))
        self.params = params
        return hist
