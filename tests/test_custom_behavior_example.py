"""The docs/custom_behaviors.md worked example, golden-tested.

Proves the write-your-own-behavior journey (the TPU-native replacement for the
reference's MFront DSL extension point, reference mfront.py:41-343) end to
end: the tutorial's code runs verbatim, the point-level integrator matches its
closed form, the AD consistent tangent matches finite differences, and the
full FEM pipeline reproduces the analytic relaxation curve.
"""

import importlib.util
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dolfinx_materials_tpu import Material
from dolfinx_materials_tpu.models.base import SmallStrainBehavior
from dolfinx_materials_tpu.ops.newton import scalar_newton_solve
from dolfinx_materials_tpu.ops.tensors import I2, dev, eq_vm, eq_vm_safe, tr


def load_demo():
    path = pathlib.Path(__file__).parent.parent / "demos" / "custom_behavior.py"
    spec = importlib.util.spec_from_file_location("demo_custom_behavior", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# --- the tutorial's second example, verbatim from docs/custom_behaviors.md ---
class PerzynaJ2(SmallStrainBehavior):
    """Elastic predictor + viscoplastic return: dp/dt = ((q-sig0)/K)^n / t_star."""

    def __init__(self, E, nu, sig0, K, n, t_star):
        self.mu = E / (2 * (1 + nu))
        self.kappa = E / (3 * (1 - 2 * nu))
        self.sig0, self.K, self.n, self.t_star = sig0, K, n, t_star

    def init_state(self):
        return {"eps_p": jnp.zeros(6), "p": jnp.zeros(())}

    def small_strain_update(self, eps, state, dt):
        s_tr = 2 * self.mu * (dev(eps) - state["eps_p"])
        q_tr = eq_vm_safe(s_tr, self.sig0)

        def resid(dp):
            f = (q_tr - 3 * self.mu * dp - self.sig0) / self.K
            return dp - (dt / self.t_star) * jnp.maximum(f, 0.0) ** self.n

        dp, _ = scalar_newton_solve(resid, jnp.zeros(()), lower=0.0)
        dp = jnp.where(q_tr > self.sig0, dp, 0.0)
        n_dir = 1.5 * s_tr / jnp.maximum(q_tr, 1e-12)
        eps_p = state["eps_p"] + dp * n_dir
        sig = self.kappa * tr(eps) * I2 + s_tr - 2 * self.mu * dp * n_dir
        return sig, {"eps_p": eps_p, "p": state["p"] + dp}


class TestZenerPointLevel:
    """Tutorial layer 1: Material.integrate vs the closed-form relaxation."""

    def setup_method(self):
        demo = load_demo()
        self.demo = demo
        self.params = dict(kappa=1.0e3, mu_inf=300.0, mu1=700.0, tau=0.5)
        self.mat = Material(demo.ZenerViscoelasticity(**self.params))
        self.mat.set_data_manager(4)

    def test_relaxation_matches_closed_form(self):
        exx = 2e-3
        eps = jnp.tile(jnp.array([exx, 0, 0, 0, 0, 0.0]), (4, 1))
        # instantaneous step
        flux, _, _ = self.mat.integrate(eps, dt=0.0)
        self.mat.data_manager.update()  # s1 -> s0
        tau = self.params["tau"]
        dt = tau / 10
        sig_hist = [float(flux[0, 0])]
        for _ in range(30):
            flux, _, _ = self.mat.integrate(eps, dt=dt)
            self.mat.data_manager.update()
            sig_hist.append(float(flux[0, 0]))
        ts = np.arange(31) * dt
        analytic = exx * self.demo.relaxation_modulus_xx(ts, **self.params)
        np.testing.assert_allclose(np.asarray(sig_hist), analytic, rtol=1e-10)

    def test_dt_zero_is_fixed_point(self):
        """dt=0 must not relax state (elastic predictor contract)."""
        eps = jnp.tile(jnp.array([1e-3, 0, 0, 0, 0, 0.0]), (4, 1))
        f1, _, _ = self.mat.integrate(eps, dt=0.0)
        self.mat.data_manager.update()
        f2, _, _ = self.mat.integrate(eps, dt=0.0)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-14)
        epsv = np.asarray(self.mat.data_manager.s0["epsv"])
        np.testing.assert_allclose(epsv, 0.0, atol=1e-14)

    def test_tangent_matches_finite_difference(self):
        """Tutorial layer 2: the adapter's AD tangent vs central differences."""
        rng = np.random.default_rng(0)
        eps0 = jnp.tile(jnp.asarray(1e-3 * rng.standard_normal((1, 6))), (4, 1))
        dt = 0.1
        _, _, Ct = self.mat.integrate(eps0, dt=dt)
        Ct = np.asarray(Ct)[0].reshape(6, 6)
        h = 1e-7
        fd = np.zeros((6, 6))
        for j in range(6):
            dp = np.zeros(6)
            dp[j] = h
            fp, _, _ = self.mat.integrate(eps0 + dp[None, :], dt=dt)
            fm, _, _ = self.mat.integrate(eps0 - dp[None, :], dt=dt)
            fd[:, j] = (np.asarray(fp)[0] - np.asarray(fm)[0]) / (2 * h)
        np.testing.assert_allclose(Ct, fd, rtol=1e-6, atol=1e-6)

    def test_tangent_closed_form(self):
        """The algorithmic tangent of the exponential integrator is
        kappa*I(x)I + 2*(mu_inf + mu1*exp(-dt/tau))*P_dev."""
        eps0 = jnp.tile(jnp.asarray([[1e-3, 2e-4, 0.0, 3e-4, 0.0, 0.0]]), (4, 1))
        dt = 0.2
        _, _, Ct = self.mat.integrate(eps0, dt=dt)
        Ct = np.asarray(Ct)[0].reshape(6, 6)
        k, mi, m1, tau = (self.params[n] for n in ("kappa", "mu_inf", "mu1", "tau"))
        IxI = np.outer(I2, I2)
        P_dev = np.eye(6) - IxI / 3.0
        expect = k * IxI + 2 * (mi + m1 * np.exp(-dt / tau)) * P_dev
        np.testing.assert_allclose(Ct, expect, rtol=1e-12, atol=1e-10)


class TestZenerFEM:
    """Tutorial layer 3: the demo's full FEM relaxation run."""

    def test_demo_matches_closed_form(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        demo = load_demo()
        _, _, _, rel_err = demo.main(N=2, n_hold=12, write_outputs=False)
        assert rel_err < 1e-12


class TestPerzynaJ2:
    """The tutorial's internal-Newton example: overstress law + IFT tangent."""

    def setup_method(self):
        self.beh = PerzynaJ2(E=70e3, nu=0.3, sig0=350.0, K=100.0, n=2.0, t_star=1.0)
        self.mat = Material(self.beh)
        self.mat.set_data_manager(2)

    def test_elastic_below_yield(self):
        eps = jnp.tile(jnp.array([1e-3, -3e-4, -3e-4, 0, 0, 0.0]), (2, 1))
        flux, isv, _ = self.mat.integrate(eps, dt=0.1)
        self.mat.data_manager.update()
        assert float(eq_vm(jnp.asarray(flux)[0])) < self.beh.sig0
        np.testing.assert_allclose(
            np.asarray(self.mat.data_manager.s0["p"]), 0.0, atol=1e-14
        )

    def test_overstress_law_satisfied(self):
        """dp solves dp = dt/t* * ((q_tr - 3mu dp - sig0)/K)^n exactly."""
        eps = jnp.tile(jnp.array([8e-3, -2e-3, -2e-3, 0, 0, 0.0]), (2, 1))
        dt = 0.05
        flux, _, _ = self.mat.integrate(eps, dt=dt)
        self.mat.data_manager.update()
        dp = float(np.asarray(self.mat.data_manager.s0["p"]).ravel()[0])
        assert dp > 0.0
        mu = self.beh.mu
        s_tr = 2 * mu * np.asarray(dev(jnp.asarray(eps)))[0]
        q_tr = float(eq_vm(jnp.asarray(s_tr)))
        f = (q_tr - 3 * mu * dp - self.beh.sig0) / self.beh.K
        resid = dp - (dt / self.beh.t_star) * max(f, 0.0) ** self.beh.n
        assert abs(resid) < 1e-10 * max(dp, 1.0)
        # the returned stress is consistent with the plastic correction
        q_new = float(eq_vm(jnp.asarray(flux)[0]))
        np.testing.assert_allclose(q_new, q_tr - 3 * mu * dp, rtol=1e-10)

    def test_ift_tangent_matches_finite_difference(self):
        """AD THROUGH the scalar_newton_solve root (IFT) vs central FD."""
        eps0 = jnp.tile(jnp.asarray([[8e-3, -2e-3, -2e-3, 1e-3, 0.0, 0.0]]), (2, 1))
        dt = 0.05
        _, _, Ct = self.mat.integrate(eps0, dt=dt)
        Ct = np.asarray(Ct)[0].reshape(6, 6)
        h = 1e-7
        fd = np.zeros((6, 6))
        for j in range(6):
            d = np.zeros(6)
            d[j] = h
            fp, _, _ = self.mat.integrate(eps0 + d[None, :], dt=dt)
            fm, _, _ = self.mat.integrate(eps0 - d[None, :], dt=dt)
            fd[:, j] = (np.asarray(fp)[0] - np.asarray(fm)[0]) / (2 * h)
        np.testing.assert_allclose(Ct, fd, rtol=5e-5, atol=5e-3)

    def test_rate_independent_limit(self):
        """dt -> large recovers the rate-independent J2 return: q -> sig0."""
        eps = jnp.tile(jnp.asarray([[2e-2, -6e-3, -6e-3, 0, 0, 0.0]]), (2, 1))
        flux, _, _ = self.mat.integrate(eps, dt=1e6)
        q = float(eq_vm(jnp.asarray(flux)[0]))
        # overstress ((q-sig0)/K)^n stays finite => q -> sig0 + O(K*(dp/dt)^(1/n))
        assert abs(q - self.beh.sig0) < 0.05 * self.beh.sig0


@pytest.mark.demo
def test_demo_full_size(tmp_path, monkeypatch):
    """The demo entry point at its default size (demo tier)."""
    monkeypatch.chdir(tmp_path)
    demo = load_demo()
    *_, rel_err = demo.main()
    assert rel_err < 1e-12


class TestThermalZenerESV:
    """The tutorial's ESV section, made concrete: a temperature-shifted Zener
    branch driven through QuadratureMap.register_external_state_variable with
    per-point temperatures — hotter points must relax faster."""

    def make_problem(self, T_values):
        import dolfinx_materials_tpu.models.base as base
        from dolfinx_materials_tpu import (
            Material,
            NonlinearMaterialProblem,
            QuadratureMap,
        )
        from dolfinx_materials_tpu.fem import (
            DirichletBC,
            Function,
            FunctionSpace,
            create_unit_square,
            locate_dofs_geometrical,
        )
        from dolfinx_materials_tpu.fem.forms import mandel_strain_2d
        from dolfinx_materials_tpu.ops.tensors import I2 as I2j, dev, tr

        class ThermalZener(base.Behavior):
            gradients = {"Strain": 6}
            fluxes = {"Stress": 6}
            external_state_variables = {"Temperature": 1}
            kappa, mu_inf, mu1 = 1.0e3, 300.0, 700.0
            tau0, Q, T0 = 0.5, 2000.0, 293.15

            def init_state(self):
                return {"epsv": jnp.zeros(6)}

            def constitutive_update(self, inputs, state, dt):
                eps, T = inputs["Strain"], inputs["Temperature"][0]
                # Arrhenius shift: hotter -> faster relaxation (smaller tau)
                tau_T = self.tau0 * jnp.exp(self.Q * (1.0 / T - 1.0 / self.T0))
                e = dev(eps)
                a = jnp.exp(-dt / tau_T)
                epsv = e + (state["epsv"] - e) * a
                sig = (self.kappa * tr(eps) * I2j + 2 * self.mu_inf * e
                       + 2 * self.mu1 * (e - epsv))
                return {"Stress": sig}, {"epsv": epsv}

        mat = Material(ThermalZener())
        mesh = create_unit_square(2, 2, "quad")
        V = FunctionSpace(mesh, degree=1, shape=(2,))
        qmap = QuadratureMap(V, 2, mat)
        qmap.register_gradient("Strain", mandel_strain_2d())
        qmap.register_external_state_variable("Temperature", T_values)
        onb = lambda x: (
            np.isclose(x[:, 0], 0) | np.isclose(x[:, 0], 1)
            | np.isclose(x[:, 1], 0) | np.isclose(x[:, 1], 1)
        )
        bx = locate_dofs_geometrical(V, onb, component=0)
        by = locate_dofs_geometrical(V, onb, component=1)
        exx = 1e-3
        bc_x = DirichletBC(bx, exx * V.node_coords[bx // V.ncomp, 0])
        prob = NonlinearMaterialProblem(
            qmap, Function(V), bcs=[bc_x, DirichletBC(by, 0.0)],
            options={"ksp_type": "lu", "atol": 1e-12, "rtol": 1e-12},
        )
        return prob, qmap, ThermalZener

    def run_relaxation(self, T_values, n_hold=8):
        prob, qmap, cls = self.make_problem(T_values)
        qmap.dt = 0.0
        conv, _ = prob.solve()
        assert conv
        qmap.advance()
        qmap.dt = 0.1
        for _ in range(n_hold):
            conv, _ = prob.solve()
            assert conv
            qmap.advance()
        return np.asarray(qmap.material.data_manager.s0["Stress"]), cls

    def test_hotter_relaxes_faster(self):
        sig_cold, _ = self.run_relaxation(293.15)
        sig_hot, _ = self.run_relaxation(400.0)
        # identical elastic response, faster decay of the Maxwell overstress
        assert sig_hot[0, 0] < sig_cold[0, 0] - 1e-6

    def test_per_point_temperatures_give_per_point_relaxation(self):
        prob, qmap, cls = self.make_problem(293.15)
        n = qmap.num_points
        T = np.full(n, 293.15)
        T[: n // 2] = 420.0  # first half of the Gauss points run hot
        qmap.register_external_state_variable("Temperature", T)
        qmap.dt = 0.0
        conv, _ = prob.solve()
        assert conv
        qmap.advance()
        qmap.dt = 0.1
        for _ in range(6):
            conv, _ = prob.solve()
            assert conv
            qmap.advance()
        sig = np.asarray(qmap.material.data_manager.s0["Stress"])
        # near-affine strain state: the dominant stress difference is the ESV's
        hot, cold = sig[: n // 2, 0], sig[n // 2:, 0]
        assert hot.max() < cold.min() - 1e-6
