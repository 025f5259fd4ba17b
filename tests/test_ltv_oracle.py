"""LTV prior accuracy oracles (VERDICT r3 item 8).

The unit suite previously validated the LTV Phi/Gramian only on the
constant-A special case (where closed forms exist); these tests gate a
GENUINELY time-varying system against a high-precision adaptive
integration — the same adjudicator the reference uses (GSL rkf45 at tol
1e-12, gp/LTV_prior.h:123-152; here scipy DOP853 at 1e-13) — and the
end-to-end ltv_estimation posterior against a prior built from those
oracle matrices.
"""

import numpy as np
import pytest
from scipy.integrate import solve_ivp

from gaussianvi_tpu.factors.priors import ltv_transition_and_gramian


def _tv_system(seed=0, s=4, m=2):
    """Piecewise-constant but genuinely time-VARYING (A_j, B_j) over the 5
    sub-interval slots of one segment (reference layout
    gp/LTV_prior.h:54-59) — every sub-interval gets a different random
    stable A."""
    rng = np.random.default_rng(seed)
    a_seg = np.stack([
        rng.standard_normal((s, s)) * 0.8 - 0.5 * np.eye(s)
        for _ in range(5)
    ])
    b_seg = np.stack([rng.standard_normal((s, m)) for _ in range(5)])
    return a_seg, b_seg


def _oracle(a_seg, b_seg, delta_t):
    """Phi and Gramian by adaptive DOP853 at 1e-13, integrated piece by
    piece (each piece has constant coefficients, so the adaptive solver
    sees a smooth RHS; the reference's floor(4 t / dt) lookup makes the
    pieces the quarter-intervals, with slot 4 active only at t = dt)."""
    s = a_seg.shape[1]
    phi = np.eye(s)
    q = np.zeros((s, s))
    h = delta_t / 4.0
    for j in range(4):
        a, b = a_seg[j], b_seg[j]
        bbt = b @ b.T

        def phi_rhs(t, y, a=a):
            return (a @ y.reshape(s, s)).reshape(-1)

        def q_rhs(t, y, a=a, bbt=bbt):
            qm = y.reshape(s, s)
            return (a @ qm + qm @ a.T + bbt).reshape(-1)

        sol = solve_ivp(phi_rhs, (0.0, h), phi.reshape(-1),
                        method="DOP853", rtol=1e-13, atol=1e-13)
        phi = sol.y[:, -1].reshape(s, s)
        sol = solve_ivp(q_rhs, (0.0, h), q.reshape(-1),
                        method="DOP853", rtol=1e-13, atol=1e-13)
        q = sol.y[:, -1].reshape(s, s)
    return phi, q


class TestTimeVaryingOracle:
    def test_phi_gramian_match_adaptive_integration(self):
        """Default nsteps=200 RK4 vs the 1e-13 adaptive oracle on a
        genuinely time-varying segment: ~1e-10 (the reference's own
        integration tolerance class)."""
        a_seg, b_seg = _tv_system(seed=0)
        dt = 0.37
        phi_o, q_o = _oracle(a_seg, b_seg, dt)
        phi, q = ltv_transition_and_gramian(a_seg, b_seg, dt, nsteps=200)
        np.testing.assert_allclose(phi, phi_o, atol=1e-10)
        np.testing.assert_allclose(q, q_o, atol=1e-10)

    def test_rk4_convergence_order(self):
        """Fixed-step RK4 with steps ALIGNED to the sub-interval boundaries
        (nsteps divisible by 4) converges at 4th order on the piecewise-
        constant system: halving h cuts the error ~16x."""
        a_seg, b_seg = _tv_system(seed=1)
        dt = 0.5
        phi_o, q_o = _oracle(a_seg, b_seg, dt)
        errs = []
        for nsteps in (8, 16, 32):
            phi, q = ltv_transition_and_gramian(
                a_seg, b_seg, dt, nsteps=nsteps
            )
            errs.append(max(
                np.abs(phi - phi_o).max(), np.abs(q - q_o).max()
            ))
        # observed order: log2(err ratio) per halving ~ 4
        r1 = errs[0] / errs[1]
        r2 = errs[1] / errs[2]
        assert r1 > 10.0 and r2 > 10.0, (errs, r1, r2)

    def test_nsteps_not_divisible_by_four(self):
        """The piecewise integrator rounds nsteps down per piece; accuracy
        stays in the same class (no boundary-crossing stages exist)."""
        a_seg, b_seg = _tv_system(seed=2)
        dt = 0.3
        phi_o, q_o = _oracle(a_seg, b_seg, dt)
        phi, q = ltv_transition_and_gramian(a_seg, b_seg, dt, nsteps=199)
        assert np.abs(phi - phi_o).max() < 1e-9
        assert np.abs(q - q_o).max() < 1e-9


class TestEndToEndOracle:
    def test_posterior_matches_oracle_prior(self):
        """Rebuild the ltv_estimation prior with Phi/Q from the 1e-13
        adaptive oracle and re-run the full NGD optimization: the
        trajectory must agree with the default (RK4 nsteps=200) build to
        ~1e-6 — i.e. the integration error is invisible at posterior
        level (VERDICT r3 item 8's bar)."""
        import jax.numpy as jnp
        from dataclasses import replace as dreplace

        from gaussianvi_tpu.examples.ltv_estimation import (
            build_ltv_estimation,
            pendulum_ltv_system,
        )
        from gaussianvi_tpu.factors.priors import _as_batch
        from gaussianvi_tpu.inference import optimize

        num_states, dt = 8, 0.2
        graph, init, config = build_ltv_estimation(
            num_states=num_states, dt=dt
        )
        final, hist = optimize(graph, init, config, method="ngd")

        # oracle prior: same (A, B) schedule, Phi/Q via DOP853 at 1e-13
        theta_nom = 0.5 + 0.1 * np.arange(num_states) * dt
        target_means = [
            np.array([theta_nom[i], 0.1]) for i in range(num_states)
        ]
        a_list, b_list = pendulum_ltv_system(num_states, dt, theta_nom)
        s = 2
        k = num_states - 1
        lam = np.zeros((k, s, 2 * s))
        psi = np.zeros((k, s, 2 * s))
        prec = np.zeros((k, s, s))
        tmu = np.zeros((k, 2 * s))
        for i in range(k):
            a_seg = np.stack([a_list[4 * i + j] for j in range(5)])
            b_seg = np.stack([b_list[4 * i + j] for j in range(5)])
            phi, q = _oracle(a_seg, b_seg, dt)
            lam[i, :, :s] = -phi
            lam[i, :, s:] = np.eye(s)
            psi[i, :, :s] = phi
            psi[i, :, s:] = -np.eye(s)
            prec[i] = np.linalg.inv(q)
            tmu[i, :s] = target_means[i]
            tmu[i, s:] = target_means[i + 1]
        gp_oracle = _as_batch(
            np.arange(k), lam, psi, tmu, prec, np.full(k, 0.5), nb=2,
            dtype=jnp.zeros(0).dtype,
        )
        graph_o = dreplace(graph, linear=(graph.linear[0], gp_oracle))
        final_o, hist_o = optimize(graph_o, init, config, method="ngd")

        np.testing.assert_allclose(
            np.asarray(final.mu), np.asarray(final_o.mu), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(hist.cost), np.asarray(hist_o.cost), rtol=1e-6
        )
