"""Linear-factor math: Isserlis collapse, closed-form vs quadrature, priors.

The reference validates its closed-form linear factor against a GH-quadrature
twin (gp/factorized_opts_linear.h:12-14 ships NGDFactorizedLinearGH solely
for this comparison); we do the same, plus verify the algebraic collapse of
the O(d^4) Isserlis loop (ngd/NGDFactorizedLinear.h:108-119) used in
gaussianvi_tpu.factors.moments.linear_local_gradients.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gaussianvi_tpu.factors import (
    gh_moments,
    linear_cost,
    linear_local_gradients,
    make_nonlinear_batch,
    ngd_local_gradients,
)
from gaussianvi_tpu.factors.priors import (
    fixed_prior,
    ltv_transition_and_gramian,
    min_acc_q,
    min_acc_q_inv,
    minimum_acc_prior,
)


def isserlis_loop_vddmu(cov, a_mat, constant, temperature):
    """Direct port of the reference's quadruple loop (oracle only)."""
    d = cov.shape[0]
    prec = np.linalg.inv(cov)
    tmp = np.zeros((d, d))
    for i in range(d):
        for j in range(d):
            for k in range(d):
                for l in range(d):
                    tmp[i, j] += (
                        cov[i, j] * cov[k, l]
                        + cov[i, k] * cov[j, l]
                        + cov[i, l] * cov[j, k]
                    ) * a_mat[k, l]
    return (
        (prec @ tmp @ prec - prec * np.trace(a_mat @ cov))
        * constant
        / temperature
    )


class TestIsserlisCollapse:
    def test_quadruple_loop_equals_2a(self):
        rng = np.random.default_rng(0)
        d = 4
        m = rng.standard_normal((d, d))
        cov = m @ m.T + d * np.eye(d)
        a_raw = rng.standard_normal((d, d))
        a_mat = a_raw @ a_raw.T
        for constant, temp in [(0.5, 1.0), (1.0, 10.0)]:
            loop = isserlis_loop_vddmu(cov, a_mat, constant, temp)
            closed = 2.0 * a_mat * constant / temp
            np.testing.assert_allclose(loop, closed, rtol=1e-9)


class TestClosedFormVsQuadrature:
    def test_linear_factor_gh_agreement(self):
        """Closed-form NGD gradients == quadrature gradients on the same
        quadratic cost (the reference's own validation pattern)."""
        rng = np.random.default_rng(1)
        d, r = 2, 2
        lam = jnp.asarray(rng.standard_normal((1, r, d)))
        psi = jnp.asarray(np.eye(r)[None])
        target_mu = jnp.asarray(rng.standard_normal((1, r)))
        m = rng.standard_normal((r, r))
        target_prec = jnp.asarray((m @ m.T + r * np.eye(r))[None])
        constant = jnp.asarray([0.5])
        mu = jnp.asarray(rng.standard_normal((1, d)))
        c = rng.standard_normal((d, d))
        cov = jnp.asarray((c @ c.T + d * np.eye(d))[None])

        def quad_cost(x, params):
            resid = lam[0] @ x - psi[0] @ target_mu[0]
            return 0.5 * resid @ target_prec[0] @ resid

        fb = make_nonlinear_batch(quad_cost, [0], state_dim=d, gh_degree=4)
        e_phi, e_xmu, e_xxt = gh_moments(
            fb.nodes, fb.weights, mu, cov, fb.cost_fn, None
        )
        vdmu_q, vddmu_q = ngd_local_gradients(e_phi, e_xmu, e_xxt, cov, 1.0)
        vdmu_c, vddmu_c = linear_local_gradients(
            lam, psi, target_mu, target_prec, constant, mu, 1.0
        )
        np.testing.assert_allclose(vdmu_q, vdmu_c, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(vddmu_q, vddmu_c, rtol=1e-8, atol=1e-10)
        # cost agreement too
        cost_c = linear_cost(
            lam, psi, target_mu, target_prec, constant, mu, cov
        )
        np.testing.assert_allclose(e_phi, cost_c, rtol=1e-10)


class TestMinimumAccPrior:
    def test_q_inverse_closed_form(self):
        rng = np.random.default_rng(2)
        m = rng.standard_normal((3, 3))
        qc = m @ m.T + 3 * np.eye(3)
        dt = 0.37
        q = min_acc_q(qc, dt)
        qi = min_acc_q_inv(np.linalg.inv(qc), dt)
        np.testing.assert_allclose(q @ qi, np.eye(6), atol=1e-10)

    def test_prior_batch_shapes(self):
        lb = minimum_acc_prior(np.eye(2), 0.1, num_states=5)
        assert lb.num_factors == 4
        assert lb.lam.shape == (4, 4, 8)
        assert lb.nb == 2
        np.testing.assert_allclose(lb.constant, 0.5)

    def test_prior_cost_is_gp_residual(self):
        """psi(theta1, theta2) = 0.5 (Phi th1 - th2)^T Q^{-1} (Phi th1 - th2)
        (gp/minimum_acc_prior.h cost)."""
        qc = np.eye(1) * 2.0
        dt = 0.5
        lb = minimum_acc_prior(qc, dt, num_states=2)
        th1 = np.array([1.0, 2.0])
        th2 = np.array([2.3, 1.7])
        phi = np.array([[1.0, dt], [0.0, 1.0]])
        resid = phi @ th1 - th2
        qinv = min_acc_q_inv(np.linalg.inv(qc), dt)
        expected = 0.5 * resid @ qinv @ resid
        x = jnp.asarray(np.concatenate([th1, th2]))[None]
        got = linear_cost(
            lb.lam, lb.psi, lb.target_mu, lb.target_prec, lb.constant,
            x, jnp.zeros((1, 4, 4)),
        )
        np.testing.assert_allclose(got[0], expected, rtol=1e-12)


class TestLTVPrior:
    def test_constant_velocity_reduces_to_closed_form(self):
        """With A = [[0, I], [0, 0]] and B = [[0], [L]] (L L^T = Qc) the LTV
        Phi/Gramian equal the minimum-acc closed forms
        (the reference's MinimumAccGP-vs-LTV comparison pattern,
        gp/minimum_acc_prior_integral.h)."""
        d = 2
        rng = np.random.default_rng(3)
        m = rng.standard_normal((d, d))
        qc = m @ m.T + d * np.eye(d)
        chol = np.linalg.cholesky(qc)
        dt = 0.4
        a = np.zeros((2 * d, 2 * d))
        a[:d, d:] = np.eye(d)
        b = np.zeros((2 * d, d))
        b[d:, :] = chol
        a_seg = np.broadcast_to(a, (5, 2 * d, 2 * d))
        b_seg = np.broadcast_to(b, (5, 2 * d, d))
        phi, q = ltv_transition_and_gramian(a_seg, b_seg, dt, nsteps=100)
        phi_expected = np.eye(2 * d)
        phi_expected[:d, d:] = dt * np.eye(d)
        np.testing.assert_allclose(phi, phi_expected, atol=1e-12)
        np.testing.assert_allclose(q, min_acc_q(qc, dt), atol=1e-10)

    def test_fixed_prior(self):
        fp = fixed_prior(0, np.array([1.0, 2.0]), 4.0 * np.eye(2))
        x = jnp.asarray([[2.0, 3.0]])
        got = linear_cost(
            fp.lam, fp.psi, fp.target_mu, fp.target_prec, fp.constant,
            x, jnp.zeros((1, 2, 2)),
        )
        np.testing.assert_allclose(got[0], (1.0 + 1.0) / 4.0, rtol=1e-12)
