"""Autodiff cross-checks of the NGD gradient identities.

By Bonnet's and Price's theorems, for q = N(mu, Sigma):

    d/dmu    E_q[phi] = Prec E_q[(x-mu) phi]            (= Vdmu * T)
    d/dSigma E_q[phi] = (Prec E[(x-mu)(x-mu)^T phi] Prec - Prec E[phi]) / 2
                       (= Vddmu * T / 2)

Differentiating the quadrature estimate of E_q[phi] with jax.grad must
reproduce the moment-based expressions — a strong end-to-end check of the
moment math that the reference cannot perform (no autodiff).
"""

import jax
import jax.numpy as jnp
import numpy as np

from gaussianvi_tpu.factors import (
    gh_moments,
    make_nonlinear_batch,
    ngd_local_gradients,
)
from gaussianvi_tpu.factors.moments import sigma_points


def nonquad_cost(x, params):
    return jnp.sum(x**2) + jnp.sin(x[0]) * jnp.exp(0.3 * x[-1])


class TestGradientIdentities:
    def setup_method(self):
        self.d = 3
        rng = np.random.default_rng(0)
        self.mu = jnp.asarray(rng.standard_normal(self.d))
        c = rng.standard_normal((self.d, self.d))
        self.cov = jnp.asarray(c @ c.T + self.d * np.eye(self.d))
        self.fb = make_nonlinear_batch(
            nonquad_cost, [0], state_dim=self.d, gh_degree=10
        )

    def quad_e_phi(self, mu, cov):
        pts = sigma_points(self.fb.nodes, mu[None], cov[None])[0]
        phi = jax.vmap(lambda x: nonquad_cost(x, None))(pts)
        return phi @ self.fb.weights

    def test_bonnet_mean_gradient(self):
        grad_mu = jax.grad(self.quad_e_phi, argnums=0)(self.mu, self.cov)
        e_phi, e_xmu, e_xxt = gh_moments(
            self.fb.nodes, self.fb.weights, self.mu[None], self.cov[None],
            self.fb.cost_fn, None,
        )
        vdmu, _ = ngd_local_gradients(
            e_phi, e_xmu, e_xxt, self.cov[None], 1.0
        )
        # note: quadrature differentiates the ESTIMATE (including the
        # Cholesky dependence), so agreement is to quadrature error of the
        # next-order moments, not machine precision
        np.testing.assert_allclose(grad_mu, vdmu[0], rtol=2e-3, atol=1e-4)

    def test_price_covariance_gradient(self):
        grad_cov = jax.grad(self.quad_e_phi, argnums=1)(self.mu, self.cov)
        grad_cov = 0.5 * (grad_cov + grad_cov.T)  # symmetrize convention
        e_phi, e_xmu, e_xxt = gh_moments(
            self.fb.nodes, self.fb.weights, self.mu[None], self.cov[None],
            self.fb.cost_fn, None,
        )
        _, vddmu = ngd_local_gradients(
            e_phi, e_xmu, e_xxt, self.cov[None], 1.0
        )
        np.testing.assert_allclose(
            grad_cov, 0.5 * vddmu[0], rtol=5e-3, atol=5e-4
        )
