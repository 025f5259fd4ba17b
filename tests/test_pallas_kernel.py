"""Fused-moments Pallas kernel vs the XLA reference path.

Runs in interpreter mode on CPU (the compiled path is exercised on real TPU
by bench.py and the TPU smoke runs); validates the fused one-pass moment
computation, parameter plumbing, and K-padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianvi_tpu.factors.moments import gh_moments
from gaussianvi_tpu.kernels import fused_moments
from gaussianvi_tpu.quadrature import get_rule


def setup_problem(K=20, d=4, seed=0):
    nodes_np, w_np = get_rule(d, 4)
    rng = np.random.default_rng(seed)
    mu = rng.standard_normal((K, d))
    c = rng.standard_normal((K, d, d))
    cov = c @ c.transpose(0, 2, 1) + 3 * np.eye(d)
    r = rng.uniform(1.0, 2.0, (K,))
    return (
        jnp.asarray(nodes_np), jnp.asarray(w_np),
        jnp.asarray(mu), jnp.asarray(cov), jnp.asarray(r),
    )


def cost_point(x, params):
    return jnp.sum(x**2) + jnp.sin(x[0]) * params


def cost_block(pts, r):
    # batch-dim agnostic, per the kernel contract
    return jnp.sum(pts**2, axis=-1) + jnp.sin(pts[..., 0]) * r


class TestFusedMoments:
    @pytest.mark.parametrize("K", [16, 20])  # 20 exercises the K-padding
    def test_matches_xla_path(self, K):
        nodes, w, mu, cov, r = setup_problem(K=K)
        e0, ex0, exx0 = gh_moments(nodes, w, mu, cov, cost_point, r)
        e1, ex1, exx1 = fused_moments(
            nodes, w, mu, cov, cost_fn=cost_block, params=(r,),
            interpret=True,
        )
        np.testing.assert_allclose(e1, e0, rtol=1e-10)
        np.testing.assert_allclose(ex1, ex0, rtol=1e-9, atol=1e-10)
        np.testing.assert_allclose(exx1, exx0, rtol=1e-9, atol=1e-10)

    def test_no_params(self):
        nodes, w, mu, cov, _ = setup_problem(K=8)
        e0, ex0, exx0 = gh_moments(
            nodes, w, mu, cov, lambda x, p: jnp.sum(x**4), None
        )
        e1, ex1, exx1 = fused_moments(
            nodes, w, mu, cov,
            cost_fn=lambda pts: jnp.sum(pts**4, axis=-1),
            interpret=True,
        )
        np.testing.assert_allclose(e1, e0, rtol=1e-10)
        np.testing.assert_allclose(exx1, exx0, rtol=1e-9, atol=1e-10)
