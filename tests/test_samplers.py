"""HMC / NUTS / SMC correctness on targets with known moments.

Gaussian targets have exact answers; the 1-D Barfoot posterior cross-checks
the three samplers against each other and against GVI's projection.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianvi_tpu.samplers import (
    hmc,
    make_log_density,
    neg_log_prob,
    nuts,
    smc_adaptive,
)


def gaussian_2d_logpdf():
    cov = jnp.asarray([[2.0, 0.8], [0.8, 1.0]])
    prec = jnp.linalg.inv(cov)
    mean = jnp.asarray([1.0, -0.5])

    def log_density(x):
        d = x - mean
        return -0.5 * d @ prec @ d

    return log_density, np.asarray(mean), np.asarray(cov)


class TestHMC:
    def test_gaussian_moments(self):
        log_density, mean, cov = gaussian_2d_logpdf()
        res = hmc(
            log_density, jnp.zeros(2), jax.random.key(0),
            num_samples=4000, num_warmup=1000, num_leapfrog=16,
        )
        s = np.asarray(res.samples)
        assert res.accept_prob.mean() > 0.5
        np.testing.assert_allclose(s.mean(0), mean, atol=0.15)
        np.testing.assert_allclose(np.cov(s.T), cov, atol=0.35)


class TestNUTS:
    def test_gaussian_moments(self):
        log_density, mean, cov = gaussian_2d_logpdf()
        res = nuts(
            log_density, jnp.zeros(2), jax.random.key(1),
            num_samples=3000, num_warmup=800, max_depth=5,
        )
        s = np.asarray(res.samples)
        assert float(res.mean_accept) > 0.5
        np.testing.assert_allclose(s.mean(0), mean, atol=0.15)
        np.testing.assert_allclose(np.cov(s.T), cov, atol=0.35)


class TestSMC:
    def test_gaussian_product(self):
        """reference N(0, I), delta = quadratic pulling toward (1, 1):
        target is the product Gaussian with known moments."""
        prec_delta = 3.0
        target_mean = 1.0

        def log_ref(x):
            return -0.5 * jnp.sum(x**2)

        def log_delta(x):
            return -0.5 * prec_delta * jnp.sum((x - target_mean) ** 2)

        # posterior: prec = 1 + 3 = 4, mean = 3/4
        key = jax.random.key(2)
        init = jax.random.normal(key, (1024, 2))
        res = smc_adaptive(
            log_ref, log_delta, init, jax.random.key(3),
            mutation_step_size=0.4,
        )
        s = np.asarray(res.particles)
        w = np.asarray(res.weights)
        mean = (w[:, None] * s).sum(0)
        np.testing.assert_allclose(mean, [0.75, 0.75], atol=0.1)
        var = (w[:, None] * (s - mean) ** 2).sum(0)
        np.testing.assert_allclose(var, [0.25, 0.25], atol=0.08)
        assert int(res.num_stages) >= 1


class TestBarfootPosterior:
    def test_samplers_agree_on_1d_target(self):
        from gaussianvi_tpu.examples import build_barfoot_1d

        graph, _, _ = build_barfoot_1d()
        log_density = make_log_density(graph, 1, 1)
        k = jax.random.key(4)
        res_h = hmc(
            log_density, jnp.asarray([20.0]), k,
            num_samples=4000, num_warmup=1000, num_leapfrog=8,
            init_step_size=0.5,
        )
        res_n = nuts(
            log_density, jnp.asarray([20.0]), jax.random.key(5),
            num_samples=4000, num_warmup=1000, max_depth=4,
            init_step_size=0.5,
        )
        mh = float(res_h.samples.mean())
        mn = float(res_n.samples.mean())
        assert abs(mh - mn) < 0.15
        # true posterior mean is near the GVI solution (~23.8) but not equal
        # (GVI is a KL projection); sanity interval:
        assert 22.0 < mh < 26.0
        vh = float(res_h.samples.var())
        vn = float(res_n.samples.var())
        assert abs(vh - vn) < 1.5


class TestTarget:
    def test_neg_log_prob_matches_factor_sum(self):
        from gaussianvi_tpu.examples import barfoot_cost, build_barfoot_1d

        graph, _, _ = build_barfoot_1d()
        x = jnp.asarray([[22.0]])
        got = neg_log_prob(graph, x)
        np.testing.assert_allclose(
            got, barfoot_cost(jnp.asarray([22.0]), None), rtol=1e-12
        )


class TestIterativeNUTS:
    """The while_loop tree builder (program size O(max_depth), not
    2^max_depth) against the unrolled recursion and exact moments."""

    def test_matches_unrolled_statistically(self):
        log_density, mean, cov = gaussian_2d_logpdf()
        kw = dict(num_samples=3000, num_warmup=800, max_depth=5)
        s_it = np.asarray(nuts(
            log_density, jnp.zeros(2), jax.random.key(7),
            tree_method="iterative", **kw,
        ).samples)
        s_un = np.asarray(nuts(
            log_density, jnp.zeros(2), jax.random.key(7),
            tree_method="unrolled", **kw,
        ).samples)
        np.testing.assert_allclose(s_it.mean(0), s_un.mean(0), atol=0.2)
        np.testing.assert_allclose(
            np.cov(s_it.T), np.cov(s_un.T), atol=0.45
        )
        np.testing.assert_allclose(s_it.mean(0), mean, atol=0.15)

    def test_deep_tree_compiles_and_samples(self):
        """max_depth=10 would be a 1024-leapfrog unrolled program; the
        iterative builder compiles it in seconds.  Ill-conditioned Gaussian
        needs the deep trees."""
        import time

        scales = jnp.asarray([1.0, 30.0])

        def log_density(x):
            return -0.5 * jnp.sum((x / scales) ** 2)

        t0 = time.time()
        res = nuts(
            log_density, jnp.zeros(2), jax.random.key(8),
            num_samples=2000, num_warmup=800, max_depth=10,
        )
        assert time.time() - t0 < 120.0
        s = np.asarray(res.samples)
        np.testing.assert_allclose(s.std(0), np.asarray(scales), rtol=0.25)
        assert float(res.mean_accept) > 0.5

    def test_multichain_with_diagnostics(self):
        from gaussianvi_tpu.samplers import nuts_chains, split_rhat, summarize

        log_density, mean, cov = gaussian_2d_logpdf()
        init = jnp.asarray([[2.0, 2.0], [-2.0, -2.0], [2.0, -2.0], [0.0, 0.0]])
        res = nuts_chains(
            log_density, init, jax.random.key(9),
            num_samples=1500, num_warmup=500, max_depth=5,
        )
        assert res.samples.shape == (4, 1500, 2)
        stats = summarize(np.asarray(res.samples))
        assert np.all(stats["rhat"] < 1.05)
        np.testing.assert_allclose(stats["mean"], mean, atol=0.15)
