"""MCMC diagnostics sanity: iid samples give R-hat ~ 1 and ESS ~ C*T;
divergent chains are flagged."""

import numpy as np

from gaussianvi_tpu.samplers.diagnostics import ess, split_rhat, summarize


class TestDiagnostics:
    def test_iid_chains(self):
        rng = np.random.default_rng(0)
        samples = rng.standard_normal((4, 2000, 3))
        rhat = split_rhat(samples)
        np.testing.assert_allclose(rhat, 1.0, atol=0.02)
        e = ess(samples)
        assert (e > 0.5 * 4 * 2000).all()

    def test_divergent_chains_flagged(self):
        rng = np.random.default_rng(1)
        samples = rng.standard_normal((4, 1000, 2))
        samples[0] += 5.0  # one chain stuck elsewhere
        rhat = split_rhat(samples)
        assert rhat.max() > 1.5

    def test_autocorrelated_low_ess(self):
        rng = np.random.default_rng(2)
        c, t = 2, 4000
        x = np.zeros((c, t, 1))
        for ch in range(c):
            for i in range(1, t):
                x[ch, i, 0] = 0.95 * x[ch, i - 1, 0] + rng.standard_normal()
        e = ess(x)
        # AR(1) rho=0.95: ESS/N ~ (1-rho)/(1+rho) ~ 0.026
        assert e[0] < 0.1 * c * t

    def test_summarize_on_hmc(self):
        import jax
        import jax.numpy as jnp

        from gaussianvi_tpu.samplers import run_chains

        def log_density(x):
            return -0.5 * jnp.sum(x**2)

        res = run_chains(
            log_density, jnp.zeros((4, 2)), jax.random.key(0),
            num_samples=1000, num_warmup=300, num_leapfrog=8,
        )
        stats = summarize(np.asarray(res.samples))
        assert (stats["rhat"] < 1.05).all()
        assert (stats["ess"] > 200).all()
        np.testing.assert_allclose(stats["mean"], 0.0, atol=0.15)

class TestRankNormalizedRhat:
    def test_iid_chains_near_one(self):
        from gaussianvi_tpu.samplers import rank_normalized_rhat

        rng = np.random.default_rng(3)
        samples = rng.standard_normal((4, 2000, 3))
        r = rank_normalized_rhat(samples)
        np.testing.assert_allclose(r, 1.0, atol=0.02)

    def test_heavy_tails_stay_finite(self):
        """Cauchy chains: plain R-hat is undefined-variance territory; the
        rank-normalized version stays calibrated near 1 for iid chains."""
        from gaussianvi_tpu.samplers import rank_normalized_rhat

        rng = np.random.default_rng(4)
        samples = rng.standard_cauchy((4, 2000, 2))
        r = rank_normalized_rhat(samples)
        assert np.isfinite(r).all()
        np.testing.assert_allclose(r, 1.0, atol=0.03)

    def test_scale_mismatch_flagged_by_folding(self):
        """One chain with 3x the spread but the same mean: location-based
        split-R-hat barely moves, the folded term catches it."""
        from gaussianvi_tpu.samplers import rank_normalized_rhat

        rng = np.random.default_rng(5)
        samples = rng.standard_normal((4, 1000, 1))
        samples[0] *= 3.0
        plain = split_rhat(samples)
        ranked = rank_normalized_rhat(samples)
        assert ranked.max() > 1.1
        assert ranked.max() > plain.max()

    def test_location_mismatch_flagged(self):
        from gaussianvi_tpu.samplers import rank_normalized_rhat

        rng = np.random.default_rng(6)
        samples = rng.standard_normal((4, 1000, 2))
        samples[1] += 4.0
        assert rank_normalized_rhat(samples).max() > 1.5
