"""Posterior-validation harness: GVI vs samplers on a tractable target.

On a linear-Gaussian graph GVI is exact, so HMC moments must agree with the
converged variational posterior within Monte-Carlo error — the full
north-star loop (optimize -> sample -> compare) in one test.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gaussianvi_tpu.factors.priors import fixed_prior, minimum_acc_prior
from gaussianvi_tpu.inference import (
    FactorGraph,
    GaussianState,
    GVIConfig,
    optimize,
)
from gaussianvi_tpu.inference.introspect import factor_expectations, marginals
from gaussianvi_tpu.ops import BlockTridiag
from gaussianvi_tpu.samplers import validate_posterior


def small_linear_graph(num_states=4, state_dim=2, seed=7):
    rng = np.random.default_rng(seed)
    anchor = fixed_prior(
        0, rng.standard_normal(state_dim), 0.5 * np.eye(state_dim)
    )
    tail = fixed_prior(
        num_states - 1, rng.standard_normal(state_dim),
        0.5 * np.eye(state_dim),
    )
    gp = minimum_acc_prior(np.eye(state_dim // 2), 0.3, num_states)
    return FactorGraph(
        num_states=num_states, state_dim=state_dim,
        linear=(anchor, tail, gp),
    )


class TestValidationHarness:
    def test_gvi_matches_hmc_on_linear_gaussian(self):
        graph = small_linear_graph()
        init = GaussianState(
            jnp.zeros((4, 2)), BlockTridiag.identity(4, 2, 2.0)
        )
        config = GVIConfig(
            niters=25, niters_lowtemp=25, step_size_base=0.9,
            high_temperature=1.0,
        )
        final, _ = optimize(graph, init, config, method="ngd")
        report = validate_posterior(
            graph, final, jax.random.key(0), sampler="hmc",
            num_samples=6000, num_warmup=1500, num_leapfrog=12,
        )
        assert report.mean_abs_err < 0.1
        assert report.cov_rel_err < 0.25

    def test_introspection_accessors(self):
        from gaussianvi_tpu.examples import build_barfoot_1d, run_barfoot_1d

        graph, _, _ = build_barfoot_1d()
        final, _ = run_barfoot_1d("ngd")
        exps = factor_expectations(graph, final)
        assert len(exps) == 1
        assert exps[0]["e_phi"].shape == (1,)
        assert np.isfinite(float(exps[0]["e_phi"][0]))
        mu, cov = marginals(graph, final)
        assert mu.shape == (1, 1) and cov.shape == (1, 1, 1)
