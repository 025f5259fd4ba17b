"""Parallel-restart multi-start optimization."""

import jax
import numpy as np

from gaussianvi_tpu.examples.chain_estimation import build_chain_estimation
from gaussianvi_tpu.inference import GVIConfig
from gaussianvi_tpu.parallel.restarts import optimize_restarts


class TestRestarts:
    def test_best_of_restarts(self):
        graph, init, _ = build_chain_estimation(
            num_states=6, dim_x=1, gh_degree=4
        )
        config = GVIConfig(niters=8, niters_lowtemp=8, step_size_base=0.9)
        best_state, best_cost, costs = optimize_restarts(
            graph, init, jax.random.key(0),
            num_restarts=4, config=config, mean_scale=0.3,
        )
        costs = np.asarray(costs)
        assert costs.shape == (4,)
        assert np.isfinite(best_cost)
        assert float(best_cost) == costs.min()
        assert np.isfinite(np.asarray(best_state.mu)).all()
