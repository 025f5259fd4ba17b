"""Multi-device SPMD tests on the virtual 8-CPU mesh.

What the reference cannot test at all (it has no distributed backend,
SURVEY.md section 5.8): the factor-parallel psum gradient assembly must be
bitwise-consistent with the single-device path, and data-parallel problems
must not interact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianvi_tpu.examples.chain_estimation import build_chain_estimation
from gaussianvi_tpu.inference import GVIConfig, optimize
from gaussianvi_tpu.parallel import make_mesh, sharded_ngd_step, stack_problems


@pytest.fixture(scope="module")
def problems():
    out = []
    for seed in range(2):
        graph, init, _ = build_chain_estimation(
            num_states=8, dim_x=1, gh_degree=4, seed=seed
        )
        out.append((graph, init))
    return out


class TestShardedStep:
    def test_matches_single_device(self, problems):
        assert len(jax.devices()) >= 8
        mesh = make_mesh(dp=2, fp=4)
        graphs, states = zip(*problems)
        graph_b, state_b = stack_problems(list(graphs), list(states))
        config = GVIConfig(niters=1, step_size_base=0.9)
        new_state_b, costs = sharded_ngd_step(graph_b, state_b, config, mesh)

        # single-device reference: one optimize iteration per problem
        for i, (graph, init) in enumerate(problems):
            cfg = GVIConfig(niters=1, niters_lowtemp=10, step_size_base=0.9)
            final, hist = optimize(graph, init, cfg, method="ngd")
            np.testing.assert_allclose(costs[i], hist.cost[0], rtol=1e-10)
            np.testing.assert_allclose(
                new_state_b.mu[i], final.mu, rtol=1e-8, atol=1e-10
            )
            np.testing.assert_allclose(
                new_state_b.precision.diag[i],
                final.precision.diag,
                rtol=1e-8, atol=1e-10,
            )

    def test_fp_only_mesh(self, problems):
        mesh = make_mesh(dp=1, fp=8)
        graph, init = problems[0]
        graph_b, state_b = stack_problems([graph], [init])
        config = GVIConfig(niters=1, step_size_base=0.9)
        new_state_b, costs = sharded_ngd_step(graph_b, state_b, config, mesh)
        assert np.isfinite(np.asarray(costs)).all()
        assert np.isfinite(np.asarray(new_state_b.mu)).all()

    def test_prox_sharded_runs(self, problems):
        mesh = make_mesh(dp=1, fp=4)
        graph, init = problems[0]
        graph_b, state_b = stack_problems([graph], [init])
        config = GVIConfig(niters=1, step_size_base=0.1)
        new_state_b, costs = sharded_ngd_step(
            graph_b, state_b, config, mesh, method="prox"
        )
        assert np.isfinite(np.asarray(costs)).all()
        assert np.isfinite(np.asarray(new_state_b.mu)).all()

    def test_dp_only_mesh(self, problems):
        mesh = make_mesh(dp=2, fp=1)
        graphs, states = zip(*problems)
        graph_b, state_b = stack_problems(list(graphs), list(states))
        config = GVIConfig(niters=1, step_size_base=0.9)
        _, costs = sharded_ngd_step(graph_b, state_b, config, mesh)
        # independent problems: same as 2x4 mesh result
        mesh2 = make_mesh(dp=2, fp=4)
        _, costs2 = sharded_ngd_step(graph_b, state_b, config, mesh2)
        np.testing.assert_allclose(costs, costs2, rtol=1e-12)
