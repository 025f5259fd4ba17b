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


class TestOptimizeSharded:
    """The FULL loop sharded (VERDICT round-1 item 3): multi-iteration
    optimize_sharded must reproduce optimize() trajectories, including the
    temperature schedule and backtracking decisions."""

    def test_multi_iteration_matches_optimize(self, problems):
        from gaussianvi_tpu.parallel.sharding import optimize_sharded

        mesh = make_mesh(dp=2, fp=4)
        graphs, states = zip(*problems)
        graph_b, state_b = stack_problems(list(graphs), list(states))
        # crosses the scheduled high-temperature switch at iteration 3
        config = GVIConfig(
            niters=6, niters_lowtemp=3, temperature=0.5,
            high_temperature=5.0, step_size_base=0.9,
        )
        state_sh, hist_sh = optimize_sharded(graph_b, state_b, config, mesh)

        for i, (graph, init) in enumerate(problems):
            final, hist = optimize(graph, init, config, method="ngd")
            np.testing.assert_allclose(
                hist_sh.cost[i], hist.cost, rtol=1e-9, atol=1e-12
            )
            np.testing.assert_allclose(
                state_sh.mu[i], final.mu, rtol=1e-7, atol=1e-10
            )
            np.testing.assert_allclose(
                state_sh.precision.diag[i], final.precision.diag,
                rtol=1e-7, atol=1e-10,
            )
            np.testing.assert_allclose(
                hist_sh.accepted_step[i], hist.accepted_step, rtol=1e-12
            )
            np.testing.assert_allclose(
                hist_sh.mu[i], hist.mu, rtol=1e-7, atol=1e-10
            )

    def test_prox_multi_iteration_matches(self, problems):
        from gaussianvi_tpu.parallel.sharding import optimize_sharded

        mesh = make_mesh(dp=1, fp=4)
        graph, init = problems[0]
        graph_b, state_b = stack_problems([graph], [init])
        config = GVIConfig(niters=4, step_size_base=0.3)
        state_sh, hist_sh = optimize_sharded(
            graph_b, state_b, config, mesh, method="prox"
        )
        final, hist = optimize(graph, init, config, method="prox")
        np.testing.assert_allclose(
            hist_sh.cost[0], hist.cost, rtol=1e-9, atol=1e-12
        )
        np.testing.assert_allclose(
            state_sh.mu[0], final.mu, rtol=1e-7, atol=1e-10
        )

    def test_factor_costs_reassembled(self, problems):
        """The fp-sharded per-factor cost axis must reassemble in the
        original factor order."""
        from gaussianvi_tpu.parallel.sharding import optimize_sharded

        mesh = make_mesh(dp=1, fp=4)
        graph, init = problems[0]
        graph_b, state_b = stack_problems([graph], [init])
        config = GVIConfig(niters=2, step_size_base=0.9)
        _, hist_sh = optimize_sharded(graph_b, state_b, config, mesh)
        _, hist = optimize(graph, init, config, method="ngd")
        np.testing.assert_allclose(
            hist_sh.factor_costs[0], hist.factor_costs, rtol=1e-9, atol=1e-12
        )
