"""Sequence-parallel (time-axis sharded) chain inference vs the
single-device engines, on the virtual 8-CPU mesh.

This is the multi-device realization of SURVEY.md section 5.7's sequence
parallelism: N states sharded over the ``sp`` mesh axis, boundary coupling
via all_gather of tiny segment summaries + ppermute of boundary pivots.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from gaussianvi_tpu.ops.blocktridiag import (
    BlockTridiag,
    gbp_covariance_logdet,
    solve,
)
from gaussianvi_tpu.parallel.chain_seqpar import (
    gbp_covariance_logdet_seqpar,
    pad_off_for_seqpar,
    solve_seqpar,
)


def random_chain(key, n, s):
    k1, k2, k3 = jax.random.split(key, 3)
    a = jax.random.normal(k1, (n, s, s)) * 0.3
    diag = a @ jnp.swapaxes(a, -1, -2) + 3.0 * jnp.eye(s)
    off = jax.random.normal(k2, (n - 1, s, s)) * 0.2
    rhs = jax.random.normal(k3, (n, s))
    return BlockTridiag(diag, off), rhs


def sp_mesh(p):
    return Mesh(np.asarray(jax.devices()[:p]), ("sp",))


@pytest.mark.parametrize("p,n,s", [(8, 32, 3), (4, 8, 4), (2, 16, 2)])
class TestSeqParChain:
    def test_covariance_logdet(self, p, n, s):
        assert len(jax.devices()) >= p
        A, _ = random_chain(jax.random.key(n * 10 + s), n, s)
        off_pad = pad_off_for_seqpar(A.off)

        @jax.jit
        def run(diag, off):
            f = jax.shard_map(
                lambda d, o: gbp_covariance_logdet_seqpar(d, o, "sp"),
                mesh=sp_mesh(p),
                in_specs=(P("sp"), P("sp")),
                out_specs=(P("sp"), P("sp"), P()),
            )
            return f(diag, off)

        cd, co, ld = run(A.diag, off_pad)
        rcd, rco, rld = gbp_covariance_logdet(A)
        np.testing.assert_allclose(cd, rcd, rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(co[:-1], rco, rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(co[-1], 0.0)  # padding row
        np.testing.assert_allclose(float(ld), float(rld), rtol=1e-11)

    def test_solve(self, p, n, s):
        A, rhs = random_chain(jax.random.key(n * 7 + s), n, s)
        off_pad = pad_off_for_seqpar(A.off)

        @jax.jit
        def run(diag, off, b):
            f = jax.shard_map(
                lambda d, o, bb: solve_seqpar(d, o, bb, "sp"),
                mesh=sp_mesh(p),
                in_specs=(P("sp"), P("sp"), P("sp")),
                out_specs=P("sp"),
            )
            return f(diag, off, b)

        x = run(A.diag, off_pad, rhs)
        x_ref = solve(A, rhs.reshape(-1)).reshape(n, s)
        np.testing.assert_allclose(x, x_ref, rtol=1e-8, atol=1e-10)

    def test_residual_is_zero(self, p, n, s):
        """A x == b through the sharded solve (independent of the
        reference implementation)."""
        A, rhs = random_chain(jax.random.key(n + s), n, s)
        off_pad = pad_off_for_seqpar(A.off)

        @jax.jit
        def run(diag, off, b):
            f = jax.shard_map(
                lambda d, o, bb: solve_seqpar(d, o, bb, "sp"),
                mesh=sp_mesh(p),
                in_specs=(P("sp"), P("sp"), P("sp")),
                out_specs=P("sp"),
            )
            return f(diag, off, b)

        x = run(A.diag, off_pad, rhs)
        resid = A.matvec(x.reshape(-1)) - rhs.reshape(-1)
        np.testing.assert_allclose(resid, 0.0, atol=1e-9)


class TestSingleSegmentDegenerate:
    def test_one_device_matches(self):
        """p=1: no cross-device folding at all; pure local path."""
        A, rhs = random_chain(jax.random.key(0), 6, 3)
        off_pad = pad_off_for_seqpar(A.off)

        @jax.jit
        def run(diag, off, b):
            f = jax.shard_map(
                lambda d, o, bb: (
                    *gbp_covariance_logdet_seqpar(d, o, "sp"),
                    solve_seqpar(d, o, bb, "sp"),
                ),
                mesh=sp_mesh(1),
                in_specs=(P("sp"), P("sp"), P("sp")),
                out_specs=(P("sp"), P("sp"), P(), P("sp")),
            )
            return f(diag, off, b)

        cd, co, ld, x = run(A.diag, off_pad, rhs)
        rcd, rco, rld = gbp_covariance_logdet(A)
        np.testing.assert_allclose(cd, rcd, rtol=1e-10)
        np.testing.assert_allclose(float(ld), float(rld), rtol=1e-11)
        np.testing.assert_allclose(
            x, solve(A, rhs.reshape(-1)).reshape(6, 3), rtol=1e-9
        )


class TestTimeShardedStep:
    """Full NGD iteration with the trajectory axis sharded over sp."""

    def test_matches_single_device_iteration(self):
        from gaussianvi_tpu.examples.chain_estimation import (
            build_chain_estimation,
        )
        from gaussianvi_tpu.inference import GVIConfig, optimize
        from gaussianvi_tpu.parallel import (
            sharded_time_ngd_step,
            to_chain_layout,
        )

        graph, init, _ = build_chain_estimation(
            num_states=16, dim_x=1, gh_degree=4, seed=0
        )
        chain_graph = to_chain_layout(graph)
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("sp",))
        config = GVIConfig(niters=1, step_size_base=0.9)

        new_state, cost0 = sharded_time_ngd_step(
            chain_graph, init, config, mesh
        )

        ref_state, hist = optimize(graph, init, config, method="ngd")
        np.testing.assert_allclose(float(cost0), float(hist.cost[0]),
                                   rtol=1e-10)
        np.testing.assert_allclose(new_state.mu, ref_state.mu,
                                   rtol=1e-7, atol=1e-9)
        np.testing.assert_allclose(
            new_state.precision.diag, ref_state.precision.diag,
            rtol=1e-7, atol=1e-9,
        )
        np.testing.assert_allclose(
            new_state.precision.off, ref_state.precision.off,
            rtol=1e-7, atol=1e-9,
        )

    def test_multiple_steps_descend(self):
        from gaussianvi_tpu.examples.chain_estimation import (
            build_chain_estimation,
        )
        from gaussianvi_tpu.inference import GVIConfig
        from gaussianvi_tpu.parallel import (
            sharded_time_ngd_step,
            to_chain_layout,
        )

        graph, state, _ = build_chain_estimation(
            num_states=8, dim_x=1, gh_degree=4, seed=1
        )
        chain_graph = to_chain_layout(graph)
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
        config = GVIConfig(niters=1, step_size_base=0.9)
        costs = []
        for _ in range(4):
            state, c = sharded_time_ngd_step(chain_graph, state, config, mesh)
            costs.append(float(c))
        assert costs == sorted(costs, reverse=True)
        assert np.isfinite(np.asarray(state.mu)).all()

    def test_layout_rejects_binary_nonlinear(self):
        from gaussianvi_tpu.examples.chain_estimation import (
            build_chain_estimation,
        )
        from gaussianvi_tpu.parallel import to_chain_layout
        from dataclasses import replace as dc_replace

        graph, _, _ = build_chain_estimation(
            num_states=4, dim_x=1, gh_degree=3
        )
        bad = graph._replace(
            nonlinear=tuple(
                dc_replace(fb, nb=2) for fb in graph.nonlinear
            )
        ) if hasattr(graph, "_replace") else None
        if bad is None:
            import dataclasses
            bad = dataclasses.replace(
                graph,
                nonlinear=tuple(
                    dc_replace(fb, nb=2) for fb in graph.nonlinear
                ),
            )
        with pytest.raises(ValueError):
            to_chain_layout(bad)


class TestOptimizeTimeSharded:
    """The FULL loop time-sharded (VERDICT round-1 item 3)."""

    def test_multi_iteration_matches_optimize(self):
        from gaussianvi_tpu.examples.chain_estimation import (
            build_chain_estimation,
        )
        from gaussianvi_tpu.inference import GVIConfig, optimize
        from gaussianvi_tpu.parallel import (
            optimize_time_sharded,
            to_chain_layout,
        )

        graph, init, _ = build_chain_estimation(
            num_states=16, dim_x=1, gh_degree=4, seed=0
        )
        chain_graph = to_chain_layout(graph)
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("sp",))
        # crosses the scheduled high-temperature switch at iteration 2
        config = GVIConfig(
            niters=5, niters_lowtemp=2, temperature=0.5,
            high_temperature=4.0, step_size_base=0.9,
        )
        final_sh, hist_sh = optimize_time_sharded(
            chain_graph, init, config, mesh
        )
        final, hist = optimize(graph, init, config, method="ngd")
        np.testing.assert_allclose(
            hist_sh.cost, hist.cost, rtol=1e-9, atol=1e-12
        )
        np.testing.assert_allclose(
            hist_sh.accepted_step, hist.accepted_step, rtol=1e-12
        )
        np.testing.assert_allclose(final_sh.mu, final.mu, rtol=1e-7,
                                   atol=1e-9)
        np.testing.assert_allclose(
            final_sh.precision.diag, final.precision.diag, rtol=1e-7,
            atol=1e-9,
        )
        np.testing.assert_allclose(
            final_sh.precision.off, final.precision.off, rtol=1e-7,
            atol=1e-9,
        )
        np.testing.assert_allclose(hist_sh.mu, hist.mu, rtol=1e-7, atol=1e-9)

    def test_prox_time_sharded_matches(self):
        """Prox (BW-JKO) time-sharded: padded-row masking must make the
        chain-layout graph equivalent to the original."""
        from gaussianvi_tpu.examples.chain_estimation import (
            build_chain_estimation,
        )
        from gaussianvi_tpu.inference import GVIConfig, optimize
        from gaussianvi_tpu.parallel import (
            optimize_time_sharded,
            to_chain_layout,
        )

        graph, init, _ = build_chain_estimation(
            num_states=8, dim_x=1, gh_degree=4, seed=1
        )
        chain_graph = to_chain_layout(graph)
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
        config = GVIConfig(niters=3, step_size_base=0.3)
        final_sh, hist_sh = optimize_time_sharded(
            chain_graph, init, config, mesh, method="prox"
        )
        final, hist = optimize(graph, init, config, method="prox")
        np.testing.assert_allclose(
            hist_sh.cost, hist.cost, rtol=1e-8, atol=1e-11
        )
        np.testing.assert_allclose(final_sh.mu, final.mu, rtol=1e-7,
                                   atol=1e-9)
        np.testing.assert_allclose(
            final_sh.precision.diag, final.precision.diag, rtol=1e-6,
            atol=1e-9,
        )
