"""Lanes Pallas kernels under shard_map (VERDICT r3 item 3).

Multi-chip runs previously forfeited the measured single-chip fast path:
``FactorShardEngine`` hard-pinned scan chain + XLA quadrature.  Now
"auto" resolves against the MESH platform (lanes compiled per shard on a
TPU mesh, scans on a CPU mesh — see ``resolve_sharded_impls``), and these
tests prove the lanes kernels EXECUTE correctly inside shard_map on the
8-device CPU mesh (interpret mode, ``check_vma=False`` — jax 0.9 cannot
trace Pallas interpret mode under the vma type system; compiled TPU
execution under ``check_vma=True`` is covered by tests/device/).
"""

import numpy as np
import pytest
from dataclasses import replace

import jax
import jax.numpy as jnp

from gaussianvi_tpu.examples.chain_estimation import build_chain_estimation
from gaussianvi_tpu.inference import GVIConfig
from gaussianvi_tpu.inference.optimize import optimize
from gaussianvi_tpu.parallel.sharding import (
    make_mesh,
    optimize_sharded,
    resolve_sharded_impls,
    stack_problems,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh"
)


def _problems(num, num_states=6, dim_x=1):
    graphs, states = [], []
    for seed in range(num):
        g, s0, _ = build_chain_estimation(
            num_states=num_states, dim_x=dim_x, gh_degree=3, seed=seed
        )
        graphs.append(g)
        states.append(s0)
    return stack_problems(graphs, states), graphs, states


class TestResolution:
    def test_cpu_mesh_resolves_to_scans(self):
        mesh = make_mesh(4, 2)
        cfg = resolve_sharded_impls(GVIConfig(), mesh)
        assert cfg.chain_impl == "seq"
        assert cfg.quad_impl == "xla"

    def test_explicit_impls_pass_through(self):
        mesh = make_mesh(4, 2)
        cfg = resolve_sharded_impls(
            GVIConfig(chain_impl="lanes", quad_impl="lanes"), mesh
        )
        assert cfg.chain_impl == "lanes"
        assert cfg.quad_impl == "lanes"


class TestShardedLanesEquivalence:
    @pytest.mark.parametrize("method", ["ngd", "prox"])
    def test_sharded_lanes_matches_local(self, method):
        """Full optimize_sharded with the lanes chain+quad kernels running
        in interpret mode inside shard_map vs the local (vmapped) run with
        the SAME impls."""
        (graph_b, state_b), graphs, states = _problems(4)
        mesh = make_mesh(2, 2)
        config = GVIConfig(
            niters=3, niters_lowtemp=3, step_size_base=0.9,
            chain_impl="lanes", quad_impl="lanes",
        )
        st_sh, hist_sh = optimize_sharded(
            graph_b, state_b, config, mesh, method=method, check_vma=False
        )
        for i, (g, s0) in enumerate(zip(graphs, states)):
            st_l, hist_l = optimize(g, s0, config, method=method)
            np.testing.assert_allclose(
                hist_sh.cost[i], hist_l.cost, rtol=1e-7
            )
            np.testing.assert_allclose(st_sh.mu[i], st_l.mu, atol=1e-7)

    def test_dp_only_mesh_runs_fused_kernels(self):
        """On a dp-only mesh (fp=1: parallel restarts across chips) the
        fused trial+gradient kernels stay ENABLED — every device holds
        full factor sets and the fp psums are size-1 no-ops.  Interpret
        mode inside shard_map, vs the local fused run."""
        from gaussianvi_tpu.inference.engine import LocalEngine

        (graph_b, state_b), graphs, states = _problems(4)
        mesh = make_mesh(4, 1)
        config = GVIConfig(
            niters=3, niters_lowtemp=3, step_size_base=0.9,
            chain_impl="lanes", quad_impl="lanes",
        )
        # sanity: the engine keeps the fused paths when fp_size == 1
        from gaussianvi_tpu.parallel.sharding import FactorShardEngine

        g0 = jax.tree.map(lambda x: x[0], graph_b)
        assert FactorShardEngine(g0, config, fp_size=1).fused_trials_ready
        assert FactorShardEngine(
            g0, config, fp_size=1
        ).fused_gradient_ready
        # fp>=2: the trial kernel stays (psum'd reduction) and the
        # gradient runs the SPLIT pair (accum -> psum -> solve)
        eng2 = FactorShardEngine(g0, config, fp_size=2)
        assert eng2.fused_trials_ready
        assert eng2.fused_gradient_ready
        assert eng2._fused_gradient[0] == "sharded"

        st_sh, hist_sh = optimize_sharded(
            graph_b, state_b, config, mesh, check_vma=False
        )
        for i, (g, s0) in enumerate(zip(graphs, states)):
            st_l, hist_l = optimize(g, s0, config, method="ngd")
            np.testing.assert_allclose(
                hist_sh.cost[i], hist_l.cost, rtol=1e-7
            )
            np.testing.assert_allclose(st_sh.mu[i], st_l.mu, atol=1e-7)

    def test_fp_sharded_fused_kernels_match_local(self):
        """Under fp>=2 BOTH fused paths stay on: the trial kernel's
        per-shard costs psum through reduce_trial_costs, and the gradient
        runs the split pair — per-shard "accum" kernels, ONE psum of
        (Vdmu, Vddmu) over fp, and a "solve" kernel (VERDICT r4 item 1).
        The whole optimize_sharded trajectory must match the local fused
        run."""
        from gaussianvi_tpu.parallel.sharding import FactorShardEngine

        (graph_b, state_b), graphs, states = _problems(2, num_states=8)
        mesh = make_mesh(2, 2)
        config = GVIConfig(
            niters=3, niters_lowtemp=3, step_size_base=0.9,
            chain_impl="lanes", quad_impl="lanes",
        )
        g0 = jax.tree.map(lambda x: x[0], graph_b)
        eng = FactorShardEngine(g0, config, fp_size=2)
        assert eng.fused_trials_ready
        assert eng.fused_gradient_ready
        assert eng._fused_gradient[0] == "sharded"

        st_sh, hist_sh = optimize_sharded(
            graph_b, state_b, config, mesh, check_vma=False
        )
        for i, (g, s0) in enumerate(zip(graphs, states)):
            st_l, hist_l = optimize(g, s0, config, method="ngd")
            np.testing.assert_allclose(
                hist_sh.cost[i], hist_l.cost, rtol=1e-7
            )
            np.testing.assert_allclose(st_sh.mu[i], st_l.mu, atol=1e-7)

    @pytest.mark.parametrize("fp", [2, 4])
    def test_fp_sharded_split_gradient_bitmatch(self, fp):
        """The split gradient pair's outputs at fp=2/4 match the LOCAL
        single-kernel fused gradient on identical inputs (interpret mode;
        the psum reassociation is the only allowed difference)."""
        from functools import partial

        from jax.sharding import PartitionSpec as P

        from gaussianvi_tpu.inference.engine import LocalEngine
        from gaussianvi_tpu.parallel.sharding import (
            FactorShardEngine,
            _graph_specs,
            _null_nonlinear_slice_offsets,
            _state_spec,
        )

        (graph_b, state_b), graphs, states = _problems(
            1, num_states=8, dim_x=1
        )
        mesh = make_mesh(1, fp)
        config = GVIConfig(chain_impl="lanes", quad_impl="lanes")

        graph_spec = _graph_specs(graph_b, batched=True)
        state_spec = _state_spec(batched=True)
        out_spec = (P("dp"), P("dp"), P("dp"), P("dp"), P("dp"),
                    P("dp"), P("dp"))

        @partial(jax.shard_map, mesh=mesh,
                 in_specs=(graph_spec, state_spec), out_specs=out_spec,
                 check_vma=False)
        def run(graph_loc, state_loc):
            graph_loc = _null_nonlinear_slice_offsets(graph_loc)

            def one(g, s):
                eng = FactorShardEngine(g, config, fp_size=fp)
                covd, covo, ld, dprec, dmu, dfb = eng.fused_gradient(
                    s, jnp.asarray(1.0, s.mu.dtype)
                )
                return covd, covo, ld, dprec.diag, dprec.off, dmu, dfb

            return jax.vmap(one)(graph_loc, state_loc)

        out_sh = jax.jit(run)(graph_b, state_b)

        eng_l = LocalEngine(graphs[0], config)
        out_l = eng_l.fused_gradient(
            states[0], jnp.asarray(1.0, jnp.float32)
        )
        out_l = (out_l[0], out_l[1], out_l[2], out_l[3].diag,
                 out_l[3].off, out_l[4], out_l[5])
        for a, b in zip(out_sh, out_l):
            np.testing.assert_allclose(
                np.asarray(a)[0], np.asarray(b), rtol=2e-5, atol=1e-6
            )

    def test_sharded_lanes_matches_sharded_scans(self):
        """The two sharded backends agree with each other (same psum
        structure, different chain/quad kernels)."""
        (graph_b, state_b), _, _ = _problems(4)
        mesh = make_mesh(2, 2)
        base = GVIConfig(niters=3, niters_lowtemp=3, step_size_base=0.9)
        st_l, hist_l = optimize_sharded(
            graph_b, state_b,
            replace(base, chain_impl="lanes", quad_impl="lanes"),
            mesh, check_vma=False,
        )
        st_s, hist_s = optimize_sharded(
            graph_b, state_b,
            replace(base, chain_impl="seq", quad_impl="xla"),
            mesh,
        )
        np.testing.assert_allclose(hist_l.cost, hist_s.cost, rtol=1e-7)
        np.testing.assert_allclose(st_l.mu, st_s.mu, atol=1e-7)
