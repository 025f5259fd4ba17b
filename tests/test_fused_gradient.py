"""Fused NGD gradient kernel (kernels/fused_gradient.py).

Interpret-mode (CPU) validation: the fused covariance + moments + assembly
+ double-Thomas-solve kernel must reproduce the separate-kernel path
(cov_logdet / ngd_gradients / solve_pair) exactly, both as a unit and
end-to-end through the optimizer, for single problems and stacked/vmapped
batches.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from dataclasses import replace

from gaussianvi_tpu.examples.chain_estimation import build_chain_estimation
from gaussianvi_tpu.inference import GVIConfig
from gaussianvi_tpu.inference.engine import LocalEngine
from gaussianvi_tpu.inference.optimize import optimize


def _configs(niters=6):
    base = GVIConfig(
        niters=niters, niters_lowtemp=niters, step_size_base=0.9,
        chain_impl="lanes",
    )
    return base, replace(base, fused_gradient="off")


class TestEligibility:
    def test_engine_builds_fused_gradient(self):
        graph, _, _ = build_chain_estimation(
            num_states=8, dim_x=2, gh_degree=4
        )
        config, config_off = _configs()
        assert LocalEngine(graph, config).fused_gradient_ready
        assert not LocalEngine(graph, config_off).fused_gradient_ready
        # unlike the trial kernel, seq linesearch does NOT disqualify it
        assert LocalEngine(
            graph, replace(config, linesearch="seq")
        ).fused_gradient_ready
        with pytest.raises(ValueError):
            LocalEngine(
                graph,
                replace(config, quad_impl="xla", fused_gradient="on"),
            )

    def test_no_lanes_cost_disables(self):
        graph, _, _ = build_chain_estimation(
            num_states=8, dim_x=2, gh_degree=4
        )
        graph = replace(
            graph,
            nonlinear=tuple(
                replace(fb, lanes_cost=None) for fb in graph.nonlinear
            ),
        )
        config, _ = _configs()
        assert not LocalEngine(graph, config).fused_gradient_ready


class TestUnit:
    @pytest.mark.parametrize("num_states,dim_x", [(8, 2), (5, 1)])
    def test_matches_separate_path(self, num_states, dim_x):
        """Direct kernel outputs vs cov_logdet + ngd_gradients + solve_pair
        at the initial iterate (where Vddmu is typically indefinite, so the
        NaN pattern of the main solve must also agree)."""
        graph, init, _ = build_chain_estimation(
            num_states=num_states, dim_x=dim_x, gh_degree=4, seed=0
        )
        config, _ = _configs()
        eng = LocalEngine(graph, config)
        assert eng.fused_gradient_ready
        t = jnp.asarray(1.0)
        covd, covo, ld, dprec, dmu, dfb = jax.jit(
            lambda s: eng.fused_gradient(s, t)
        )(init)

        cd, co, ld2 = eng.cov_logdet(init.precision)
        vdmu, vddmu = eng.ngd_gradients(init.mu, cd, co, t)
        dprec2 = vddmu - init.precision
        dmu2, dfb2 = eng.solve_pair(vddmu, init.precision, -vdmu)

        np.testing.assert_allclose(covd, cd, atol=1e-12)
        np.testing.assert_allclose(covo, co, atol=1e-12)
        np.testing.assert_allclose(ld, ld2, atol=1e-11)
        np.testing.assert_allclose(dprec.diag, dprec2.diag, atol=1e-10)
        np.testing.assert_allclose(dprec.off, dprec2.off, atol=1e-10)
        np.testing.assert_allclose(dfb, dfb2, atol=1e-10)
        # main solve: identical NaN pattern (indefinite Vddmu), identical
        # values where finite
        finite = np.isfinite(np.asarray(dmu2))
        np.testing.assert_array_equal(np.isfinite(np.asarray(dmu)), finite)
        np.testing.assert_allclose(
            np.where(finite, np.asarray(dmu), 0.0),
            np.where(finite, np.asarray(dmu2), 0.0),
            atol=1e-10,
        )

    def test_grid_chunking_bitmatch(self, monkeypatch):
        """Large batches split into multiple pallas calls of <= _MAX_GRID
        grid steps (the scoped-vmem stack OOM guard, PERF section 32) —
        outputs must be bit-identical to the single-call layout."""
        from gaussianvi_tpu.kernels import fused_gradient as fg

        graph, init, _ = build_chain_estimation(
            num_states=6, dim_x=1, gh_degree=3, seed=0
        )
        config, _ = _configs()
        eng = LocalEngine(graph, config)
        nl_specs, lin_specs, flat, eval_dtype, _ = eng._fused_spec_cache
        b = 300
        rep = lambda x: jnp.broadcast_to(x[None], (b,) + x.shape)
        mu = rep(init.mu) + 0.01 * jnp.arange(b)[:, None, None]
        pd, po = rep(init.precision.diag), rep(init.precision.off)
        temp = jnp.ones((b,))
        shared = []
        for sp in nl_specs:
            if sp.slice_offset is None:
                shared.append(True)
            shared += [True, True] + [False] * len(sp.param_shapes)
        for sp in lin_specs:
            if sp.slice_offset is None:
                shared.append(True)
            shared += [False] * 4

        def regroup(args):
            pos, nl_arrays, lin_arrays = 0, [], []
            for sp in nl_specs:
                st = None
                if sp.slice_offset is None:
                    st = args[pos]
                    pos += 1
                nd, w = args[pos], args[pos + 1]
                pos += 2
                lv = tuple(rep(x)
                           for x in args[pos:pos + len(sp.param_shapes)])
                pos += len(sp.param_shapes)
                nl_arrays.append((st, nd, w, lv))
            for sp in lin_specs:
                st = None
                if sp.slice_offset is None:
                    st = args[pos]
                    pos += 1
                a, lm, pm, pc = (rep(x) for x in args[pos:pos + 4])
                pos += 4
                lin_arrays.append((st, a, lm, pm, pc))
            return tuple(nl_arrays), tuple(lin_arrays)

        nl_arrays, lin_arrays = regroup(list(flat))
        # rb=1 -> grid_b = 3 at b=300; _MAX_GRID=1 forces 3 chunked calls
        monkeypatch.setattr(fg, "_layout_grad", lambda *a, **k: 1)
        single = fg.gradient_lanes(
            mu, pd, po, temp, nl_specs, lin_specs, nl_arrays, lin_arrays
        )
        monkeypatch.setattr(fg, "_MAX_GRID", 1)
        chunked = fg.gradient_lanes(
            mu, pd, po, temp, nl_specs, lin_specs, nl_arrays, lin_arrays
        )
        for a, c in zip(single, chunked):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))

    def test_dynamic_starts_path(self):
        """Non-consecutive factor supports (slice_offset None, SMEM starts
        dispatch in-kernel) — the hand-unrolled branch the slice-offset
        tests never reach.  Scrambled subset of states, anchors included."""
        import jax.numpy as jnp
        from dataclasses import replace as dreplace

        graph, init, _ = build_chain_estimation(
            num_states=8, dim_x=2, gh_degree=4, seed=0
        )
        fb = graph.nonlinear[0]
        order = np.asarray([5, 0, 3, 7, 2], dtype=np.int32)
        fb_scr = dreplace(
            fb,
            start=jnp.asarray(order),
            params=jax.tree.map(lambda l: l[order], fb.params),
            slice_offset=None,
        )
        graph = dreplace(graph, nonlinear=(fb_scr,))
        from dataclasses import replace as drep

        config, config_off = _configs()
        config_off = drep(config_off, fused_trials="off")
        eng = LocalEngine(graph, config)
        assert eng.fused_gradient_ready
        assert eng.fused_trials_ready
        st_f, hist_f = optimize(graph, init, config, method="ngd")
        st_o, hist_o = optimize(graph, init, config_off, method="ngd")
        np.testing.assert_allclose(hist_f.cost, hist_o.cost, rtol=1e-9)
        np.testing.assert_allclose(st_f.mu, st_o.mu, atol=1e-10)
        np.testing.assert_allclose(
            hist_f.cov_diag, hist_o.cov_diag, atol=1e-9
        )

    def test_temperature_division(self):
        """The temperature enters the fused kernel as a per-lane operand;
        gradients at T=10 must equal the separate path at T=10."""
        graph, init, _ = build_chain_estimation(
            num_states=6, dim_x=2, gh_degree=4, seed=1
        )
        config, _ = _configs()
        eng = LocalEngine(graph, config)
        t = jnp.asarray(10.0)
        *_, dprec, _, dfb = eng.fused_gradient(init, t)
        cd, co, _ = eng.cov_logdet(init.precision)
        vdmu, vddmu = eng.ngd_gradients(init.mu, cd, co, t)
        dprec2 = vddmu - init.precision
        _, dfb2 = eng.solve_pair(vddmu, init.precision, -vdmu)
        np.testing.assert_allclose(dprec.diag, dprec2.diag, atol=1e-10)
        np.testing.assert_allclose(dfb, dfb2, atol=1e-10)


class TestEndToEnd:
    def test_fused_matches_separate(self):
        graph, init, _ = build_chain_estimation(
            num_states=8, dim_x=2, gh_degree=4, seed=0
        )
        config, config_off = _configs()
        st_f, hist_f = optimize(graph, init, config, method="ngd")
        st_o, hist_o = optimize(graph, init, config_off, method="ngd")
        np.testing.assert_allclose(hist_f.cost, hist_o.cost, rtol=1e-9)
        np.testing.assert_allclose(st_f.mu, st_o.mu, atol=1e-10)
        np.testing.assert_allclose(
            st_f.precision.diag, st_o.precision.diag, atol=1e-9
        )
        np.testing.assert_allclose(
            hist_f.factor_costs, hist_o.factor_costs, atol=1e-10
        )
        np.testing.assert_allclose(
            hist_f.accepted_step, hist_o.accepted_step, atol=0
        )
        # the recorded covariance comes from the gradient kernel on the
        # fused path (no separate chain call) — must match the carried one
        np.testing.assert_allclose(
            hist_f.cov_diag, hist_o.cov_diag, atol=1e-9
        )
        np.testing.assert_allclose(
            hist_f.cov_off, hist_o.cov_off, atol=1e-9
        )

    def test_fused_grad_without_fused_trials(self):
        """fused_gradient composes with fused_trials='off' (separate
        batched line search carries trial covariances)."""
        graph, init, _ = build_chain_estimation(
            num_states=8, dim_x=2, gh_degree=4, seed=2
        )
        config, config_off = _configs()
        config = replace(config, fused_trials="off")
        st_f, hist_f = optimize(graph, init, config, method="ngd")
        st_o, hist_o = optimize(
            graph, init, replace(config_off, fused_trials="off"),
            method="ngd",
        )
        np.testing.assert_allclose(hist_f.cost, hist_o.cost, rtol=1e-9)
        np.testing.assert_allclose(st_f.mu, st_o.mu, atol=1e-10)
        np.testing.assert_allclose(
            hist_f.cov_diag, hist_o.cov_diag, atol=1e-9
        )

    def test_seq_linesearch_composes(self):
        graph, init, _ = build_chain_estimation(
            num_states=6, dim_x=1, gh_degree=4, seed=0
        )
        config, config_off = _configs(niters=4)
        config = replace(config, linesearch="seq")
        config_off = replace(config_off, linesearch="seq")
        _, hist_f = optimize(graph, init, config, method="ngd")
        _, hist_o = optimize(graph, init, config_off, method="ngd")
        np.testing.assert_allclose(hist_f.cost, hist_o.cost, rtol=1e-9)

    def test_vmapped_stacked_problems(self):
        from gaussianvi_tpu.parallel.sharding import stack_problems

        graphs, states = [], []
        for seed in range(3):
            g, s0, _ = build_chain_estimation(
                num_states=8, dim_x=2, gh_degree=4, seed=seed
            )
            graphs.append(g)
            states.append(s0)
        graph_b, state_b = stack_problems(graphs, states)
        config, config_off = _configs(niters=4)
        run = jax.jit(jax.vmap(
            lambda g, s: optimize(g, s, config, method="ngd")
        ))
        st_b, hist_b = run(graph_b, state_b)
        for i, (g, s0) in enumerate(zip(graphs, states)):
            ref_st, ref_hist = optimize(g, s0, config_off, method="ngd")
            np.testing.assert_allclose(
                hist_b.cost[i], ref_hist.cost, rtol=1e-9
            )
            np.testing.assert_allclose(st_b.mu[i], ref_st.mu, atol=1e-10)

    def test_temperature_escalation_path(self):
        """A run that crosses the scheduled high-temperature switch: the
        in-kernel 1/T division must track the carried temperature."""
        graph, init, _ = build_chain_estimation(
            num_states=8, dim_x=2, gh_degree=4, seed=0
        )
        base = GVIConfig(
            niters=8, niters_lowtemp=3, step_size_base=0.9,
            chain_impl="lanes",
        )
        _, hist_f = optimize(graph, init, base, method="ngd")
        _, hist_o = optimize(
            graph, init, replace(base, fused_gradient="off"), method="ngd"
        )
        np.testing.assert_allclose(hist_f.cost, hist_o.cost, rtol=1e-9)
        np.testing.assert_allclose(
            hist_f.accepted_step, hist_o.accepted_step, atol=0
        )


class TestLanesPrepComposition:
    def test_patch_planner_runs_fused_gradient(self):
        """lanes_prep (SDF patch) batches are gradient-kernel eligible:
        the patches depend only on the CURRENT means, computed per call
        and spliced into the reserved operand slots.  The trial kernel
        stays off (its trial means only exist in-kernel)."""
        from gaussianvi_tpu.examples.point3d_planning import (
            build_point3d_planning,
        )

        graph, init, cfg, _ = build_point3d_planning(
            gh_degree=3, patch_size=8
        )
        cfg = replace(cfg, niters=3, niters_lowtemp=3,
                      chain_impl="lanes", quad_impl="lanes")
        eng = LocalEngine(graph, cfg)
        assert eng.fused_gradient_ready
        assert not eng.fused_trials_ready
        st_f, h_f = optimize(graph, init, cfg, method="ngd")
        st_o, h_o = optimize(
            graph, init, replace(cfg, fused_gradient="off"), method="ngd"
        )
        np.testing.assert_allclose(h_f.cost, h_o.cost, rtol=1e-9)
        np.testing.assert_allclose(st_f.mu, st_o.mu, atol=1e-10)


class TestEvalDtypeComposition:
    def test_bf16_keeps_fused_ready(self):
        graph, _, _ = build_chain_estimation(
            num_states=8, dim_x=2, gh_degree=4
        )
        config, _ = _configs()
        eng = LocalEngine(
            graph, replace(config, moments_eval_dtype="bfloat16")
        )
        assert eng.fused_gradient_ready
        assert eng.fused_grad_eval_dtype == jnp.dtype(jnp.bfloat16)
        assert not LocalEngine(
            graph, replace(config, moments_eval_dtype="float16")
        ).fused_gradient_ready

    def test_bf16_fused_matches_bf16_separate(self):
        graph, init, _ = build_chain_estimation(
            num_states=8, dim_x=2, gh_degree=4, seed=0
        )
        config, config_off = _configs()
        config = replace(config, moments_eval_dtype="bfloat16")
        config_off = replace(config_off, moments_eval_dtype="bfloat16")
        st_f, hist_f = optimize(graph, init, config, method="ngd")
        st_o, hist_o = optimize(graph, init, config_off, method="ngd")
        np.testing.assert_allclose(hist_f.cost, hist_o.cost, rtol=1e-6)
        np.testing.assert_allclose(st_f.mu, st_o.mu, atol=1e-7)
        np.testing.assert_allclose(
            hist_f.accepted_step, hist_o.accepted_step, atol=0
        )
