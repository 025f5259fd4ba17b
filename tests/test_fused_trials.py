"""Fused line-search trial kernel (kernels/fused_trials.py).

Interpret-mode (CPU) validation: the fused chain+quadrature+linear trial
evaluation must reproduce the separate-kernel path exactly (same trial
schedule, same selected iterates), end-to-end through the optimizer, for
NGD and prox, single problems and stacked/vmapped batches.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from dataclasses import replace

from gaussianvi_tpu.examples.chain_estimation import build_chain_estimation
from gaussianvi_tpu.factors import moments as mm
from gaussianvi_tpu.inference import GVIConfig
from gaussianvi_tpu.inference.engine import LocalEngine
from gaussianvi_tpu.inference.optimize import optimize
from gaussianvi_tpu.kernels.fused_trials import linear_residual_form


def _configs(niters=6):
    base = GVIConfig(
        niters=niters, niters_lowtemp=niters, step_size_base=0.9,
        chain_impl="lanes",
    )
    return base, replace(base, fused_trials="off")


class TestLinearResidualForm:
    def test_matches_linear_cost(self):
        rng = np.random.default_rng(0)
        k, r, d = 5, 3, 4
        lam = jnp.asarray(rng.standard_normal((k, r, d)))
        psi = jnp.asarray(rng.standard_normal((k, r, 2)))
        tmu = jnp.asarray(rng.standard_normal((k, 2)))
        q = rng.standard_normal((k, r, r))
        tprec = jnp.asarray(q @ np.swapaxes(q, -1, -2) + 2 * np.eye(r))
        const = jnp.asarray(rng.uniform(0.5, 2.0, k))
        mu = jnp.asarray(rng.standard_normal((k, d)))
        a_ = rng.standard_normal((k, d, d)) * 0.3
        cov = jnp.asarray(a_ @ np.swapaxes(a_, -1, -2) + np.eye(d))

        want = mm.linear_cost(lam, psi, tmu, tprec, const, mu, cov)
        a, pm, prec_c = linear_residual_form(lam, psi, tmu, tprec, const)
        resid = jnp.einsum("krd,kd->kr", lam, mu) - pm
        got = (
            jnp.sum(a * cov, axis=(-2, -1))
            + jnp.einsum("kr,krs,ks->k", resid, prec_c, resid)
        )
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_residual_form_is_cancellation_safe(self):
        """The defect that motivated the form: far-from-origin means make
        the expanded mu-quadratic lose the (tiny) residual to f32
        cancellation, while the residual form keeps full relative
        accuracy.  Anchor-prior-like factor at |mu| ~ 1e3."""
        k, s = 4, 4
        lam = jnp.tile(jnp.eye(s, dtype=jnp.float32)[None], (k, 1, 1))
        psi = lam
        tmu = jnp.full((k, s), 1000.0, jnp.float32)
        tprec = jnp.tile(
            (100.0 * jnp.eye(s, dtype=jnp.float32))[None], (k, 1, 1)
        )
        const = jnp.ones((k,), jnp.float32)
        mu = tmu + 1e-3  # true residual cost = s * 100 * 1e-6 = 4e-4
        cov = jnp.tile(
            (1e-6 * jnp.eye(s, dtype=jnp.float32))[None], (k, 1, 1)
        )
        a, pm, prec_c = linear_residual_form(lam, psi, tmu, tprec, const)
        resid = jnp.einsum("krd,kd->kr", lam, mu) - pm
        got = (
            jnp.sum(a * cov, axis=(-2, -1))
            + jnp.einsum("kr,krs,ks->k", resid, prec_c, resid)
        )
        # f64 numpy oracle of linear_cost
        lam64, tprec64 = np.asarray(lam, np.float64), np.asarray(
            tprec, np.float64
        )
        mu64, tmu64 = np.asarray(mu, np.float64), np.asarray(tmu, np.float64)
        a64 = np.einsum("kra,krs,ksb->kab", lam64, tprec64, lam64)
        r64 = np.einsum("krd,kd->kr", lam64, mu64) - np.einsum(
            "krt,kt->kr", np.asarray(psi, np.float64), tmu64
        )
        want = (
            np.einsum("kab,kba->k", a64, np.asarray(cov, np.float64))
            + np.einsum("kr,krs,ks->k", r64, tprec64, r64)
        ) * np.asarray(const, np.float64)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3)
        # the expanded form loses the residual entirely at this scale
        b = jnp.einsum("kra,krs,ks->ka", lam, tprec, pm) * const[:, None]
        c = jnp.einsum("kr,krs,ks->k", pm, tprec, pm) * const
        expanded = (
            jnp.sum(a * cov, axis=(-2, -1))
            + jnp.einsum("ki,kij,kj->k", mu, a, mu)
            - 2.0 * jnp.sum(b * mu, axis=-1)
            + c
        )
        assert not np.allclose(np.asarray(expanded), want, rtol=0.5)


class TestUniformFlag:
    def test_builders_set_uniform(self):
        graph, _, _ = build_chain_estimation(
            num_states=8, dim_x=2, gh_degree=4
        )
        anchor, gp = graph.linear
        assert anchor.uniform          # K == 1
        assert gp.uniform              # constant-dt min-acc prior

    def test_nonuniform_detected(self):
        from gaussianvi_tpu.factors.priors import _as_batch

        lam = np.random.default_rng(0).standard_normal((3, 2, 2))
        batch = _as_batch(
            np.arange(3), lam, np.zeros((3, 2, 2)), np.zeros((3, 2)),
            np.broadcast_to(np.eye(2), (3, 2, 2)), np.ones(3), nb=1,
            dtype=jnp.float64,
        )
        assert not batch.uniform


class TestEligibility:
    def test_engine_builds_fused(self):
        graph, _, _ = build_chain_estimation(
            num_states=8, dim_x=2, gh_degree=4
        )
        config, config_off = _configs()
        assert LocalEngine(graph, config).fused_trials_ready
        assert not LocalEngine(graph, config_off).fused_trials_ready
        # seq linesearch is incompatible
        assert not LocalEngine(
            graph, replace(config, linesearch="seq")
        ).fused_trials_ready
        # "on" asserts eligibility
        with pytest.raises(ValueError):
            LocalEngine(
                graph, replace(config, linesearch="seq", fused_trials="on")
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
        assert not LocalEngine(graph, config).fused_trials_ready


class TestEndToEnd:
    @pytest.mark.parametrize("method", ["ngd", "prox"])
    def test_fused_matches_separate_kernels(self, method):
        graph, init, _ = build_chain_estimation(
            num_states=8, dim_x=2, gh_degree=4, seed=0
        )
        config, config_off = _configs()
        st_f, hist_f = optimize(graph, init, config, method=method)
        st_o, hist_o = optimize(graph, init, config_off, method=method)
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
        # carried covariance equals the separate-kernel path's
        np.testing.assert_allclose(
            hist_f.cov_diag, hist_o.cov_diag, atol=1e-9
        )

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

    def test_different_anchor_indices_fall_back(self):
        """Problems with anchors at different states clear shared_start;
        the fused path must be skipped and results stay correct."""
        from gaussianvi_tpu.factors.priors import fixed_prior
        from gaussianvi_tpu.parallel.sharding import stack_problems

        graphs, states = [], []
        for seed, idx in ((0, 0), (1, 3)):
            g, s0, _ = build_chain_estimation(
                num_states=8, dim_x=1, gh_degree=3, seed=seed
            )
            anchor = fixed_prior(
                idx, np.zeros(2), 0.1 * np.eye(2), dtype=jnp.float64
            )
            g = replace(g, linear=(anchor,) + g.linear[1:])
            graphs.append(g)
            states.append(s0)
        graph_b, state_b = stack_problems(graphs, states)
        assert not graph_b.linear[0].shared_start
        config, config_off = _configs(niters=3)
        assert not LocalEngine(
            jax.tree.map(lambda x: x[0], graph_b), config
        ).fused_trials_ready
        run = jax.jit(jax.vmap(
            lambda g, s: optimize(g, s, config, method="ngd")
        ))
        st_b, hist_b = run(graph_b, state_b)
        assert bool(jnp.isfinite(hist_b.cost).all())


class TestEvalDtypeComposition:
    """moments_eval_dtype="bfloat16" composes with the fused trial kernel
    (offsets quantized in-kernel); float16 disables it (VERDICT r2 item 8)."""

    def test_bf16_keeps_fused_ready(self):
        graph, _, _ = build_chain_estimation(
            num_states=8, dim_x=2, gh_degree=4
        )
        config, _ = _configs()
        eng = LocalEngine(
            graph, replace(config, moments_eval_dtype="bfloat16")
        )
        assert eng.fused_trials_ready
        assert eng.fused_eval_dtype == jnp.dtype(jnp.bfloat16)
        assert not LocalEngine(
            graph, replace(config, moments_eval_dtype="float16")
        ).fused_trials_ready

    def test_bf16_fused_matches_bf16_separate(self):
        """Both paths quantize the offsets with the same incremental
        chol-sum order, so the trajectories agree tightly."""
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
