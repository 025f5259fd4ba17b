"""Batch-on-lanes quadrature kernel (kernels/quad_lanes.py).

Validates the Pallas kernel (interpret mode on CPU) against the fused-XLA
moments path, its vmap composition (problems x line-search trials flatten
onto lanes), the engine dispatch, and end-to-end optimizer equivalence.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from dataclasses import replace

from gaussianvi_tpu.examples.chain_estimation import (
    build_chain_estimation,
    range_cost_lanes,
)
from gaussianvi_tpu.factors import moments as mm
from gaussianvi_tpu.inference import GVIConfig
from gaussianvi_tpu.inference.optimize import optimize
from gaussianvi_tpu.kernels.quad_lanes import (
    quad_fits_lanes,
    quad_lanes,
    quad_lanes_vmappable,
)


@pytest.fixture(scope="module")
def problem():
    graph, init, config = build_chain_estimation(
        num_states=8, dim_x=2, gh_degree=4, seed=0
    )
    fb = graph.nonlinear[0]
    rng = np.random.default_rng(0)
    b, k, d = 3, fb.start.shape[0], fb.dim
    mu = jnp.asarray(rng.standard_normal((b, k, d)))
    a = rng.standard_normal((b, k, d, d)) * 0.3
    cov = jnp.asarray(a @ np.swapaxes(a, -1, -2) + 0.5 * np.eye(d))
    leaves = tuple(jax.tree.leaves(fb.params))
    return fb, mu, cov, leaves


def _xla_moments(fb, mu, cov, leaves):
    struct = jax.tree.structure(fb.params)
    return jax.vmap(
        lambda m, c, *ps: mm.gh_moments(
            fb.nodes, fb.weights, m, c, fb.cost_fn,
            jax.tree.unflatten(struct, list(ps)), None,
        )
    )(mu, cov, *[jnp.broadcast_to(p[None], (mu.shape[0],) + p.shape)
                 for p in leaves])


class TestKernel:
    def test_matches_xla_moments(self, problem):
        fb, mu, cov, leaves = problem
        ref = _xla_moments(fb, mu, cov, leaves)
        b = mu.shape[0]
        leaves_b = tuple(
            jnp.broadcast_to(p[None], (b,) + p.shape) for p in leaves
        )
        out = quad_lanes(
            mu, cov, fb.nodes, fb.weights, range_cost_lanes, leaves_b,
            with_moments=True,
        )
        for got, want in zip(out, ref):
            np.testing.assert_allclose(got, want, atol=1e-10)

    def test_phi_only(self, problem):
        fb, mu, cov, leaves = problem
        ref = _xla_moments(fb, mu, cov, leaves)[0]
        b = mu.shape[0]
        leaves_b = tuple(
            jnp.broadcast_to(p[None], (b,) + p.shape) for p in leaves
        )
        phi = quad_lanes(
            mu, cov, fb.nodes, fb.weights, range_cost_lanes, leaves_b
        )
        np.testing.assert_allclose(phi, ref, atol=1e-10)

    def test_nested_vmap_flattens_onto_lanes(self, problem):
        """problems x trials nesting — the line-search shape."""
        fb, mu, cov, leaves = problem
        ref = _xla_moments(fb, mu, cov, leaves)[0]
        b, k, d = mu.shape
        np_ax = (None,) * len(leaves)

        def f(m, c, *ps):
            return quad_lanes_vmappable(
                fb.nodes, fb.weights, m, c, range_cost_lanes, tuple(ps)
            )

        nested = jax.vmap(
            jax.vmap(f, in_axes=(0, 0) + np_ax), in_axes=(0, 0) + np_ax
        )(mu.reshape(b, 1, k, d), cov.reshape(b, 1, k, d, d), *leaves)
        np.testing.assert_allclose(nested.reshape(b, k), ref, atol=1e-10)

    def test_vmem_budget_fallback(self):
        # far past any plausible VMEM budget -> the static check says no
        assert not quad_fits_lanes(4096, 8, 4097, True)
        assert quad_fits_lanes(32, 4, 137, True)


class TestDispatch:
    def test_auto_resolves_to_lanes_on_tpu(self, monkeypatch, problem):
        """chain_impl='auto' (the default) must select the lanes fast path
        on TPU with no flags — and the engine's quad_impl='auto' must follow
        it (VERDICT round-2 item: the fast path may not be opt-in)."""
        from gaussianvi_tpu.inference.engine import LocalEngine
        from gaussianvi_tpu.inference.graph import FactorGraph
        from gaussianvi_tpu.inference.optimize import resolve_chain_impl

        config = GVIConfig()
        assert config.chain_impl == "auto" and config.quad_impl == "auto"
        assert resolve_chain_impl(config, 32) == "seq"  # CPU backend here
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert resolve_chain_impl(config, 32) == "lanes"
        graph, init, _ = build_chain_estimation(
            num_states=8, dim_x=2, gh_degree=4, seed=0
        )
        engine = LocalEngine(graph, config)
        assert engine.quad_impl == "lanes"

    def test_batch_phi_dispatch_matches(self, problem):
        fb, mu, cov, leaves = problem
        ref = _xla_moments(fb, mu, cov, leaves)[0]
        got = jax.vmap(
            lambda m, c: mm.batch_phi(fb, m, c, None, "lanes")
        )(mu, cov)
        np.testing.assert_allclose(got, ref, atol=1e-10)

    def test_no_lanes_cost_falls_back(self, problem):
        fb, mu, cov, leaves = problem
        fb_plain = replace(fb, lanes_cost=None)
        ref = _xla_moments(fb, mu, cov, leaves)[0]
        got = jax.vmap(
            lambda m, c: mm.batch_phi(fb_plain, m, c, None, "lanes")
        )(mu, cov)
        np.testing.assert_allclose(got, ref, atol=1e-12)


class TestBenchPath:
    def test_vmapped_optimize_over_stacked_problems(self):
        """The bench program shape: stacked problems, vmapped optimize,
        lanes chain + lanes quadrature (interpret mode on CPU)."""
        from gaussianvi_tpu.parallel.sharding import stack_problems

        graphs, states = [], []
        for seed in range(3):
            g, s0, _ = build_chain_estimation(
                num_states=8, dim_x=2, gh_degree=4, seed=seed
            )
            graphs.append(g)
            states.append(s0)
        graph_b, state_b = stack_problems(graphs, states)
        config = GVIConfig(
            niters=3, niters_lowtemp=3, step_size_base=0.9,
            chain_impl="lanes",
        )
        run = jax.jit(jax.vmap(
            lambda g, s: optimize(g, s, config, method="ngd")
        ))
        state_out, hist = run(graph_b, state_b)
        for i, (g, s0) in enumerate(zip(graphs, states)):
            ref_state, ref_hist = optimize(g, s0, config, method="ngd")
            np.testing.assert_allclose(
                hist.cost[i], ref_hist.cost, atol=1e-8
            )
            np.testing.assert_allclose(
                state_out.mu[i], ref_state.mu, atol=1e-9
            )


class TestEndToEnd:
    def test_optimize_matches_default_path(self):
        graph, init, config = build_chain_estimation(
            num_states=16, dim_x=2, gh_degree=4, seed=0
        )
        config = replace(config, niters=8)
        ref_state, ref_hist = optimize(graph, init, config, method="ngd")
        # the TPU fast-path bundle: lanes chain kernel + lanes quadrature
        st, hist = optimize(
            graph, init, replace(config, chain_impl="lanes"), method="ngd"
        )
        np.testing.assert_allclose(hist.cost, ref_hist.cost, atol=1e-8)
        np.testing.assert_allclose(st.mu, ref_state.mu, atol=1e-10)
        # lanes quadrature alone (seq chain)
        st2, hist2 = optimize(
            graph, init, replace(config, quad_impl="lanes"), method="ngd"
        )
        np.testing.assert_allclose(hist2.cost, ref_hist.cost, atol=1e-8)

    def test_prox_matches_default_path(self):
        graph, init, config = build_chain_estimation(
            num_states=12, dim_x=2, gh_degree=4, seed=1
        )
        config = replace(config, niters=5)
        _, ref_hist = optimize(graph, init, config, method="prox")
        _, hist = optimize(
            graph, init, replace(config, chain_impl="lanes"), method="prox"
        )
        np.testing.assert_allclose(hist.cost, ref_hist.cost, atol=1e-8)


class TestEvalDtypeComposition:
    """moments_eval_dtype x lanes (VERDICT r2 item 8): bf16 centered
    quantization is applied IN-KERNEL, so the compression mode no longer
    forces the XLA path; fp16 (no native TPU cast) still does."""

    def test_eligibility_rule(self, problem):
        fb, _, _, _ = problem
        assert mm._lanes_eligible(fb, None, True)
        assert mm._lanes_eligible(fb, jnp.bfloat16, True)
        assert not mm._lanes_eligible(fb, jnp.float16, True)

    def test_bf16_lanes_matches_bf16_xla(self, problem):
        """Same centered quantization on both paths: identical quantized
        offsets up to f32 summation order, so E[phi] agrees to ~bf16
        rounding of the offsets (ties can flip), and both sit within the
        measured bf16 envelope of the full-precision answer."""
        fb, mu, cov, leaves = problem
        struct = jax.tree.structure(fb.params)
        bcast = [jnp.broadcast_to(p[None], (mu.shape[0],) + p.shape)
                 for p in leaves]
        xla_bf16 = jax.vmap(
            lambda m, c, *ps: mm.gh_moments(
                fb.nodes, fb.weights, m, c, fb.cost_fn,
                jax.tree.unflatten(struct, list(ps)), jnp.bfloat16,
            )[0]
        )(mu, cov, *bcast)
        lanes_bf16 = jax.vmap(
            lambda m, c: mm.batch_phi(fb, m, c, jnp.bfloat16, "lanes")
        )(mu, cov)
        full = _xla_moments(fb, mu, cov, leaves)[0]
        np.testing.assert_allclose(lanes_bf16, xla_bf16, rtol=2e-2)
        rel = np.abs(np.asarray(lanes_bf16 - full)) / np.maximum(
            np.abs(np.asarray(full)), 1e-6
        )
        assert rel.max() < 2e-2
        # quantization actually happened on the lanes path
        lanes_full = jax.vmap(
            lambda m, c: mm.batch_phi(fb, m, c, None, "lanes")
        )(mu, cov)
        assert float(jnp.max(jnp.abs(lanes_bf16 - lanes_full))) > 0.0

    def test_fp16_falls_back_to_xla(self, problem):
        fb, mu, cov, leaves = problem
        struct = jax.tree.structure(fb.params)
        bcast = [jnp.broadcast_to(p[None], (mu.shape[0],) + p.shape)
                 for p in leaves]
        ref = jax.vmap(
            lambda m, c, *ps: mm.gh_moments(
                fb.nodes, fb.weights, m, c, fb.cost_fn,
                jax.tree.unflatten(struct, list(ps)), jnp.float16,
            )[0]
        )(mu, cov, *bcast)
        got = jax.vmap(
            lambda m, c: mm.batch_phi(fb, m, c, jnp.float16, "lanes")
        )(mu, cov)
        np.testing.assert_allclose(got, ref, atol=1e-12)

    def test_bf16_optimizer_on_lanes_path(self):
        """End-to-end: lanes + bf16 runs the quantized fast path and lands
        in the same basin as full precision."""
        graph, init, config = build_chain_estimation(
            num_states=12, dim_x=2, gh_degree=4, seed=2
        )
        config = replace(config, niters=8, chain_impl="lanes")
        _, ref_hist = optimize(graph, init, config, method="ngd")
        _, hist = optimize(
            graph, init,
            replace(config, moments_eval_dtype="bfloat16"), method="ngd",
        )
        cf, cb = float(ref_hist.cost[-1]), float(hist.cost[-1])
        assert np.isfinite(cb)
        assert abs(cb - cf) / abs(cf) < 0.1
