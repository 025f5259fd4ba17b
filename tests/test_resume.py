"""Checkpoint/resume: a run interrupted at iteration k and resumed must
reproduce the uninterrupted trajectory (capability the reference lacks,
SURVEY.md section 5.4)."""

import numpy as np

from gaussianvi_tpu.examples.chain_estimation import build_chain_estimation
from gaussianvi_tpu.inference import GVIConfig, optimize, optimize_from
from gaussianvi_tpu.utils import (
    load_checkpoint,
    load_loop_state,
    save_checkpoint,
)


class TestResume:
    def test_resume_matches_uninterrupted(self, tmp_path):
        graph, init, _ = build_chain_estimation(
            num_states=6, dim_x=1, gh_degree=4
        )
        # no temperature switch inside the window so the resumed loop state
        # is fully captured by (state, temperature, is_lowtemp)
        full_cfg = GVIConfig(niters=8, niters_lowtemp=100, step_size_base=0.9)
        final_full, hist_full = optimize(graph, init, full_cfg, method="ngd")

        # first half
        half_cfg = GVIConfig(niters=4, niters_lowtemp=100, step_size_base=0.9)
        mid, _ = optimize(graph, init, half_cfg, method="ngd")
        path = str(tmp_path / "ck")
        save_checkpoint(path, mid, iteration=4, temperature=1.0,
                        is_lowtemp=True)

        # resume second half
        state, it, temp, low = load_checkpoint(path)
        assert (it, temp, low) == (4, 1.0, True)
        final_res, hist_res = optimize(graph, state, half_cfg, method="ngd")

        np.testing.assert_allclose(
            np.asarray(final_res.mu), np.asarray(final_full.mu), atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(final_res.precision.diag),
            np.asarray(final_full.precision.diag),
            atol=1e-9,
        )
        # recorded costs of the second half line up with the full run
        np.testing.assert_allclose(
            np.asarray(hist_res.cost),
            np.asarray(hist_full.cost[4:]),
            atol=1e-10,
        )

    def test_full_state_resume_across_temperature_switch(self, tmp_path):
        """optimize_from + LoopState round-trip: the checkpoint window
        straddles the scheduled high-temperature switch AND runs long
        enough to hit the convergence freeze, so (temperature, is_lowtemp,
        converged) all change state — the resumed trajectory must still be
        the uninterrupted one bit-for-bit (SURVEY section 5.4: "mu, Lambda,
        step state")."""
        graph, init, _ = build_chain_estimation(
            num_states=6, dim_x=1, gh_degree=4
        )
        cfg = GVIConfig(
            niters=24, niters_lowtemp=4, high_temperature=8.0,
            step_size_base=0.9,
        )
        final_full, hist_full, loop_full = optimize_from(graph, init, cfg)
        # the scenario must actually exercise the loop scalars
        assert not bool(loop_full.is_lowtemp)
        assert float(loop_full.temperature) == 8.0

        # first 7 iterations (past the scheduled switch at 4)
        half_cfg = GVIConfig(
            niters=7, niters_lowtemp=4, high_temperature=8.0,
            step_size_base=0.9,
        )
        mid, hist_half, loop_mid = optimize_from(graph, init, half_cfg)
        path = str(tmp_path / "ck_full")
        save_checkpoint(
            path, mid, iteration=7,
            temperature=float(loop_mid.temperature),
            is_lowtemp=bool(loop_mid.is_lowtemp),
            converged=bool(loop_mid.converged),
        )

        state, it, loop = load_loop_state(path)
        assert it == 7
        final_res, hist_res, loop_res = optimize_from(
            graph, state, cfg, start_iteration=it, loop_state=loop
        )

        # Semantic exactness: the resumed trajectory IS the uninterrupted
        # one.  The float tolerance is 1-2 ulps, NOT a numerical-drift
        # allowance: the resumed run is a DIFFERENT jitted program
        # (shorter scan, recompute-on-load of cov/fc), and XLA may fuse
        # its arithmetic in a different order — observed as a single
        # 1-ulp cost-entry difference when the marginal-rule shapes
        # changed the einsum fusion.  Accepted-step indices (the discrete
        # decisions) must still be IDENTICAL.
        np.testing.assert_allclose(
            np.asarray(final_res.mu), np.asarray(final_full.mu),
            rtol=5e-14, atol=0,
        )
        np.testing.assert_allclose(
            np.asarray(final_res.precision.diag),
            np.asarray(final_full.precision.diag),
            rtol=5e-14, atol=0,
        )
        np.testing.assert_allclose(
            np.asarray(hist_res.cost), np.asarray(hist_full.cost[7:]),
            rtol=5e-14, atol=0,
        )
        np.testing.assert_array_equal(
            np.asarray(hist_res.accepted_step),
            np.asarray(hist_full.accepted_step[7:]),
        )
        assert bool(loop_res.converged) == bool(loop_full.converged)

    def test_resume_preserves_converged_freeze(self, tmp_path):
        """A run checkpointed AFTER convergence stays frozen on resume:
        without the converged flag the resumed loop would run a fresh line
        search from the frozen iterate."""
        graph, init, _ = build_chain_estimation(
            num_states=6, dim_x=1, gh_degree=4
        )
        # long run at a single temperature phase converges (line search
        # exhausts at high temperature -> converged latch)
        cfg = GVIConfig(
            niters=40, niters_lowtemp=4, high_temperature=8.0,
            step_size_base=0.9,
        )
        final_full, hist_full, loop_full = optimize_from(graph, init, cfg)
        if not bool(loop_full.converged):
            import pytest

            pytest.skip("scenario did not converge within the window")
        # checkpoint at 30 (frozen by then in this scenario or not — the
        # equality below is what matters either way)
        half_cfg = GVIConfig(
            niters=30, niters_lowtemp=4, high_temperature=8.0,
            step_size_base=0.9,
        )
        mid, _, loop_mid = optimize_from(graph, init, half_cfg)
        path = str(tmp_path / "ck_conv")
        save_checkpoint(
            path, mid, iteration=30,
            temperature=float(loop_mid.temperature),
            is_lowtemp=bool(loop_mid.is_lowtemp),
            converged=bool(loop_mid.converged),
        )
        state, it, loop = load_loop_state(path)
        final_res, hist_res, _ = optimize_from(
            graph, state, cfg, start_iteration=it, loop_state=loop
        )
        np.testing.assert_array_equal(
            np.asarray(final_res.mu), np.asarray(final_full.mu)
        )
        np.testing.assert_array_equal(
            np.asarray(hist_res.cost), np.asarray(hist_full.cost[30:])
        )
