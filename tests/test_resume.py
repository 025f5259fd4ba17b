"""Checkpoint/resume: a run interrupted at iteration k and resumed must
reproduce the uninterrupted trajectory (capability the reference lacks,
SURVEY.md section 5.4)."""

import numpy as np

from gaussianvi_tpu.examples.chain_estimation import build_chain_estimation
from gaussianvi_tpu.inference import GVIConfig, optimize
from gaussianvi_tpu.utils import load_checkpoint, save_checkpoint


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
