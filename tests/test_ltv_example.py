"""LTV-prior chain estimation end-to-end."""

import numpy as np

from gaussianvi_tpu.examples.ltv_estimation import run_ltv_estimation


class TestLTVEstimation:
    def test_ngd_converges(self):
        final, hist = run_ltv_estimation("ngd", num_states=10)
        cost = np.asarray(hist.cost)
        assert np.isfinite(cost).all()
        assert cost[-1] < cost[0]
        assert np.isfinite(np.asarray(final.mu)).all()

    def test_precision_spd(self):
        final, _ = run_ltv_estimation("ngd", num_states=8)
        dense = np.asarray(final.precision.to_dense())
        w = np.linalg.eigvalsh(dense)
        assert w.min() > 0
