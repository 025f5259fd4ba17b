"""Golden-trajectory parity with the reference's committed 1-D results.

The expected values are the converged outputs the reference repo commits at
data/1d/{mean,cov,cost}.csv and data/1d_proxgvi/{mean,cov,cost}.csv — the
authoritative correctness baseline (BASELINE.md).  Agreement here exercises
the full stack end-to-end: sparse-GH quadrature, fused moments, NGD/BW-JKO
factor math, the joint loop with backtracking, and the entropy term.
"""

import numpy as np

from gaussianvi_tpu.examples import run_barfoot_1d

REF_NGD_MEAN = [
    20, 21.665361857562, 22.7040584918235, 23.2630182594979, 23.5408793378484,
    23.6757913119583, 23.741543014794, 23.7739678089838, 23.7901359849167,
    23.798263483531,
]
REF_NGD_COV = [
    9, 3.73871020422496, 3.766060656788, 4.05073297289323, 4.32258307028345,
    4.51616436254145, 4.63547783356078, 4.70322560179508, 4.73993435410974,
    4.75930649767543,
]
REF_NGD_COST = [
    4.01362803313942, 2.29339559612571, 1.922857236251, 1.8240621525229,
    1.79886961793048, 1.79241192801403, 1.79073629883165, 1.79029927100644,
    1.79018524794596, 1.7901555302211,
]
REF_PROX_MEAN = [
    20, 20.8639583875129, 21.4346541011239, 21.8629321969116,
    22.1986301230314, 22.4679281988008, 22.6871122844295, 22.8672801238834,
    23.0164354323458, 23.1405758249123,
]
REF_PROX_COV = [
    9, 5.91870372830201, 4.87618067259944, 4.42656703405717, 4.23374453344112,
    4.16704814805161, 4.16521114889094, 4.19653006586734, 4.24368324709716,
    4.29696237407791,
]
REF_PROX_COST = [
    4.01362803313942, 2.8716389785373, 2.43669402886822, 2.20675595231972,
    2.06921941096237, 1.98136134254004, 1.92303414280243, 1.88337559567754,
    1.85598695786842, 1.8368695947682,
]


class TestGolden1D:
    def test_ngd_matches_reference(self):
        _, hist = run_barfoot_1d("ngd")
        np.testing.assert_allclose(hist.mu[:, 0, 0], REF_NGD_MEAN, atol=1e-9)
        np.testing.assert_allclose(
            hist.cov_diag[:, 0, 0, 0], REF_NGD_COV, atol=1e-9
        )
        np.testing.assert_allclose(hist.cost, REF_NGD_COST, atol=1e-9)

    def test_ngd_cost_monotone(self):
        _, hist = run_barfoot_1d("ngd")
        assert np.all(np.diff(np.asarray(hist.cost)) < 0)

    def test_prox_matches_reference(self):
        _, hist = run_barfoot_1d("prox")
        np.testing.assert_allclose(hist.mu[:, 0, 0], REF_PROX_MEAN, atol=1e-9)
        np.testing.assert_allclose(
            hist.cov_diag[:, 0, 0, 0], REF_PROX_COV, atol=1e-9
        )
        np.testing.assert_allclose(hist.cost, REF_PROX_COST, atol=1e-9)

    def test_factor_costs_recorded(self):
        _, hist = run_barfoot_1d("ngd")
        assert hist.factor_costs.shape == (10, 1)
        # total cost = factor costs + entropy; entropy = 0.5 log det(prec)
        prec0 = 1.0 / 9.0
        np.testing.assert_allclose(
            hist.cost[0],
            hist.factor_costs[0, 0] + 0.5 * np.log(prec0),
            atol=1e-12,
        )
