"""Quadrature tests against the reference's ground-truth constants.

Constants come from /root/reference tests: test_GH.cpp:65-128 (deg-10 1-D
nodes/weights and the 1-D Barfoot-factor expectations), test_GH.cpp:134-183
(sparse==full in 1-D, 2-D correlated case), test_spgh_table_IO.cpp:60-89
(dim 5, k 2 sparse table), test_gh_spgh.cpp:75-90 (polynomial exactness).
"""

import numpy as np
import pytest

from gaussianvi_tpu.quadrature import (
    MAX_DEGREE_SCHEDULE,
    gh_1d,
    gh_tensor_grid,
    get_rule,
    sparse_gh,
)


def barfoot_phi(x):
    mu_p, f, b, sig_r_sq, sig_p_sq = 20.0, 400.0, 0.1, 0.09, 9.0
    y = f * b / mu_p + 0.05
    return (x - mu_p) ** 2 / sig_p_sq / 2 + (y - f * b / x) ** 2 / sig_r_sq / 2


class TestGH1D:
    def test_deg10_nodes_weights(self):
        nodes, weights = gh_1d(10)
        expected_nodes = np.sort(
            [4.859462828332310, -4.859462828332314, 3.581823483551924,
             -3.581823483551934, 0.484935707515505, -0.484935707515517,
             1.465989094391161, -1.465989094391140, 2.484325841638960,
             -2.484325841638965]
        )
        expected_weights = np.array(
            [4.310652630718227e-06, 7.580709343122321e-04, 0.019111580500769,
             0.135483702980275, 0.344642334932012, 0.344642334932016,
             0.135483702980267, 0.019111580500770, 7.580709343121815e-04,
             4.310652630718376e-06]
        )
        np.testing.assert_allclose(nodes, expected_nodes, atol=1e-10)
        np.testing.assert_allclose(weights, expected_weights, atol=1e-10)

    def test_weights_normalized(self):
        for deg in (1, 2, 5, 10, 25):
            _, w = gh_1d(deg)
            assert abs(w.sum() - 1.0) < 1e-14

    def test_barfoot_factor_expectations(self):
        nodes, weights = gh_tensor_grid(6, 1)
        pts = nodes[:, 0] * 3.0 + 20.0  # sigma pts for N(20, 9)
        e_phi = np.sum(weights * barfoot_phi(pts))
        e_xmu_phi = np.sum(weights * (pts - 20.0) * barfoot_phi(pts))
        assert abs(e_phi - 1.1129) < 1e-4
        assert abs(e_xmu_phi - (-1.2144)) < 1e-4


class TestSparseGH:
    def test_dim5_k2_table(self):
        nodes, weights = sparse_gh(5, 2)
        assert nodes.shape == (11, 5)
        expected_nodes = np.zeros((11, 5))
        expected_nodes[0, 0] = -1.0
        expected_nodes[1, 1] = -1.0
        expected_nodes[2, 2] = -1.0
        expected_nodes[3, 3] = -1.0
        expected_nodes[4, 4] = -1.0
        expected_nodes[6, 4] = 1.0
        expected_nodes[7, 3] = 1.0
        expected_nodes[8, 2] = 1.0
        expected_nodes[9, 1] = 1.0
        expected_nodes[10, 0] = 1.0
        expected_weights = np.full(11, 0.5)
        expected_weights[5] = -4.0
        np.testing.assert_allclose(nodes, expected_nodes, atol=1e-6)
        np.testing.assert_allclose(weights, expected_weights, atol=1e-6)

    def test_sparse_equals_full_1d(self):
        for deg in (3, 6, 10):
            sn, sw = sparse_gh(1, deg)
            fn, fw = gh_tensor_grid(deg, 1)
            order_s = np.argsort(sn[:, 0])
            order_f = np.argsort(fn[:, 0])
            np.testing.assert_allclose(sn[order_s, 0], fn[order_f, 0], atol=1e-12)
            np.testing.assert_allclose(sw[order_s], fw[order_f], atol=1e-12)

    def test_2d_correlated_expectations(self):
        nodes, weights = sparse_gh(2, 10)
        cov = np.array(
            [[2.210433244916004, 1.635720601237843],
             [1.635720601237843, 2.210433244916004]]
        )
        evals, evecs = np.linalg.eigh(cov)
        sqrt_p = (evecs * np.sqrt(evals)) @ evecs.T
        pts = nodes @ sqrt_p.T + np.array([1.0, 1.0])
        e1 = np.sum(weights * 3.0 * pts[:, 0] ** 2)
        e2 = np.sum(weights * 2.0 * pts[:, 0] * pts[:, 1])
        assert abs(e1 - 9.631450087970276) < 1e-3
        assert abs(e2 - 5.271519032251217) < 1e-3

    def test_polynomial_exactness_dim4(self):
        # E[x^T (1e4 I) x] over N(0, 1e-4 I) = trace = 4.0
        nodes, weights = sparse_gh(4, 3)
        pts = nodes * 1e-2
        val = np.sum(weights * np.sum(1e4 * pts**2, axis=1))
        assert abs(val - 4.0) < 1e-9

    @pytest.mark.parametrize("dim,k", [(2, 4), (3, 4), (6, 3)])
    def test_moment_exactness(self, dim, k):
        """Exact for all monomials of total order <= 2k-1 (Gaussian moments)."""
        rng = np.random.default_rng(0)
        nodes, weights = sparse_gh(dim, k)
        assert abs(weights.sum() - 1.0) < 1e-12
        # second moments = identity
        m2 = (nodes * weights[:, None]).T @ nodes
        np.testing.assert_allclose(m2, np.eye(dim), atol=1e-10)
        # odd moments vanish
        m1 = weights @ nodes
        np.testing.assert_allclose(m1, 0.0, atol=1e-12)
        # fourth moment of a single coordinate = 3 (needs 2k-1 >= 4)
        if 2 * k - 1 >= 4:
            m4 = np.sum(weights * nodes[:, 0] ** 4)
            assert abs(m4 - 3.0) < 1e-9

    def test_far_fewer_nodes_than_full(self):
        nodes, _ = sparse_gh(6, 3)
        assert nodes.shape[0] < 3**6 / 5

    def test_schedule_smoke(self):
        # every scheduled (dim <= 6) rule builds and normalizes
        for dim in range(1, 7):
            for deg in (1, min(3, MAX_DEGREE_SCHEDULE[dim])):
                _, w = get_rule(dim, deg)
                assert abs(w.sum() - 1.0) < 1e-12
