"""High-dimensional quadrature spot checks across the reference's table
schedule (dims up to 20, saveSparseGHWeightMap.h:17-24)."""

import numpy as np
import pytest

from gaussianvi_tpu.quadrature import MAX_DEGREE_SCHEDULE, sparse_gh


class TestHighDim:
    @pytest.mark.parametrize("dim", [8, 10, 14, 20])
    def test_gaussian_moments(self, dim):
        k = min(3, MAX_DEGREE_SCHEDULE[dim])
        nodes, w = sparse_gh(dim, k)
        assert abs(w.sum() - 1.0) < 1e-10
        m1 = w @ nodes
        np.testing.assert_allclose(m1, 0.0, atol=1e-10)
        m2 = (nodes * w[:, None]).T @ nodes
        np.testing.assert_allclose(m2, np.eye(dim), atol=1e-8)

    def test_dim20_node_count_is_sparse(self):
        nodes, _ = sparse_gh(20, 3)
        # full tensor grid would be 3^20 ~ 3.5e9; sparse is ~1e3
        assert nodes.shape[0] < 2000

    @pytest.mark.parametrize("dim", [7, 12, 16])
    def test_fourth_moment(self, dim):
        k = 3  # exact to total order 5
        nodes, w = sparse_gh(dim, k)
        m4 = np.sum(w * nodes[:, 0] ** 4)
        np.testing.assert_allclose(m4, 3.0, atol=1e-8)
        m22 = np.sum(w * nodes[:, 0] ** 2 * nodes[:, 1] ** 2)
        np.testing.assert_allclose(m22, 1.0, atol=1e-8)
