"""Native C++ sparse-grid generator vs the NumPy implementation.

The native library (csrc/spgh.cpp, the replacement for the reference's
MATLAB-compiled libSpGH.so) must agree with the NumPy Smolyak builder to
machine precision for every tabulated shape.
"""

import numpy as np
import pytest

from gaussianvi_tpu.quadrature import gh_1d, sparse_gh
from gaussianvi_tpu.quadrature.native import (
    available,
    gh_1d_native,
    sparse_gh_native,
)

pytestmark = pytest.mark.skipif(
    not available(), reason="native spgh library unavailable"
)


class TestNativeSpGH:
    @pytest.mark.parametrize("deg", [1, 2, 6, 10, 25])
    def test_gh1d_matches(self, deg):
        n, w = gh_1d_native(deg)
        n0, w0 = gh_1d(deg)
        np.testing.assert_allclose(n, n0, atol=1e-13)
        np.testing.assert_allclose(w, w0, atol=1e-13)

    @pytest.mark.parametrize(
        "dim,k", [(1, 6), (2, 5), (3, 4), (4, 3), (5, 2), (6, 3), (10, 2)]
    )
    def test_sparse_matches_numpy(self, dim, k):
        na, wa = sparse_gh_native(dim, k)
        nb, wb = sparse_gh(dim, k)
        assert na.shape == nb.shape
        np.testing.assert_allclose(na, nb, atol=1e-13)
        np.testing.assert_allclose(wa, wb, atol=1e-12)

    def test_dim5_k2_ground_truth(self):
        nodes, weights = sparse_gh_native(5, 2)
        assert nodes.shape == (11, 5)
        assert abs(weights.sum() - 1.0) < 1e-12
        center = np.all(nodes == 0.0, axis=1)
        np.testing.assert_allclose(weights[center], [-4.0], atol=1e-9)
