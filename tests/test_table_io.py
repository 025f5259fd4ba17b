"""Quadrature-table serialization round trip.

Equivalent of reference tests/test_spgh_table_IO.cpp (cereal round trip of
the (dim, degree) -> (nodes, weights) map + ground-truth spot check) and the
save_SparseGH_weights driver, on a reduced schedule.
"""

import numpy as np

from gaussianvi_tpu.factors.priors import (
    min_acc_q,
    minimum_acc_prior,
    minimum_acc_prior_integral,
)
from gaussianvi_tpu.quadrature import load_table, save_table, sparse_gh


class TestTableIO:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "table.npz")
        schedule = {1: 4, 2: 3, 5: 2}
        save_table(path, schedule)
        table = load_table(path)
        assert set(table.keys()) == {
            (d, k) for d, kmax in schedule.items() for k in range(1, kmax + 1)
        }
        nodes, weights = table[(5, 2)]
        n0, w0 = sparse_gh(5, 2)
        np.testing.assert_allclose(nodes, n0)
        np.testing.assert_allclose(weights, w0)
        # ground truth (test_spgh_table_IO.cpp:64-78)
        assert nodes.shape == (11, 5)
        center = np.all(nodes == 0.0, axis=1)
        np.testing.assert_allclose(weights[center], [-4.0], atol=1e-9)


class TestMinAccIntegral:
    def test_integral_matches_closed_form(self):
        """MinimumAccGP_integral-vs-MinimumAccGP validation
        (gp/minimum_acc_prior_integral.h)."""
        rng = np.random.default_rng(0)
        m = rng.standard_normal((2, 2))
        qc = m @ m.T + 2 * np.eye(2)
        dt = 0.3
        closed = minimum_acc_prior(qc, dt, num_states=4)
        integ = minimum_acc_prior_integral(qc, dt, num_states=4)
        np.testing.assert_allclose(integ.lam, closed.lam, atol=1e-10)
        np.testing.assert_allclose(
            integ.target_prec, closed.target_prec, rtol=1e-8
        )
        q = min_acc_q(qc, dt)
        np.testing.assert_allclose(
            np.linalg.inv(np.asarray(integ.target_prec[0])), q, rtol=1e-8
        )
