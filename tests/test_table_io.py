"""Quadrature-table serialization round trip.

Equivalent of reference tests/test_spgh_table_IO.cpp (cereal round trip of
the (dim, degree) -> (nodes, weights) map + ground-truth spot check) and the
save_SparseGH_weights driver, on a reduced schedule.
"""

import os

import numpy as np

from gaussianvi_tpu.factors.priors import (
    min_acc_q,
    minimum_acc_prior,
    minimum_acc_prior_integral,
)
from gaussianvi_tpu.quadrature import get_rule, load_table, save_table, sparse_gh


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


class TestCommittedArtifact:
    """The committed sparse_gh_table.npz (quadrature/saveSparseGHWeightMap.h
    parity: runtime consumers load, never regenerate)."""

    def test_artifact_exists_and_serves_get_rule(self):
        import gaussianvi_tpu.quadrature.table as tbl

        assert os.path.exists(tbl._DEFAULT_TABLE)
        hit = tbl._table_lookup(4, 3)
        assert hit is not None
        n, w = get_rule(4, 3)
        np.testing.assert_array_equal(n, hit[0])
        np.testing.assert_array_equal(w, hit[1])

    def test_artifact_not_stale(self):
        from gaussianvi_tpu.quadrature import verify_table

        verify_table()  # raises on generator/table drift

    def test_uncovered_rule_falls_back_to_generator(self):
        import gaussianvi_tpu.quadrature.table as tbl
        from gaussianvi_tpu.quadrature.smolyak import MAX_DEGREE_SCHEDULE

        deg = MAX_DEGREE_SCHEDULE[4] + 1  # beyond the tabulated schedule
        assert tbl._table_lookup(4, deg) is None
        n, w = get_rule(4, deg)
        assert n.shape[1] == 4 and n.shape[0] == w.shape[0]
        np.testing.assert_allclose(w.sum(), 1.0, atol=1e-9)
