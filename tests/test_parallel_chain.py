"""Associative-scan chain ops vs the sequential oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from gaussianvi_tpu.ops.blocktridiag import (
    BlockTridiag,
    gbp_covariance_logdet,
    logdet,
    solve,
)
from gaussianvi_tpu.ops.parallel_chain import (
    gbp_covariance_logdet_assoc,
    logdet_assoc,
    solve_assoc,
)
from tests.test_blocktridiag import random_spd_btd


@pytest.mark.parametrize("n,s", [(1, 3), (2, 2), (7, 1), (20, 14), (33, 4)])
class TestAssocMatchesSequential:
    def test_covariance_and_logdet(self, n, s):
        A = random_spd_btd(n, s, seed=n * 3 + s)
        cd0, co0, ld0 = gbp_covariance_logdet(A)
        cd1, co1, ld1 = gbp_covariance_logdet_assoc(A)
        np.testing.assert_allclose(cd1, cd0, atol=1e-12)
        if n > 1:
            np.testing.assert_allclose(co1, co0, atol=1e-12)
        np.testing.assert_allclose(ld1, ld0, atol=1e-10)
        np.testing.assert_allclose(logdet_assoc(A), logdet(A), atol=1e-10)

    def test_solve(self, n, s):
        A = random_spd_btd(n, s, seed=n * 5 + s)
        b = jnp.asarray(
            np.random.default_rng(n).standard_normal(n * s)
        )
        np.testing.assert_allclose(
            solve_assoc(A, b), solve(A, b), atol=1e-10
        )
