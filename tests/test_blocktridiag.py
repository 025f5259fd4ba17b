"""Block-tridiagonal ops vs dense oracles.

Ports the reference's GBP self-validation harness (src/GBP.cpp:133-158:
random block-tridiagonal SPD precision, block dim 14, 20 states, compare
GBP marginal covariances against the dense inverse) and adds logdet/solve
property tests the reference lacks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianvi_tpu.ops import (
    BlockTridiag,
    gbp_covariance,
    logdet,
    psd_sqrtm,
    solve,
    sqrtm_product,
)


def random_spd_btd(num_states, s, seed=0, dtype=jnp.float64):
    """Random SPD block-tridiagonal matrix (diagonally dominated)."""
    rng = np.random.default_rng(seed)
    diag = rng.standard_normal((num_states, s, s))
    diag = diag @ diag.transpose(0, 2, 1) + (3.0 * s) * np.eye(s)
    off = 0.5 * rng.standard_normal((max(num_states - 1, 0), s, s))
    return BlockTridiag(jnp.asarray(diag, dtype), jnp.asarray(off, dtype))


class TestDenseRoundtrip:
    def test_roundtrip(self):
        A = random_spd_btd(5, 3)
        B = BlockTridiag.from_dense(A.to_dense(), 5)
        np.testing.assert_allclose(B.to_dense(), A.to_dense())

    def test_matvec(self):
        A = random_spd_btd(6, 4, seed=1)
        x = jnp.asarray(np.random.default_rng(2).standard_normal(24))
        np.testing.assert_allclose(A.matvec(x), A.to_dense() @ x, rtol=1e-12)


class TestLogdetSolve:
    @pytest.mark.parametrize("n,s", [(1, 3), (2, 2), (20, 14), (7, 1)])
    def test_logdet(self, n, s):
        A = random_spd_btd(n, s, seed=n * 10 + s)
        expected = np.linalg.slogdet(np.asarray(A.to_dense()))[1]
        np.testing.assert_allclose(logdet(A), expected, rtol=1e-10)

    @pytest.mark.parametrize("n,s", [(1, 3), (2, 2), (20, 14), (7, 1)])
    def test_solve(self, n, s):
        A = random_spd_btd(n, s, seed=n * 7 + s)
        b = jnp.asarray(np.random.default_rng(3).standard_normal(n * s))
        x = solve(A, b)
        np.testing.assert_allclose(A.to_dense() @ x, b, atol=1e-9)

    def test_solve_jit(self):
        A = random_spd_btd(10, 4)
        b = jnp.ones(40)
        x = jax.jit(solve)(A, b)
        np.testing.assert_allclose(A.to_dense() @ x, b, atol=1e-9)


class TestGBP:
    @pytest.mark.parametrize("n,s", [(20, 14), (1, 5), (2, 3), (10, 4)])
    def test_gbp_matches_dense_inverse(self, n, s):
        """The reference's GBP-vs-dense harness (src/GBP.cpp:133-158)."""
        A = random_spd_btd(n, s, seed=42 + n)
        cov_diag, cov_off = gbp_covariance(A)
        dense_cov = np.linalg.inv(np.asarray(A.to_dense()))
        for i in range(n):
            np.testing.assert_allclose(
                cov_diag[i], dense_cov[i * s:(i + 1) * s, i * s:(i + 1) * s],
                atol=1e-10,
            )
        for i in range(n - 1):
            np.testing.assert_allclose(
                cov_off[i], dense_cov[i * s:(i + 1) * s, (i + 1) * s:(i + 2) * s],
                atol=1e-10,
            )

    def test_gbp_jit(self):
        A = random_spd_btd(8, 3)
        cov_diag, _ = jax.jit(gbp_covariance)(A)
        dense_cov = np.linalg.inv(np.asarray(A.to_dense()))
        np.testing.assert_allclose(cov_diag[0], dense_cov[:3, :3], atol=1e-10)


class TestPSD:
    def test_sqrtm(self):
        rng = np.random.default_rng(0)
        m = rng.standard_normal((5, 5))
        a = jnp.asarray(m @ m.T + 5 * np.eye(5))
        r = psd_sqrtm(a)
        np.testing.assert_allclose(r @ r, a, atol=1e-10)

    def test_sqrtm_product(self):
        rng = np.random.default_rng(1)
        m = rng.standard_normal((4, 4))
        a = jnp.asarray(m @ m.T)
        s = 0.3
        expected_sq = a @ (a + 4 * s * np.eye(4))
        r = sqrtm_product(a, s)
        np.testing.assert_allclose(r @ r, expected_sq, atol=1e-9)
