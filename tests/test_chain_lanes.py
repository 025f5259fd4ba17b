"""Lanes-layout Pallas chain kernel vs the scan oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianvi_tpu.kernels.chain_lanes import (
    gbp_covariance_logdet_lanes,
    gbp_covariance_logdet_lanes_single,
)
from gaussianvi_tpu.ops.blocktridiag import (
    BlockTridiag,
    gbp_covariance_logdet,
    solve,
)
from tests.test_blocktridiag import random_spd_btd


@pytest.mark.parametrize("b,n,s", [(3, 7, 4), (2, 1, 3), (2, 2, 2), (1, 5, 1)])
def test_matches_scan(b, n, s):
    rng = np.random.default_rng(b * 10 + n)
    diag = rng.standard_normal((b, n, s, s))
    diag = diag @ diag.transpose(0, 1, 3, 2) + 3 * s * np.eye(s)
    off = 0.5 * rng.standard_normal((b, max(n - 1, 0), s, s))
    cd, co, ld = gbp_covariance_logdet_lanes(
        jnp.asarray(diag), jnp.asarray(off), interpret=True
    )
    for i in range(b):
        cd0, co0, ld0 = gbp_covariance_logdet(
            BlockTridiag(jnp.asarray(diag[i]), jnp.asarray(off[i]))
        )
        np.testing.assert_allclose(cd[i], cd0, atol=1e-10)
        if n > 1:
            np.testing.assert_allclose(co[i], co0, atol=1e-10)
        np.testing.assert_allclose(ld[i], ld0, atol=1e-10)


def test_vmap_composition():
    """Nested vmaps must flatten onto the lane axis via the custom rule."""
    A1 = random_spd_btd(5, 3, seed=1)
    A2 = random_spd_btd(5, 3, seed=2)
    diag = jnp.stack([A1.diag, A2.diag])
    off = jnp.stack([A1.off, A2.off])

    def single(d, o):
        return gbp_covariance_logdet_lanes_single(BlockTridiag(d, o))

    cd, co, ld = jax.vmap(single)(diag, off)
    for i, A in enumerate((A1, A2)):
        cd0, co0, ld0 = gbp_covariance_logdet(A)
        np.testing.assert_allclose(cd[i], cd0, atol=1e-10)
        np.testing.assert_allclose(ld[i], ld0, atol=1e-10)


@pytest.mark.parametrize("b,n,s", [(3, 7, 4), (2, 1, 3), (1, 20, 14)])
def test_solve_matches(b, n, s):
    from gaussianvi_tpu.kernels.chain_lanes import solve_lanes
    from gaussianvi_tpu.ops.blocktridiag import solve

    rng = np.random.default_rng(b + n)
    diag = rng.standard_normal((b, n, s, s))
    diag = diag @ diag.transpose(0, 1, 3, 2) + 3 * s * np.eye(s)
    off = 0.5 * rng.standard_normal((b, max(n - 1, 0), s, s))
    rhs = rng.standard_normal((b, n, s))
    x = solve_lanes(
        jnp.asarray(diag), jnp.asarray(off), jnp.asarray(rhs), interpret=True
    )
    for i in range(b):
        x0 = solve(
            BlockTridiag(jnp.asarray(diag[i]), jnp.asarray(off[i])),
            jnp.asarray(rhs[i].reshape(-1)),
        )
        np.testing.assert_allclose(
            np.asarray(x[i]).reshape(-1), x0, atol=1e-10
        )


class TestVMEMChunking:
    """The kernel grids over batch-row chunks under a VMEM budget and falls
    back to the scan path when one row doesn't fit."""

    def _problem(self, b, n, s, seed=0):
        key = jax.random.key(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        a = jax.random.normal(k1, (b, n, s, s)) * 0.3
        diag = a @ jnp.swapaxes(a, -1, -2) + 3.0 * jnp.eye(s)
        off = jax.random.normal(k2, (b, n - 1, s, s)) * 0.2
        rhs = jax.random.normal(k3, (b, n, s))
        return diag, off, rhs

    def _reference(self, diag, off, rhs):
        n, s = diag.shape[1], diag.shape[-1]
        ref_cov = jax.vmap(
            lambda d, o: gbp_covariance_logdet(BlockTridiag(d, o))
        )(diag, off)
        ref_x = jax.vmap(
            lambda d, o, r: solve(BlockTridiag(d, o), r.reshape(-1)).reshape(n, s)
        )(diag, off, rhs)
        return ref_cov, ref_x

    def test_multi_chunk_grid(self, monkeypatch):
        from gaussianvi_tpu.kernels import chain_lanes

        # shrink the budget so B=300 (3 rows of 128) needs 3 grid steps
        # (multi-grid configurations get HALF the budget for output
        # double-buffering, hence the factor 2)
        monkeypatch.setattr(chain_lanes, "_MAX_ROW_ELEMS", 2 * 6 * 4 * 4)
        assert chain_lanes._row_block(6, 4, 300) == 1
        diag, off, rhs = self._problem(300, 6, 4)
        cd, co, ld = chain_lanes.gbp_covariance_logdet_lanes(
            diag, off, interpret=True
        )
        x = chain_lanes.solve_lanes(diag, off, rhs, interpret=True)
        (rcd, rco, rld), rx = self._reference(diag, off, rhs)
        np.testing.assert_allclose(cd, rcd, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(ld, rld, rtol=1e-5)
        np.testing.assert_allclose(x, rx, rtol=1e-4, atol=1e-6)

    def test_chunked_single_grid_mode(self, monkeypatch):
        """per_row fits a single-grid call but not the halved multi-grid
        budget: the wrapper must run sequential 128-lane chunks (the
        N=512 trial-batch configuration), not the scan fallback."""
        from gaussianvi_tpu.kernels import chain_lanes

        monkeypatch.setattr(chain_lanes, "_MAX_ROW_ELEMS", 6 * 4 * 4)
        assert chain_lanes._row_block(6, 4, 300) == 0  # multi-grid: over
        assert chain_lanes._row_block(6, 4, 100) == 1  # single chunk: fits
        diag, off, rhs = self._problem(300, 6, 4, seed=2)
        cd, co, ld = chain_lanes.gbp_covariance_logdet_lanes(
            diag, off, interpret=True
        )
        x = chain_lanes.solve_lanes(diag, off, rhs, interpret=True)
        (rcd, rco, rld), rx = self._reference(diag, off, rhs)
        np.testing.assert_allclose(cd, rcd, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(co, rco, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(ld, rld, rtol=1e-5)
        np.testing.assert_allclose(x, rx, rtol=1e-4, atol=1e-6)

    def test_scan_fallback_when_chain_too_long(self, monkeypatch):
        from gaussianvi_tpu.kernels import chain_lanes

        monkeypatch.setattr(chain_lanes, "_MAX_ROW_ELEMS", 10)
        assert chain_lanes._row_block(6, 4, 8) == 0
        diag, off, rhs = self._problem(8, 6, 4, seed=1)
        cd, co, ld = chain_lanes.gbp_covariance_logdet_lanes(diag, off)
        x = chain_lanes.solve_lanes(diag, off, rhs)
        (rcd, rco, rld), rx = self._reference(diag, off, rhs)
        np.testing.assert_allclose(cd, rcd, rtol=1e-6)
        np.testing.assert_allclose(ld, rld, rtol=1e-6)
        np.testing.assert_allclose(x, rx, rtol=1e-6)
