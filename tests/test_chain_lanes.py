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
