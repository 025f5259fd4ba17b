"""Sequence-parallel (time-axis sharded) chain inference vs the
single-device engines, on the virtual 8-CPU mesh.

This is the multi-device realization of SURVEY.md section 5.7's sequence
parallelism: N states sharded over the ``sp`` mesh axis, boundary coupling
via all_gather of tiny segment summaries + ppermute of boundary pivots.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from gaussianvi_tpu.ops.blocktridiag import (
    BlockTridiag,
    gbp_covariance_logdet,
    solve,
)
from gaussianvi_tpu.parallel.chain_seqpar import (
    gbp_covariance_logdet_seqpar,
    pad_off_for_seqpar,
    solve_seqpar,
)


def random_chain(key, n, s):
    k1, k2, k3 = jax.random.split(key, 3)
    a = jax.random.normal(k1, (n, s, s)) * 0.3
    diag = a @ jnp.swapaxes(a, -1, -2) + 3.0 * jnp.eye(s)
    off = jax.random.normal(k2, (n - 1, s, s)) * 0.2
    rhs = jax.random.normal(k3, (n, s))
    return BlockTridiag(diag, off), rhs


def sp_mesh(p):
    return Mesh(np.asarray(jax.devices()[:p]), ("sp",))


@pytest.mark.parametrize("p,n,s", [(8, 32, 3), (4, 8, 4), (2, 16, 2)])
class TestSeqParChain:
    def test_covariance_logdet(self, p, n, s):
        assert len(jax.devices()) >= p
        A, _ = random_chain(jax.random.key(n * 10 + s), n, s)
        off_pad = pad_off_for_seqpar(A.off)

        @jax.jit
        def run(diag, off):
            f = jax.shard_map(
                lambda d, o: gbp_covariance_logdet_seqpar(d, o, "sp"),
                mesh=sp_mesh(p),
                in_specs=(P("sp"), P("sp")),
                out_specs=(P("sp"), P("sp"), P()),
            )
            return f(diag, off)

        cd, co, ld = run(A.diag, off_pad)
        rcd, rco, rld = gbp_covariance_logdet(A)
        np.testing.assert_allclose(cd, rcd, rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(co[:-1], rco, rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(co[-1], 0.0)  # padding row
        np.testing.assert_allclose(float(ld), float(rld), rtol=1e-11)

    def test_solve(self, p, n, s):
        A, rhs = random_chain(jax.random.key(n * 7 + s), n, s)
        off_pad = pad_off_for_seqpar(A.off)

        @jax.jit
        def run(diag, off, b):
            f = jax.shard_map(
                lambda d, o, bb: solve_seqpar(d, o, bb, "sp"),
                mesh=sp_mesh(p),
                in_specs=(P("sp"), P("sp"), P("sp")),
                out_specs=P("sp"),
            )
            return f(diag, off, b)

        x = run(A.diag, off_pad, rhs)
        x_ref = solve(A, rhs.reshape(-1)).reshape(n, s)
        np.testing.assert_allclose(x, x_ref, rtol=1e-8, atol=1e-10)

    def test_residual_is_zero(self, p, n, s):
        """A x == b through the sharded solve (independent of the
        reference implementation)."""
        A, rhs = random_chain(jax.random.key(n + s), n, s)
        off_pad = pad_off_for_seqpar(A.off)

        @jax.jit
        def run(diag, off, b):
            f = jax.shard_map(
                lambda d, o, bb: solve_seqpar(d, o, bb, "sp"),
                mesh=sp_mesh(p),
                in_specs=(P("sp"), P("sp"), P("sp")),
                out_specs=P("sp"),
            )
            return f(diag, off, b)

        x = run(A.diag, off_pad, rhs)
        resid = A.matvec(x.reshape(-1)) - rhs.reshape(-1)
        np.testing.assert_allclose(resid, 0.0, atol=1e-9)


class TestSingleSegmentDegenerate:
    def test_one_device_matches(self):
        """p=1: no cross-device folding at all; pure local path."""
        A, rhs = random_chain(jax.random.key(0), 6, 3)
        off_pad = pad_off_for_seqpar(A.off)

        @jax.jit
        def run(diag, off, b):
            f = jax.shard_map(
                lambda d, o, bb: (
                    *gbp_covariance_logdet_seqpar(d, o, "sp"),
                    solve_seqpar(d, o, bb, "sp"),
                ),
                mesh=sp_mesh(1),
                in_specs=(P("sp"), P("sp"), P("sp")),
                out_specs=(P("sp"), P("sp"), P(), P("sp")),
            )
            return f(diag, off, b)

        cd, co, ld, x = run(A.diag, off_pad, rhs)
        rcd, rco, rld = gbp_covariance_logdet(A)
        np.testing.assert_allclose(cd, rcd, rtol=1e-10)
        np.testing.assert_allclose(float(ld), float(rld), rtol=1e-11)
        np.testing.assert_allclose(
            x, solve(A, rhs.reshape(-1)).reshape(6, 3), rtol=1e-9
        )
