"""Factor graph over a trajectory chain + marginal gather/scatter.

Replaces the reference's per-factor ``TrajectoryBlock`` local<->joint mapping
and dense block insertion (helpers/MatrixHelper.h:119-161,
ngd/NGDFactorizedBaseGH.h:91-106) with batched gathers from the GBP
covariance blocks and scatter-adds into the block-tridiagonal joint — both
single XLA scatter/gather ops over the whole factor batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from ..factors.base import LinearFactorBatch, NonlinearFactorBatch
from ..ops.blocktridiag import BlockTridiag


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class GaussianState:
    """The variational posterior q = N(mu, precision^{-1})."""

    mu: jnp.ndarray               # [N, s]
    precision: BlockTridiag       # [N,s,s] / [N-1,s,s]

    @property
    def num_states(self) -> int:
        return self.mu.shape[0]

    @property
    def state_dim(self) -> int:
        return self.mu.shape[-1]


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class FactorGraph:
    """All factors of a problem, grouped by type."""

    num_states: int = field(metadata=dict(static=True))
    state_dim: int = field(metadata=dict(static=True))
    nonlinear: tuple[NonlinearFactorBatch, ...] = ()
    linear: tuple[LinearFactorBatch, ...] = ()


def gather_marginals(
    start: jnp.ndarray,
    nb: int,
    mu: jnp.ndarray,
    cov_diag: jnp.ndarray,
    cov_off: jnp.ndarray,
    slice_offset: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-factor marginal (mu_k [K,d], cov_k [K,d,d]) from the chain blocks.

    nb == 1: one diagonal block.  nb == 2: the 2x2 block
    [[Sig_ii, Sig_i,i+1], [., Sig_i+1,i+1]] — exactly what GBP returns.

    When the supports are consecutive (``start == slice_offset + arange(K)``,
    detected statically at build time) the indexing lowers to static slices —
    no XLA gather ops on the hot path.
    """
    k = start.shape[0]
    if slice_offset is not None:
        o = slice_offset

        def idx(arr, shift=0):
            return jax.lax.slice_in_dim(arr, o + shift, o + shift + k, axis=0)
    else:
        def idx(arr, shift=0):
            return arr[start + shift] if shift else arr[start]

    if nb == 1:
        return idx(mu), idx(cov_diag)
    if nb == 2:
        mu_k = jnp.concatenate([idx(mu), idx(mu, 1)], axis=-1)
        off_k = idx(cov_off)
        top = jnp.concatenate([idx(cov_diag), off_k], axis=-1)
        bot = jnp.concatenate(
            [jnp.swapaxes(off_k, -1, -2), idx(cov_diag, 1)], axis=-1
        )
        return mu_k, jnp.concatenate([top, bot], axis=-2)
    raise NotImplementedError(f"factor span nb={nb} not supported (use 1 or 2)")


def gather_chain_edges(
    start: jnp.ndarray,
    mu: jnp.ndarray,
    cov_diag: jnp.ndarray,
    cov_off: jnp.ndarray,
    slice_offset: int | None = None,
) -> tuple[jnp.ndarray, ...]:
    """Per-edge-factor chain pieces ``(mu_i, mu_ip1, cd_i, cd_ip1, co_i)``
    for nb == 2 supports — the raw blocks :func:`gather_marginals` would
    assemble into the [K, 2s, 2s] edge marginal, left unassembled for
    consumers that can work blockwise (``moments.linear_cost_chain``)."""
    k = start.shape[0]
    if slice_offset is not None:
        o = slice_offset

        def idx(arr, shift=0):
            return jax.lax.slice_in_dim(arr, o + shift, o + shift + k, axis=0)
    else:
        def idx(arr, shift=0):
            return arr[start + shift] if shift else arr[start]

    return idx(mu), idx(mu, 1), idx(cov_diag), idx(cov_diag, 1), idx(cov_off)


def scatter_gradients(
    start: jnp.ndarray,
    nb: int,
    vdmu: jnp.ndarray,
    vddmu: jnp.ndarray,
    grad_mu: jnp.ndarray,
    grad_prec: BlockTridiag,
    slice_offset: int | None = None,
) -> tuple[jnp.ndarray, BlockTridiag]:
    """Scatter-add per-factor (Vdmu [K,d], Vddmu [K,d,d]) into the joint.

    Duplicate factor indices accumulate (XLA scatter-add), replacing the
    reference's OpenMP thread-private accumulators + critical reduce
    (ngd/NGD-GH-impl.h:33-51).  Consecutive supports (``slice_offset``, see
    :func:`gather_marginals`) lower to slice-adds instead of scatters.
    """
    s = grad_mu.shape[-1]
    k = start.shape[0]
    if slice_offset is not None:
        o = slice_offset

        def add(arr, v, shift=0):
            return arr.at[o + shift:o + shift + k].add(v)
    else:
        def add(arr, v, shift=0):
            return arr.at[start + shift].add(v) if shift else arr.at[start].add(v)

    if nb == 1:
        grad_mu = add(grad_mu, vdmu)
        diag = add(grad_prec.diag, vddmu)
        return grad_mu, BlockTridiag(diag, grad_prec.off)
    if nb == 2:
        vdmu_b = vdmu.reshape(k, 2, s)
        grad_mu = add(grad_mu, vdmu_b[:, 0])
        grad_mu = add(grad_mu, vdmu_b[:, 1], 1)
        vddmu_b = vddmu.reshape(k, 2, s, 2, s)
        diag = add(grad_prec.diag, vddmu_b[:, 0, :, 0, :])
        diag = add(diag, vddmu_b[:, 1, :, 1, :], 1)
        off = add(grad_prec.off, vddmu_b[:, 0, :, 1, :])
        return grad_mu, BlockTridiag(diag, off)
    raise NotImplementedError(f"factor span nb={nb} not supported (use 1 or 2)")
