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
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-factor marginal (mu_k [K,d], cov_k [K,d,d]) from the chain blocks.

    nb == 1: one diagonal block.  nb == 2: the 2x2 block
    [[Sig_ii, Sig_i,i+1], [., Sig_i+1,i+1]] — exactly what GBP returns.
    """
    if nb == 1:
        return mu[start], cov_diag[start]
    if nb == 2:
        mu_k = jnp.concatenate([mu[start], mu[start + 1]], axis=-1)
        top = jnp.concatenate([cov_diag[start], cov_off[start]], axis=-1)
        bot = jnp.concatenate(
            [jnp.swapaxes(cov_off[start], -1, -2), cov_diag[start + 1]], axis=-1
        )
        return mu_k, jnp.concatenate([top, bot], axis=-2)
    raise NotImplementedError(f"factor span nb={nb} not supported (use 1 or 2)")


def scatter_gradients(
    start: jnp.ndarray,
    nb: int,
    vdmu: jnp.ndarray,
    vddmu: jnp.ndarray,
    grad_mu: jnp.ndarray,
    grad_prec: BlockTridiag,
) -> tuple[jnp.ndarray, BlockTridiag]:
    """Scatter-add per-factor (Vdmu [K,d], Vddmu [K,d,d]) into the joint.

    Duplicate factor indices accumulate (XLA scatter-add), replacing the
    reference's OpenMP thread-private accumulators + critical reduce
    (ngd/NGD-GH-impl.h:33-51).
    """
    s = grad_mu.shape[-1]
    k = start.shape[0]
    if nb == 1:
        grad_mu = grad_mu.at[start].add(vdmu)
        diag = grad_prec.diag.at[start].add(vddmu)
        return grad_mu, BlockTridiag(diag, grad_prec.off)
    if nb == 2:
        vdmu_b = vdmu.reshape(k, 2, s)
        grad_mu = grad_mu.at[start].add(vdmu_b[:, 0])
        grad_mu = grad_mu.at[start + 1].add(vdmu_b[:, 1])
        vddmu_b = vddmu.reshape(k, 2, s, 2, s)
        diag = grad_prec.diag.at[start].add(vddmu_b[:, 0, :, 0, :])
        diag = diag.at[start + 1].add(vddmu_b[:, 1, :, 1, :])
        off = grad_prec.off.at[start].add(vddmu_b[:, 0, :, 1, :])
        return grad_mu, BlockTridiag(diag, off)
    raise NotImplementedError(f"factor span nb={nb} not supported (use 1 or 2)")
