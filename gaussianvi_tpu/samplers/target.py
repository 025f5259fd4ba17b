"""Pointwise joint density of a factor graph.

GVI minimizes KL[q || p] with p(X|Z) ∝ exp(-sum_k psi_k(x_k)); the samplers
(HMC/NUTS/SMC) operate on the same factorized target evaluated POINTWISE
(no quadrature): psi(x) = sum over factor batches of psi_k at the gathered
local states.  This reuses exactly the graph structure the optimizers use,
so the validation harness compares apples to apples.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..inference.graph import FactorGraph
from ..ops.precision import einsum


def _gather_local(x: jnp.ndarray, start: jnp.ndarray, nb: int) -> jnp.ndarray:
    """x [N, s] -> local supports [K, nb*s]."""
    if nb == 1:
        return x[start]
    if nb == 2:
        return jnp.concatenate([x[start], x[start + 1]], axis=-1)
    raise NotImplementedError(f"nb={nb}")


def neg_log_prob(graph: FactorGraph, x: jnp.ndarray) -> jnp.ndarray:
    """psi(x) = -log p(x|Z) + const for x [N, s]."""
    total = jnp.zeros((), x.dtype)
    for fb in graph.nonlinear:
        x_k = _gather_local(x, fb.start, fb.nb)
        if fb.params is None:
            vals = jax.vmap(lambda xi: fb.cost_fn(xi, None))(x_k)
        else:
            vals = jax.vmap(fb.cost_fn)(x_k, fb.params)
        total = total + jnp.sum(vals)
    for lb in graph.linear:
        x_k = _gather_local(x, lb.start, lb.nb)
        resid = einsum("krd,kd->kr", lb.lam, x_k) - einsum(
            "krt,kt->kr", lb.psi, lb.target_mu
        )
        quad = einsum("kr,krs,ks->k", resid, lb.target_prec, resid)
        total = total + jnp.sum(quad * lb.constant)
    return total


def make_log_density(graph: FactorGraph, num_states: int, state_dim: int):
    """Flat-vector log-density callable for the samplers."""

    def log_density(theta: jnp.ndarray) -> jnp.ndarray:
        x = theta.reshape(num_states, state_dim)
        return -neg_log_prob(graph, x)

    return log_density
