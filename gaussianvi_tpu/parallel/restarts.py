"""Parallel restarts: batched multi-initialization GVI with best-of selection.

The north-star's "parallel restarts sharded across chips" axis
(BASELINE.json; SURVEY.md section 5.8): GVI converges to a local KL optimum,
so production planning runs R randomized initializations in parallel and
keeps the lowest-cost posterior.  Here the R restarts are one vmapped
(optionally dp-sharded) `optimize` call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..inference.config import GVIConfig
from ..inference.graph import FactorGraph, GaussianState
from ..inference.gvi import joint_cost
from ..inference.optimize import optimize
from ..ops.blocktridiag import BlockTridiag


def perturb_inits(
    init: GaussianState, key, num_restarts: int, mean_scale: float = 1.0
) -> GaussianState:
    """R randomized initial states: mean jittered, precision shared."""
    noise = mean_scale * jax.random.normal(
        key, (num_restarts,) + init.mu.shape, init.mu.dtype
    )
    noise = noise.at[0].set(0.0)  # keep the nominal init as restart 0
    mu_b = init.mu[None] + noise
    prec_b = BlockTridiag(
        jnp.broadcast_to(
            init.precision.diag, (num_restarts,) + init.precision.diag.shape
        ),
        jnp.broadcast_to(
            init.precision.off, (num_restarts,) + init.precision.off.shape
        ),
    )
    return GaussianState(mu_b, prec_b)


def optimize_restarts(
    graph: FactorGraph,
    init: GaussianState,
    key,
    num_restarts: int = 8,
    config: GVIConfig = GVIConfig(),
    method: str = "ngd",
    mean_scale: float = 1.0,
):
    """Run R restarts in one batched computation; return (best_state,
    best_cost, all_final_costs)."""
    inits = perturb_inits(init, key, num_restarts, mean_scale)

    def one(mu, diag, off):
        state = GaussianState(mu, BlockTridiag(diag, off))
        final, _ = optimize(graph, state, config, method)
        cost = joint_cost(
            graph, final.mu, final.precision, config.temperature,
            temper_costs=method == "ngd",
        )
        return final, cost

    finals, costs = jax.vmap(one)(
        inits.mu, inits.precision.diag, inits.precision.off
    )
    best = jnp.argmin(costs)
    best_state = jax.tree.map(lambda x: x[best], finals)
    return best_state, costs[best], costs
