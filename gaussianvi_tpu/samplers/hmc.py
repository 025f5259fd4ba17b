"""Hamiltonian Monte Carlo with dual-averaging step-size adaptation.

Posterior-validation baseline for the GVI engines (BASELINE.json north-star:
"VI complemented by HMC/NUTS and SMC baselines").  Pure JAX: the whole chain
is one ``lax.scan``; multiple chains vmap over the leading axis.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class HMCResult(NamedTuple):
    samples: jnp.ndarray       # [num_samples, D]
    accept_prob: jnp.ndarray   # [num_samples]
    step_size: jnp.ndarray     # final adapted step size


def _leapfrog(grad_fn, position, momentum, step_size, num_steps, inv_mass):
    def body(_, carry):
        q, p = carry
        p = p + 0.5 * step_size * grad_fn(q)
        q = q + step_size * inv_mass * p
        p = p + 0.5 * step_size * grad_fn(q)
        return (q, p)

    return lax.fori_loop(0, num_steps, body, (position, momentum))


@partial(
    jax.jit,
    static_argnames=(
        "log_density", "num_samples", "num_warmup", "num_leapfrog"
    ),
)
def hmc(
    log_density: Callable[[jnp.ndarray], jnp.ndarray],
    init_position: jnp.ndarray,
    key: jnp.ndarray,
    num_samples: int = 1000,
    num_warmup: int = 500,
    num_leapfrog: int = 16,
    init_step_size: float = 0.1,
    target_accept: float = 0.8,
    inv_mass: jnp.ndarray | float = 1.0,
) -> HMCResult:
    """Adaptive HMC.  Warmup adapts log step size by dual averaging
    (Nesterov primal-dual as in Hoffman & Gelman 2014, Alg. 5)."""
    grad_fn = jax.grad(log_density)
    dim = init_position.shape[-1]
    inv_mass = jnp.broadcast_to(jnp.asarray(inv_mass), (dim,))
    mass_sqrt = 1.0 / jnp.sqrt(inv_mass)

    mu_da = jnp.log(10.0 * init_step_size)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def transition(carry, inputs):
        q, log_eps, h_bar, log_eps_bar, m = carry
        k = inputs
        k1, k2 = jax.random.split(k)
        eps = jnp.exp(log_eps)
        p0 = jax.random.normal(k1, (dim,), q.dtype) * mass_sqrt
        q_new, p_new = _leapfrog(grad_fn, q, p0, eps, num_leapfrog, inv_mass)
        h0 = -log_density(q) + 0.5 * jnp.sum(inv_mass * p0**2)
        h1 = -log_density(q_new) + 0.5 * jnp.sum(inv_mass * p_new**2)
        log_alpha = jnp.minimum(0.0, h0 - h1)
        alpha = jnp.exp(log_alpha)
        alpha = jnp.where(jnp.isfinite(alpha), alpha, 0.0)
        accept = jax.random.uniform(k2, (), q.dtype) < alpha
        q = jnp.where(accept, q_new, q)

        # dual averaging (warmup only)
        in_warmup = m < num_warmup
        mm = m + 1
        h_bar_new = (
            (1.0 - 1.0 / (mm + t0)) * h_bar
            + (target_accept - alpha) / (mm + t0)
        )
        log_eps_new = mu_da - jnp.sqrt(mm.astype(q.dtype)) / gamma * h_bar_new
        eta = mm.astype(q.dtype) ** (-kappa)
        log_eps_bar_new = eta * log_eps_new + (1.0 - eta) * log_eps_bar
        log_eps = jnp.where(in_warmup, log_eps_new, log_eps_bar)
        h_bar = jnp.where(in_warmup, h_bar_new, h_bar)
        log_eps_bar = jnp.where(in_warmup, log_eps_bar_new, log_eps_bar)
        return (q, log_eps, h_bar, log_eps_bar, mm), (q, alpha)

    keys = jax.random.split(key, num_warmup + num_samples)
    init = (
        init_position,
        jnp.log(jnp.asarray(init_step_size, init_position.dtype)),
        jnp.zeros((), init_position.dtype),
        jnp.log(jnp.asarray(init_step_size, init_position.dtype)),
        jnp.zeros((), jnp.int32),
    )
    (q_f, log_eps_f, _, log_eps_bar, _), (qs, alphas) = lax.scan(
        transition, init, keys
    )
    return HMCResult(
        samples=qs[num_warmup:],
        accept_prob=alphas[num_warmup:],
        step_size=jnp.exp(log_eps_f),
    )


def run_chains(
    log_density, init_positions, key, **kwargs
) -> HMCResult:
    """vmapped multi-chain HMC: init_positions [C, D] -> samples [C, T, D]."""
    n_chains = init_positions.shape[0]
    keys = jax.random.split(key, n_chains)
    return jax.vmap(
        lambda q0, k: hmc(log_density, q0, k, **kwargs)
    )(init_positions, keys)
