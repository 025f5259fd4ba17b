"""Adaptive-tempering Sequential Monte Carlo with HMC mutations.

Second posterior-validation baseline (BASELINE.json north-star).  Particles
start from a Gaussian reference (typically the GP-prior part of the graph or
the GVI solution itself); the nonlinear part of the target is annealed in
with an ESS-adaptive temperature ladder; systematic resampling + a few HMC
mutation steps per stage.  Fully jittable: the ladder is a bounded
``lax.while_loop``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class SMCResult(NamedTuple):
    particles: jnp.ndarray       # [P, D]
    weights: jnp.ndarray         # [P] normalized
    log_evidence: jnp.ndarray    # log Z estimate (up to reference const)
    num_stages: jnp.ndarray


def _systematic_resample(key, weights, particles):
    p = weights.shape[0]
    positions = (jax.random.uniform(key, ()) + jnp.arange(p)) / p
    cumsum = jnp.cumsum(weights)
    idx = jnp.searchsorted(cumsum, positions)
    idx = jnp.clip(idx, 0, p - 1)
    return particles[idx]


def _hmc_mutate(key, particles, log_target, step_size, num_steps, n_moves):
    grad = jax.grad(log_target)

    def one_move(carry, k):
        q = carry

        def single(qi, ki):
            k1, k2 = jax.random.split(ki)
            p0 = jax.random.normal(k1, qi.shape, qi.dtype)

            def leap(_, c):
                qq, pp = c
                pp = pp + 0.5 * step_size * grad(qq)
                qq = qq + step_size * pp
                pp = pp + 0.5 * step_size * grad(qq)
                return (qq, pp)

            q1, p1 = lax.fori_loop(0, num_steps, leap, (qi, p0))
            h0 = -log_target(qi) + 0.5 * jnp.sum(p0**2)
            h1 = -log_target(q1) + 0.5 * jnp.sum(p1**2)
            alpha = jnp.exp(jnp.minimum(0.0, h0 - h1))
            alpha = jnp.where(jnp.isfinite(alpha), alpha, 0.0)
            accept = jax.random.uniform(k2, (), qi.dtype) < alpha
            return jnp.where(accept, q1, qi)

        keys = jax.random.split(k, q.shape[0])
        return jax.vmap(single)(q, keys), None

    keys = jax.random.split(key, n_moves)
    out, _ = lax.scan(one_move, particles, keys)
    return out


@partial(
    jax.jit,
    static_argnames=(
        "log_reference", "log_target_delta", "num_particles",
        "mutation_steps", "mutations_per_stage", "max_stages",
    ),
)
def smc_adaptive(
    log_reference: Callable[[jnp.ndarray], jnp.ndarray],
    log_target_delta: Callable[[jnp.ndarray], jnp.ndarray],
    init_particles: jnp.ndarray,
    key: jnp.ndarray,
    num_particles: int = 512,
    ess_threshold: float = 0.5,
    mutation_step_size: float = 0.1,
    mutation_steps: int = 8,
    mutations_per_stage: int = 2,
    max_stages: int = 50,
) -> SMCResult:
    """Anneal from ``log_reference`` to ``log_reference + log_target_delta``
    via lambda in [0, 1], choosing each increment by bisection so the stage
    ESS stays at ``ess_threshold * P``."""
    p = init_particles.shape[0]
    delta_batch = jax.vmap(log_target_delta)

    def stage_cond(carry):
        _, _, lam, _, _, n = carry
        return jnp.logical_and(lam < 1.0, n < max_stages)

    def stage_body(carry):
        particles, log_z, lam, key_c, _, n = carry
        key_c, k_bis, k_res, k_mut = jax.random.split(key_c, 4)
        deltas = delta_batch(particles)

        # bisect the largest d_lam with ESS >= threshold
        def ess_at(d_lam):
            logw = d_lam * deltas
            logw = logw - jnp.max(logw)
            w = jnp.exp(logw)
            w = w / jnp.sum(w)
            return 1.0 / jnp.sum(w**2)

        def bis_body(_, bounds):
            lo, hi = bounds
            mid = 0.5 * (lo + hi)
            ok = ess_at(mid) >= ess_threshold * p
            return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

        lo, hi = lax.fori_loop(
            0, 20, bis_body, (jnp.zeros_like(lam), 1.0 - lam)
        )
        d_lam = jnp.where(ess_at(1.0 - lam) >= ess_threshold * p,
                          1.0 - lam, lo)
        d_lam = jnp.maximum(d_lam, 1e-4)
        d_lam = jnp.minimum(d_lam, 1.0 - lam)

        logw = d_lam * deltas
        log_z = log_z + jax.scipy.special.logsumexp(logw) - jnp.log(
            jnp.asarray(p, logw.dtype)
        )
        w = jnp.exp(logw - jnp.max(logw))
        w = w / jnp.sum(w)

        particles = _systematic_resample(k_res, w, particles)
        new_lam = lam + d_lam

        def log_tempered(x):
            return log_reference(x) + new_lam * log_target_delta(x)

        particles = _hmc_mutate(
            k_mut, particles, log_tempered, mutation_step_size,
            mutation_steps, mutations_per_stage,
        )
        return (particles, log_z, new_lam, key_c,
                jnp.full((p,), 1.0 / p, particles.dtype), n + 1)

    init = (
        init_particles,
        jnp.zeros((), init_particles.dtype),
        jnp.zeros((), init_particles.dtype),
        key,
        jnp.full((p,), 1.0 / p, init_particles.dtype),
        jnp.zeros((), jnp.int32),
    )
    particles, log_z, lam, _, weights, n = lax.while_loop(
        stage_cond, stage_body, init
    )
    return SMCResult(particles, weights, log_z, n)
