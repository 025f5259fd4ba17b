"""No-U-Turn Sampler (multinomial variant), jittable.

Completes the HMC/NUTS/SMC validation trio (BASELINE.json north-star).
Implementation: Hoffman & Gelman (2014) tree doubling with Betancourt's
multinomial state selection.  Two tree builders:

* ``tree_method="iterative"`` (default) — the doubling loop and the subtree
  construction are ``lax.while_loop``s with a checkpoint stack for the
  U-turn checks, so the compiled program is O(max_depth) in size and deep
  trees (max_depth 10+) compile in seconds.  The checkpoint scheme stores a
  leaf's state when its index is even and, at each odd leaf, checks the
  U-turn condition against exactly the stored endpoints of every balanced
  subtree that closes there — the same segment set the recursive algorithm
  examines.
* ``tree_method="unrolled"`` — trace-time recursion with a fully unrolled
  program of 2^max_depth leapfrog steps (the original implementation; kept
  for cross-validation).

Both are pure ``lax`` control flow — no data-dependent Python branching —
and draw-for-draw use the same dual-averaging step-size adaptation as
:mod:`gaussianvi_tpu.samplers.hmc`.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


class NUTSResult(NamedTuple):
    samples: jnp.ndarray      # [num_samples, D]
    step_size: jnp.ndarray
    mean_accept: jnp.ndarray


class _Tree(NamedTuple):
    q_minus: jnp.ndarray
    p_minus: jnp.ndarray
    q_plus: jnp.ndarray
    p_plus: jnp.ndarray
    q_prop: jnp.ndarray       # multinomial proposal from the subtree
    log_weight: jnp.ndarray   # logsumexp of -H over subtree leaves
    turning: jnp.ndarray
    diverging: jnp.ndarray
    sum_p: jnp.ndarray        # sum of momenta over the subtree
    sum_alpha: jnp.ndarray    # sum of accept probs (for adaptation)
    n_leaves: jnp.ndarray


def _is_turning(q_minus, p_minus, q_plus, p_plus):
    dq = q_plus - q_minus
    return jnp.logical_or(
        jnp.dot(dq, p_minus) < 0, jnp.dot(dq, p_plus) < 0
    )


def _ckpt_idxs(n):
    """Checkpoint slots to compare leaf ``n`` against (inclusive range).

    ``idx_max`` = popcount(n >> 1) is the slot where an even leaf is stored;
    the balanced subtrees closing at an odd leaf ``n`` start at the leaves
    stored in slots ``idx_min..idx_max`` (one per trailing 1-bit of n).
    For even n the range is empty (idx_min > idx_max).
    """
    idx_max = lax.population_count(n >> 1)
    trailing_ones = lax.population_count(
        jnp.bitwise_and(n, jnp.bitwise_not(n + 1))
    )
    return idx_max - trailing_ones + 1, idx_max


@partial(
    jax.jit,
    static_argnames=(
        "log_density", "num_samples", "num_warmup", "max_depth",
        "tree_method",
    ),
)
def nuts(
    log_density: Callable[[jnp.ndarray], jnp.ndarray],
    init_position: jnp.ndarray,
    key: jnp.ndarray,
    num_samples: int = 1000,
    num_warmup: int = 500,
    max_depth: int = 6,
    init_step_size: float = 0.1,
    target_accept: float = 0.8,
    tree_method: str = "iterative",
) -> NUTSResult:
    if tree_method not in ("iterative", "unrolled"):
        raise ValueError(f"unknown tree_method {tree_method!r}")
    grad_fn = jax.grad(log_density)
    dim = init_position.shape[-1]
    dtype = init_position.dtype
    max_delta = 1000.0

    def leapfrog(q, p, eps):
        p = p + 0.5 * eps * grad_fn(q)
        q = q + eps * p
        p = p + 0.5 * eps * grad_fn(q)
        return q, p

    def leaf(q, p, eps, direction, h0, key_leaf):
        del key_leaf
        q1, p1 = leapfrog(q, p, direction * eps)
        h1 = -log_density(q1) + 0.5 * jnp.sum(p1**2)
        h1 = jnp.where(jnp.isfinite(h1), h1, jnp.inf)
        log_w = h0 - h1
        diverging = (h1 - h0) > max_delta
        alpha = jnp.minimum(1.0, jnp.exp(jnp.minimum(log_w, 0.0)))
        return _Tree(
            q1, p1, q1, p1, q1, log_w,
            jnp.zeros((), bool), diverging, p1, alpha,
            jnp.ones((), dtype),
        )

    # ---------------- iterative subtree (while_loop + checkpoints) --------

    def build_subtree_iter(depth, q_edge, p_edge, eps, direction, h0, key_t):
        """Subtree with 2^depth leaves grown leaf-by-leaf from (q, p) in
        ``direction``; compiled size independent of depth."""
        n_max = jnp.left_shift(jnp.int32(1), depth)
        neg_inf = jnp.asarray(-jnp.inf, dtype)
        empty = _Tree(
            q_edge, p_edge, q_edge, p_edge, q_edge, neg_inf,
            jnp.zeros((), bool), jnp.zeros((), bool),
            jnp.zeros_like(p_edge), jnp.zeros((), dtype),
            jnp.zeros((), dtype),
        )
        q_ck = jnp.zeros((max_depth, dim), dtype)
        p_ck = jnp.zeros((max_depth, dim), dtype)

        def cond(carry):
            n, q, p, sub, q_ck, p_ck = carry
            alive = jnp.logical_not(
                jnp.logical_or(sub.turning, sub.diverging)
            )
            return jnp.logical_and(n < n_max, alive)

        def body(carry):
            n, q, p, sub, q_ck, p_ck = carry
            new = leaf(q, p, eps, direction, h0, None)
            q1, p1 = new.q_plus, new.p_plus
            log_w = jnp.logaddexp(sub.log_weight, new.log_weight)
            k_n = jax.random.fold_in(key_t, n)
            take = (
                jnp.log(jax.random.uniform(k_n, (), dtype))
                < new.log_weight - log_w
            )
            # generation-order endpoints: first leaf is the inner end
            is_first = n == 0
            q_first = jnp.where(is_first, q1, sub.q_minus)
            p_first = jnp.where(is_first, p1, sub.p_minus)
            # checkpoint store (even n) / U-turn check (odd n)
            idx_min, idx_max = _ckpt_idxs(n)
            store_at = jnp.where(n % 2 == 0, idx_max, max_depth)  # OOB drops
            q_ck = q_ck.at[store_at].set(q1, mode="drop")
            p_ck = p_ck.at[store_at].set(p1, mode="drop")

            def check(i, turning):
                # time-ordered segment between the leaf stored at slot i and
                # this leaf; for direction=-1 generation order reverses time
                dq = direction * (q1 - q_ck[i])
                return jnp.logical_or(
                    turning,
                    jnp.logical_or(
                        jnp.dot(dq, p_ck[i]) < 0, jnp.dot(dq, p1) < 0
                    ),
                )

            # for even n the range is empty and the loop body never runs
            turning = lax.fori_loop(
                idx_min, idx_max + 1, check, sub.turning
            )
            sub = _Tree(
                q_first, p_first, q1, p1,
                jnp.where(take, q1, sub.q_prop),
                log_w, turning,
                jnp.logical_or(sub.diverging, new.diverging),
                sub.sum_p + p1,
                sub.sum_alpha + new.sum_alpha,
                sub.n_leaves + 1.0,
            )
            return n + 1, q1, p1, sub, q_ck, p_ck

        final = lax.while_loop(
            cond, body, (jnp.int32(0), q_edge, p_edge, empty, q_ck, p_ck)
        )
        sub = final[3]
        # map generation-order endpoints to position order (minus = earlier
        # time), matching the recursive merge (see build_tree below)
        fwd = direction > 0
        return _Tree(
            jnp.where(fwd, sub.q_minus, sub.q_plus),
            jnp.where(fwd, sub.p_minus, sub.p_plus),
            jnp.where(fwd, sub.q_plus, sub.q_minus),
            jnp.where(fwd, sub.p_plus, sub.p_minus),
            *sub[4:],
        )

    # ---------------- recursive (unrolled) subtree -------------------------

    def merge(first: _Tree, second: _Tree, direction, key_merge) -> _Tree:
        """Combine two adjacent subtrees; ``second`` extends in
        ``direction``."""
        q_minus = jnp.where(direction > 0, first.q_minus, second.q_minus)
        p_minus = jnp.where(direction > 0, first.p_minus, second.p_minus)
        q_plus = jnp.where(direction > 0, second.q_plus, first.q_plus)
        p_plus = jnp.where(direction > 0, second.p_plus, first.p_plus)
        log_w = jnp.logaddexp(first.log_weight, second.log_weight)
        take_second = (
            jnp.log(jax.random.uniform(key_merge, (), dtype))
            < second.log_weight - log_w
        )
        q_prop = jnp.where(take_second, second.q_prop, first.q_prop)
        sum_p = first.sum_p + second.sum_p
        turning = jnp.logical_or(
            jnp.logical_or(first.turning, second.turning),
            _is_turning(q_minus, p_minus, q_plus, p_plus),
        )
        return _Tree(
            q_minus, p_minus, q_plus, p_plus, q_prop, log_w,
            turning,
            jnp.logical_or(first.diverging, second.diverging),
            sum_p,
            first.sum_alpha + second.sum_alpha,
            first.n_leaves + second.n_leaves,
        )

    def build_tree(depth, q, p, eps, direction, h0, key_t) -> _Tree:
        """Trace-time recursion: subtree with 2^depth leaves grown from
        (q, p) in ``direction``."""
        if depth == 0:
            return leaf(q, p, eps, direction, h0, key_t)
        k1, k2, k3 = jax.random.split(key_t, 3)
        left = build_tree(depth - 1, q, p, eps, direction, h0, k1)
        q_edge = jnp.where(direction > 0, left.q_plus, left.q_minus)
        p_edge = jnp.where(direction > 0, left.p_plus, left.p_minus)
        right = build_tree(depth - 1, q_edge, p_edge, eps, direction, h0, k2)
        merged = merge(left, right, direction, k3)
        # if left already terminated, the whole subtree is invalid
        stop_early = jnp.logical_or(left.turning, left.diverging)
        return _Tree(
            *(
                jnp.where(stop_early, l, m)
                for l, m in zip(left[:6], merged[:6])
            ),
            jnp.where(stop_early, jnp.ones((), bool), merged.turning),
            jnp.logical_or(left.diverging, merged.diverging),
            jnp.where(stop_early, left.sum_p, merged.sum_p),
            jnp.where(stop_early, left.sum_alpha, merged.sum_alpha),
            jnp.where(stop_early, left.n_leaves, merged.n_leaves),
        )

    # ---------------- doubling loop ----------------------------------------

    def grow_once(state, depth, eps, h0, key_d):
        """One doubling step: build a subtree of 2^depth leaves off the
        current edge and (biased-progressively) absorb it."""
        k_dir, k_sub, k_swap = jax.random.split(key_d, 3)
        direction = jnp.where(
            jax.random.bernoulli(k_dir), 1.0, -1.0
        ).astype(dtype)
        q_edge = jnp.where(direction > 0, state.q_plus, state.q_minus)
        p_edge = jnp.where(direction > 0, state.p_plus, state.p_minus)
        if tree_method == "iterative":
            sub = build_subtree_iter(
                depth, q_edge, p_edge, eps, direction, h0, k_sub
            )
        else:
            sub = build_tree(depth, q_edge, p_edge, eps, direction, h0, k_sub)
        valid = jnp.logical_not(jnp.logical_or(sub.turning, sub.diverging))
        stopped = jnp.logical_or(state.turning, state.diverging)
        # biased progressive sampling (Betancourt): accept the new subtree's
        # proposal with prob min(1, w_new / w_old)
        log_ratio = sub.log_weight - state.log_weight
        take = jnp.logical_and(
            jnp.logical_and(valid, jnp.logical_not(stopped)),
            jnp.log(jax.random.uniform(k_swap, (), dtype))
            < jnp.minimum(log_ratio, 0.0),
        )
        grow = jnp.logical_and(jnp.logical_not(stopped), valid)
        q_minus = jnp.where(
            jnp.logical_and(grow, direction < 0), sub.q_minus, state.q_minus
        )
        p_minus = jnp.where(
            jnp.logical_and(grow, direction < 0), sub.p_minus, state.p_minus
        )
        q_plus = jnp.where(
            jnp.logical_and(grow, direction > 0), sub.q_plus, state.q_plus
        )
        p_plus = jnp.where(
            jnp.logical_and(grow, direction > 0), sub.p_plus, state.p_plus
        )
        new_turning = jnp.logical_or(
            jnp.logical_or(state.turning, sub.turning),
            _is_turning(q_minus, p_minus, q_plus, p_plus),
        )
        return _Tree(
            q_minus, p_minus, q_plus, p_plus,
            jnp.where(take, sub.q_prop, state.q_prop),
            jnp.where(
                grow,
                jnp.logaddexp(state.log_weight, sub.log_weight),
                state.log_weight,
            ),
            new_turning,
            jnp.logical_or(state.diverging, sub.diverging),
            jnp.where(grow, state.sum_p + sub.sum_p, state.sum_p),
            state.sum_alpha + jnp.where(grow, sub.sum_alpha, 0.0),
            state.n_leaves + jnp.where(grow, sub.n_leaves, 0.0),
        )

    def draw(q0, eps, key_d):
        k_mom, key_d = jax.random.split(key_d)
        p0 = jax.random.normal(k_mom, (dim,), dtype)
        h0 = -log_density(q0) + 0.5 * jnp.sum(p0**2)
        state = _Tree(
            q0, p0, q0, p0, q0, jnp.zeros((), dtype),
            jnp.zeros((), bool), jnp.zeros((), bool), p0,
            jnp.zeros((), dtype), jnp.ones((), dtype),
        )
        if tree_method == "iterative":
            # early exit once the overall tree turns or diverges — identical
            # result to running the remaining depths with grow=False
            def cond(carry):
                state, depth, _ = carry
                alive = jnp.logical_not(
                    jnp.logical_or(state.turning, state.diverging)
                )
                return jnp.logical_and(depth < max_depth, alive)

            def body(carry):
                state, depth, key_d = carry
                key_d, k = jax.random.split(key_d)
                return grow_once(state, depth, eps, h0, k), depth + 1, key_d

            state, _, _ = lax.while_loop(
                cond, body, (state, jnp.int32(0), key_d)
            )
        else:
            for d in range(max_depth):
                key_d, k = jax.random.split(key_d)
                state = grow_once(state, d, eps, h0, k)
        accept_stat = state.sum_alpha / state.n_leaves
        return state.q_prop, accept_stat

    # dual-averaging adaptation, same schedule as hmc.py
    mu_da = jnp.log(10.0 * init_step_size)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def transition(carry, key_t):
        q, log_eps, h_bar, log_eps_bar, m = carry
        q_new, alpha = draw(q, jnp.exp(log_eps), key_t)
        in_warmup = m < num_warmup
        mm = m + 1
        h_bar_new = (
            (1.0 - 1.0 / (mm + t0)) * h_bar
            + (target_accept - alpha) / (mm + t0)
        )
        log_eps_new = mu_da - jnp.sqrt(mm.astype(dtype)) / gamma * h_bar_new
        eta = mm.astype(dtype) ** (-kappa)
        log_eps_bar_new = eta * log_eps_new + (1.0 - eta) * log_eps_bar
        log_eps = jnp.where(in_warmup, log_eps_new, log_eps_bar)
        h_bar = jnp.where(in_warmup, h_bar_new, h_bar)
        log_eps_bar = jnp.where(in_warmup, log_eps_bar_new, log_eps_bar)
        return (q_new, log_eps, h_bar, log_eps_bar, mm), (q_new, alpha)

    keys = jax.random.split(key, num_warmup + num_samples)
    init = (
        init_position,
        jnp.log(jnp.asarray(init_step_size, dtype)),
        jnp.zeros((), dtype),
        jnp.log(jnp.asarray(init_step_size, dtype)),
        jnp.zeros((), jnp.int32),
    )
    (q_f, log_eps_f, _, log_eps_bar, _), (qs, alphas) = lax.scan(
        transition, init, keys
    )
    return NUTSResult(
        samples=qs[num_warmup:],
        step_size=jnp.exp(log_eps_bar),
        mean_accept=jnp.mean(alphas[num_warmup:]),
    )


def nuts_chains(
    log_density, init_positions, key, **kwargs
) -> NUTSResult:
    """vmapped multi-chain NUTS: init_positions [C, D] -> samples [C, T, D].

    Feed ``result.samples`` straight into the [C, T, D] diagnostics
    (:func:`gaussianvi_tpu.samplers.diagnostics.split_rhat` etc.).
    """
    n_chains = init_positions.shape[0]
    keys = jax.random.split(key, n_chains)
    return jax.vmap(
        lambda q0, k: nuts(log_density, q0, k, **kwargs)
    )(init_positions, keys)
