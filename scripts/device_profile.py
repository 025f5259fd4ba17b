"""Device-side phase timing at the bench operating point (B=64, N=32, s=4).

Single per-call timings through the sandbox tunnel are swamped by the fixed
~24 ms RPC round-trip; here each phase is wrapped in a ``lax.scan`` over R
repetitions INSIDE one jitted program, so the measured per-rep time is the
true device cost.  A data dependence is threaded through the carry so XLA
cannot hoist the loop-invariant body.

Run:  JAX_PLATFORMS=tpu python scripts/device_profile.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

REPS = 100


def _sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def scan_time(fn, *args, reps=REPS, label=""):
    """fn(eps, *args) -> scalar-reducible pytree; eps breaks hoisting."""

    @jax.jit
    def run(args):
        def body(eps, _):
            out = fn(eps, *args)
            leaf = jax.tree.leaves(out)[0]
            return 1e-30 * jnp.sum(leaf).astype(eps.dtype), None

        eps, _ = lax.scan(body, jnp.zeros((), jnp.float32), None, length=reps)
        return eps

    t0 = time.perf_counter()
    _sync(run(args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(run(args))
        times.append(time.perf_counter() - t0)
    # subtract one RPC floor estimate? no — report raw/rep; floor/REPS ~ 0.24ms
    dt = min(times) / reps
    print(f"{label:26s} {dt * 1e3:8.3f} ms/rep   (compile {compile_s:.0f}s)",
          flush=True)
    return dt


def main():
    from bench import build_batch
    from gaussianvi_tpu.inference import GVIConfig
    from gaussianvi_tpu.inference.gvi import factor_costs, ngd_gradients
    from gaussianvi_tpu.inference.optimize import optimize
    from gaussianvi_tpu.kernels.chain_lanes import (
        gbp_covariance_logdet_lanes,
        solve_lanes,
    )

    device = jax.devices()[0]
    t0 = time.perf_counter()
    _sync(jax.jit(lambda x: (x @ x).sum())(jnp.eye(128)))
    print(f"warmup {time.perf_counter() - t0:.0f}s", flush=True)

    graph_b, state_b = build_batch(64, 32, 2, 4)
    graph_b = jax.device_put(graph_b, device)
    state_b = jax.device_put(state_b, device)
    diag, off = state_b.precision.diag, state_b.precision.off
    b, n, s, _ = diag.shape

    # chain cov at line-search batch (64 problems x 11 trials = 704)
    diag11 = jnp.tile(diag, (11, 1, 1, 1))
    off11 = jnp.tile(off, (11, 1, 1, 1))

    def cov704(eps, d, o):
        return gbp_covariance_logdet_lanes(d + eps, o)[2]

    def cov64(eps, d, o):
        return gbp_covariance_logdet_lanes(d + eps, o)[2]

    rhs = jnp.ones((2 * b, n, s), diag.dtype)
    diag2 = jnp.tile(diag, (2, 1, 1, 1))
    off2 = jnp.tile(off, (2, 1, 1, 1))

    def solve128(eps, d, o, r):
        return solve_lanes(d + eps, o, r)

    # quadrature cost pass (B=64), using a fixed covariance
    cd, co, _ = gbp_covariance_logdet_lanes(diag, off)

    def fc(eps, mu, cd, co):
        f = jax.vmap(
            lambda g, m, d, o: factor_costs(g, m + eps, d, o, 1.0, True)
        )
        return f(graph_b, mu, cd, co)

    def fc11(eps, mu, cd, co):
        f = jax.vmap(jax.vmap(
            lambda m, d, o, g: factor_costs(g, m + eps, d, o, 1.0, True),
            in_axes=(0, 0, 0, None),
        ), in_axes=(0, 0, 0, 0))
        mu11 = jnp.broadcast_to(mu[:, None], (b, 11) + mu.shape[1:])
        cd11 = jnp.broadcast_to(cd[:, None], (b, 11) + cd.shape[1:])
        co11 = jnp.broadcast_to(co[:, None], (b, 11) + co.shape[1:])
        return f(mu11, cd11, co11, graph_b)

    def grads(eps, mu, cd, co):
        f = jax.vmap(
            lambda g, m, d, o: ngd_gradients(g, m + eps, d, o, 1.0)[0]
        )
        return f(graph_b, mu, cd, co)

    config = GVIConfig(niters=10, niters_lowtemp=10, step_size_base=0.9,
                       chain_impl="lanes")

    def full10(eps, mu):
        from gaussianvi_tpu.inference.graph import GaussianState

        st = GaussianState(state_b.mu + eps, state_b.precision)
        out = jax.vmap(
            lambda g, s_: optimize(g, s_, config, method="ngd")[0]
        )(graph_b, st)
        return out.mu

    scan_time(cov704, diag11, off11, label="chain cov+logdet B=704")
    scan_time(cov64, diag, off, label="chain cov+logdet B=64")
    scan_time(solve128, diag2, off2, rhs, label="chain solve B=128")
    scan_time(fc, state_b.mu, cd, co, label="factor_costs B=64")
    scan_time(fc11, state_b.mu, cd, co, label="factor_costs B=704 (11x)")
    scan_time(grads, state_b.mu, cd, co, label="ngd_gradients B=64")
    dt = scan_time(full10, state_b.mu, reps=10, label="full 10-iter optimize")
    print(f"=> device-side {64 * 10 / dt:.0f} iters/s", flush=True)


if __name__ == "__main__":
    main()
