"""Phase timing of one NGD iteration on the bench workload (B=64, N=32).

Times, on the current default device, the three phases of an iteration as
separately jitted programs so we can see where the ~16 ms/iteration goes:

  1. cost eval     — GBP covariance+logdet + factor costs (1 chain op)
  2. gradients     — fused sigma-point moments + joint assembly + solve
  3. line search   — 11 vmapped trial cost evals (11 chain ops + quadrature)

plus the full fused iteration for reference.  Run:
    JAX_PLATFORMS=tpu python scripts/profile_iteration.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from gaussianvi_tpu.inference import GVIConfig
from gaussianvi_tpu.inference.gvi import factor_costs, ngd_gradients
from gaussianvi_tpu.inference.optimize import _chain_ops, optimize
from gaussianvi_tpu.ops.blocktridiag import BlockTridiag


def _sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def timeit(fn, *args, repeats=5):
    _sync(fn(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    from bench import build_batch

    device = jax.devices()[0]
    on_tpu = device.platform != "cpu"
    chain_impl = "lanes" if on_tpu else "seq"
    config = GVIConfig(niters=10, niters_lowtemp=10, step_size_base=0.9,
                       chain_impl=chain_impl)

    t0 = time.perf_counter()
    _sync(jax.jit(lambda x: (x @ x).sum())(jnp.eye(128)))
    print(f"warmup {time.perf_counter() - t0:.0f}s", file=sys.stderr)

    graph_b, state_b = build_batch(64, 32, 2, 4)
    graph_b = jax.device_put(graph_b, device)
    state_b = jax.device_put(state_b, device)
    cov_fn, solve_fn = _chain_ops(config, 32)

    @jax.jit
    def phase_cost(graph, state):
        def one(g, s):
            cov_diag, cov_off, ld = cov_fn(s.precision)
            fc = factor_costs(g, s.mu, cov_diag, cov_off, 1.0, True)
            return jnp.sum(fc) + 0.5 * ld
        return jax.vmap(one)(graph, state)

    @jax.jit
    def phase_grads(graph, state):
        def one(g, s):
            cov_diag, cov_off, _ = cov_fn(s.precision)
            vdmu, vddmu = ngd_gradients(g, s.mu, cov_diag, cov_off, 1.0)
            dmu = solve_fn(vddmu, -vdmu.reshape(-1)).reshape(s.mu.shape)
            return dmu
        return jax.vmap(one)(graph, state)

    @jax.jit
    def phase_linesearch(graph, state):
        def one(g, s):
            trials = 0.9 * (0.75 ** jnp.arange(1, 12, dtype=s.mu.dtype))

            def trial_cost(step):
                new_mu = s.mu + step * 0.01
                new_prec = BlockTridiag(
                    s.precision.diag * (1 + 0.01 * step), s.precision.off
                )
                cov_diag, cov_off, ld = cov_fn(new_prec)
                fc = factor_costs(g, new_mu, cov_diag, cov_off, 1.0, True)
                return jnp.sum(fc) + 0.5 * ld

            return jax.vmap(trial_cost)(trials)
        return jax.vmap(one)(graph, state)

    run = jax.jit(jax.vmap(
        lambda g, s: optimize(g, s, config, method="ngd")[0]
    ))

    for name, fn in [("cost(1x)", phase_cost), ("grads", phase_grads),
                     ("linesearch(11x)", phase_linesearch)]:
        t0 = time.perf_counter()
        dt = timeit(fn, graph_b, state_b)
        print(f"{name:18s} {dt * 1e3:8.2f} ms   "
              f"(compile+run {time.perf_counter() - t0:.0f}s)")

    t0 = time.perf_counter()
    dt = timeit(run, graph_b, state_b, repeats=3)
    print(f"{'full 10 iters':18s} {dt * 1e3:8.2f} ms   "
          f"(compile+run {time.perf_counter() - t0:.0f}s)  "
          f"=> {64 * 10 / dt:.0f} iters/s")


if __name__ == "__main__":
    main()
