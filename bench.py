"""Benchmark: NGD iterations/sec on the batch state-estimation flagship.

The north-star metric (BASELINE.json): NGD iterations/sec on batch
state-estimation graphs.  The reference publishes no numbers (BASELINE.md),
so ``vs_baseline`` reports the TPU rate against the same JAX engine executed
on the host CPU backend — a stand-in for the reference's OpenMP/Eigen CPU
path (which the vectorized CPU-JAX run already upper-bounds).

Workload: B independent trajectory-estimation problems, each N states of
dim 4 ([pos2; vel2]), minimum-acc GP priors + anchor + nonlinear range
measurements, full NGD iterations including the backtracking line search.

The TPU phase prefers the lanes Pallas chain kernel (fastest); because the
sandbox's remote TPU compiler has multi-minute latency variance, each phase
runs in a subprocess with a timeout and the scan path is the fallback.
One JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def bench_device_impl(device_kind, num_problems=64, num_states=32, dim_x=2,
                      gh_degree=4, niters=10, repeats=2, chain_impl="auto"):
    """One bench phase; returns problem-iterations/sec."""
    import jax

    cache = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from gaussianvi_tpu.examples.chain_estimation import build_chain_estimation
    from gaussianvi_tpu.inference import GVIConfig
    from gaussianvi_tpu.inference.optimize import optimize
    from gaussianvi_tpu.parallel.sharding import stack_problems

    device = (
        jax.devices()[0] if device_kind == "default"
        else jax.devices("cpu")[0]
    )
    config = GVIConfig(
        niters=niters, niters_lowtemp=niters, step_size_base=0.9,
        chain_impl=chain_impl,
    )

    with jax.default_device(device):
        graphs, states = [], []
        for seed in range(num_problems):
            graph, init, _ = build_chain_estimation(
                num_states=num_states, dim_x=dim_x, gh_degree=gh_degree,
                seed=seed,
            )
            graphs.append(graph)
            states.append(init)
        graph_b, state_b = stack_problems(graphs, states)
        graph_b = jax.device_put(graph_b, device)
        state_b = jax.device_put(state_b, device)

        run = jax.jit(
            jax.vmap(lambda g, s: optimize(g, s, config, method="ngd")[0])
        )

        def sync(result):
            # block_until_ready is unreliable through the async remote-TPU
            # tunnel; a host transfer of a reduced scalar forces completion
            return float(jnp.sum(result.mu))

        sync(run(graph_b, state_b))  # compile + settle
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            checksum = sync(run(graph_b, state_b))
            times.append(time.perf_counter() - t0)
        assert checksum == checksum  # not NaN
        return num_problems * niters / min(times)


def _phase_subprocess(device_kind, chain_impl, timeout_s, extra=()):
    """Run one bench phase in a subprocess (bounds remote-compile stalls)."""
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--phase", device_kind, chain_impl, *map(str, extra)],
            capture_output=True, text=True, timeout=timeout_s,
        )
        for line in out.stdout.splitlines():
            if line.startswith("RATE "):
                return float(line.split()[1])
    except subprocess.TimeoutExpired:
        pass
    return None


def main():
    # TPU phase: try the lanes kernel (fastest; ~4 min compile when the
    # remote compile helper is healthy, but its latency is erratic), then
    # fall back to the reliable scan path
    rate_dev = _phase_subprocess("default", "lanes", 540)
    if rate_dev is None:
        print("[bench] lanes phase timed out; scan fallback", file=sys.stderr)
        rate_dev = _phase_subprocess("default", "auto", 540)
    metric = "ngd_iters_per_sec_batch64x32states"
    if rate_dev is None:
        # last resort on a badly degraded remote compiler: a small program
        # (compiles in seconds) — lower absolute rate, never zero
        print("[bench] scan phase timed out; small fallback", file=sys.stderr)
        rate_dev = _phase_subprocess(
            "default", "auto", 300, extra=(16, 16, 5)
        )
        metric = "ngd_iters_per_sec_batch16x16states"
    if rate_dev is None:
        print(json.dumps({
            "metric": metric, "value": 0.0, "unit": "iters/s",
            "vs_baseline": 0.0,
        }))
        return

    rate_cpu = _phase_subprocess("cpu", "auto", 300)
    vs = rate_dev / rate_cpu if rate_cpu else 1.0
    print(json.dumps({
        "metric": metric,
        "value": round(rate_dev, 2),
        "unit": "iters/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--phase":
        kwargs = dict(chain_impl=sys.argv[3])
        if len(sys.argv) > 4:
            kwargs.update(
                num_problems=int(sys.argv[4]),
                num_states=int(sys.argv[5]),
                niters=int(sys.argv[6]),
            )
        rate = bench_device_impl(sys.argv[2], **kwargs)
        print(f"RATE {rate}")
    else:
        main()
