"""Benchmark: NGD iterations/sec on the batch state-estimation flagship.

The north-star metric (BASELINE.json): NGD iterations/sec on batch
state-estimation graphs.  The reference publishes no numbers (BASELINE.md),
so ``vs_baseline`` reports the TPU rate against the same JAX engine executed
on the host CPU backend — a stand-in for the reference's OpenMP/Eigen CPU
path (which the vectorized CPU-JAX run already upper-bounds).

Workload: B independent trajectory-estimation problems, each N states of
dim 4 ([pos2; vel2]), minimum-acc GP priors + anchor + nonlinear range
measurements, full NGD iterations including the backtracking line search.
One JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import time

import jax

# persistent compile cache: the big jitted programs dominate cold-start
# wall time (the remote TPU compile helper can take minutes on first use)
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def build_batch(num_problems, num_states, dim_x, gh_degree):
    from gaussianvi_tpu.examples.chain_estimation import build_chain_estimation
    from gaussianvi_tpu.parallel.sharding import stack_problems

    graphs, states = [], []
    for seed in range(num_problems):
        graph, init, _ = build_chain_estimation(
            num_states=num_states, dim_x=dim_x, gh_degree=gh_degree, seed=seed
        )
        graphs.append(graph)
        states.append(init)
    return stack_problems(graphs, states)


def bench_device(device, num_problems=64, num_states=32, dim_x=2,
                 gh_degree=4, niters=10, repeats=2, chain_impl="auto"):
    from gaussianvi_tpu.inference import GVIConfig
    from gaussianvi_tpu.inference.optimize import optimize

    config = GVIConfig(
        niters=niters, niters_lowtemp=niters, step_size_base=0.9,
        chain_impl=chain_impl,
    )

    with jax.default_device(device):
        graph_b, state_b = build_batch(
            num_problems, num_states, dim_x, gh_degree
        )
        graph_b = jax.device_put(graph_b, device)
        state_b = jax.device_put(state_b, device)

        run = jax.jit(
            jax.vmap(
                lambda g, s: optimize(g, s, config, method="ngd")[0]
            )
        )

        def sync(result):
            # block_until_ready is unreliable through the async remote-TPU
            # tunnel; a host transfer of a reduced scalar forces completion
            return float(jnp.sum(result.mu))

        sync(run(graph_b, state_b))  # compile + settle

        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = run(graph_b, state_b)
            checksum = sync(out)
            times.append(time.perf_counter() - t0)
        best = min(times)
        assert np.isfinite(checksum)
        return num_problems * niters / best


def main():
    import sys

    tpu_devices = jax.devices()
    t0 = time.perf_counter()
    # the lanes Pallas chain kernel is the TPU-native fast path; the CPU
    # baseline uses the XLA scan path (its best implementation)
    on_tpu = tpu_devices[0].platform != "cpu"
    rate_dev = bench_device(
        tpu_devices[0], chain_impl="lanes" if on_tpu else "auto"
    )
    print(f"[bench] device phase {time.perf_counter() - t0:.0f}s",
          file=sys.stderr)

    try:
        cpu = jax.devices("cpu")[0]
        t0 = time.perf_counter()
        rate_cpu = bench_device(cpu)
        print(f"[bench] cpu phase {time.perf_counter() - t0:.0f}s",
              file=sys.stderr)
    except Exception:
        rate_cpu = float("nan")

    vs = rate_dev / rate_cpu if np.isfinite(rate_cpu) and rate_cpu > 0 else 1.0
    print(json.dumps({
        "metric": "ngd_iters_per_sec_batch64x32states",
        "value": round(rate_dev, 2),
        "unit": "iters/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
