"""One-process TPU experiment sweep for the bench operating point.

Compares full-optimizer throughput variants (the per-process remote-compile
warmup is paid once):

  * line search "batched" (all 11 trials, one wide kernel) vs "seq"
    (vmapped while_loop, ~1 trial/iteration at steady state)
  * dispatch pipeline depth (tunnel round-trip amortization)

Run:  JAX_PLATFORMS=tpu python scripts/tpu_experiments.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def _sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def main():
    from bench import bench_device

    device = jax.devices()[0]
    on_tpu = device.platform != "cpu"
    impl = "lanes" if on_tpu else "seq"

    t0 = time.perf_counter()
    _sync(jax.jit(lambda x: (x @ x).sum())(jnp.eye(128)))
    print(f"warmup {time.perf_counter() - t0:.0f}s", flush=True)

    import bench as bench_mod
    from gaussianvi_tpu.inference import GVIConfig

    # patch bench_device's config knobs by calling its internals directly
    from gaussianvi_tpu.inference.optimize import optimize

    graph_b, state_b = bench_mod.build_batch(64, 32, 2, 4)
    graph_b = jax.device_put(graph_b, device)
    state_b = jax.device_put(state_b, device)

    def measure(config, pipeline=8, repeats=3):
        run = jax.jit(
            jax.vmap(lambda g, s: optimize(g, s, config, method="ngd")[0])
        )
        t0 = time.perf_counter()
        _sync(run(graph_b, state_b))
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            outs = [run(graph_b, state_b) for _ in range(pipeline)]
            _sync(outs[-1])
            times.append((time.perf_counter() - t0) / pipeline)
        rate = 64 * 10 / min(times)
        return rate, compile_s

    base = dict(niters=10, niters_lowtemp=10, step_size_base=0.9,
                chain_impl=impl)

    for name, cfg, pipe in [
        ("batched ls, pipe8", GVIConfig(**base), 8),
        ("batched ls, pipe24", GVIConfig(**base), 24),
        ("seq ls, pipe8", GVIConfig(**base, linesearch="seq"), 8),
        ("seq ls, pipe24", GVIConfig(**base, linesearch="seq"), 24),
    ]:
        try:
            rate, comp = measure(cfg, pipeline=pipe)
            print(f"{name:22s} {rate:10.0f} iters/s  (compile {comp:.0f}s)",
                  flush=True)
        except Exception as exc:
            print(f"{name:22s} FAILED: {exc}", flush=True)


if __name__ == "__main__":
    main()
