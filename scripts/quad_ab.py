"""Same-process A/B: XLA vs batch-on-lanes quadrature (kernels/quad_lanes.py)
in the full 10-iteration NGD optimizer at the bench operating point.

The line-search cost phase was measured at ~45-60% of the iteration
(PERF.md section 2); the lanes quadrature kernel keeps the whole
sigma-point evaluation in VMEM instead of materializing ~50 MB of [B*K, M,
d] intermediates per trial batch in HBM.  Interleaved in one process so the
sandbox's bimodal device state (PERF.md section 5) cannot masquerade as a
program effect.
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
    from dataclasses import replace

    from bench import build_batch
    from gaussianvi_tpu.inference import GVIConfig
    from gaussianvi_tpu.inference.optimize import optimize

    print("platform:", jax.devices()[0].platform, flush=True)
    t0 = time.perf_counter()
    _sync(jax.jit(lambda x: (x @ x).sum())(jnp.eye(128)))
    print(f"warmup {time.perf_counter() - t0:.0f}s", flush=True)

    graph_b, state_b = build_batch(64, 32, 2, 4)
    base = GVIConfig(niters=10, niters_lowtemp=10, step_size_base=0.9,
                     chain_impl="lanes")

    runs = {}
    for quad in ("xla", "lanes"):
        config = replace(base, quad_impl=quad)
        run = jax.jit(jax.vmap(
            lambda g, s, c=config: optimize(g, s, c, method="ngd")[0]
        ))
        t0 = time.perf_counter()
        out = run(graph_b, state_b)
        checksum = _sync(out)
        print(f"{quad}: compile+first {time.perf_counter() - t0:.0f}s "
              f"checksum {checksum:.6f}", flush=True)
        runs[quad] = run

    # cross-check: identical final iterates (f32 reassociation tolerance)
    mu_x = runs["xla"](graph_b, state_b).mu
    mu_l = runs["lanes"](graph_b, state_b).mu
    err = float(jnp.max(jnp.abs(mu_x - mu_l)))
    print(f"final-mu max |xla - lanes| = {err:.3e}", flush=True)

    best = {q: float("inf") for q in runs}
    for _ in range(3):
        for quad, run in runs.items():
            t0 = time.perf_counter()
            outs = [run(graph_b, state_b) for _ in range(24)]
            _sync(outs[-1])
            best[quad] = min(best[quad], (time.perf_counter() - t0) / 24)
    for quad, dt in best.items():
        print(f"{quad:6s} {64 * 10 / dt:10.1f} prob-iters/s "
              f"({dt * 1e3:.2f} ms/call)", flush=True)


if __name__ == "__main__":
    main()
