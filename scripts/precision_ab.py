"""Controlled same-process A/B: contraction precision vs full-NGD throughput.

The two perf_characterize runs (before/after pinning HIGHEST) differed by
-34% end-to-end, but phases whose code did NOT change also moved 10-21%,
and the isolated moments contractions time identically at every precision
(scripts/moments_formulation_bench.py) — so this measures the full
optimizer under each precision in ONE process, interleaved, to separate
program effect from machine state.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from gaussianvi_tpu.ops.precision import set_contraction_precision


def _sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def main():
    from bench import build_batch
    from gaussianvi_tpu.inference import GVIConfig
    from gaussianvi_tpu.inference.optimize import optimize

    print("platform:", jax.devices()[0].platform, flush=True)
    t0 = time.perf_counter()
    _sync(jax.jit(lambda x: (x @ x).sum())(jnp.eye(128)))
    print(f"warmup {time.perf_counter() - t0:.0f}s", flush=True)

    graph_b, state_b = build_batch(64, 32, 2, 4)
    config = GVIConfig(niters=10, niters_lowtemp=10, step_size_base=0.9,
                       chain_impl="lanes")

    runs = {}
    for prec in ("default", "high", "highest"):
        set_contraction_precision(prec)
        run = jax.jit(jax.vmap(
            lambda g, s: optimize(g, s, config, method="ngd")[0]
        ))
        t0 = time.perf_counter()
        _sync(run(graph_b, state_b))
        print(f"{prec}: compile+first {time.perf_counter() - t0:.0f}s",
              flush=True)
        runs[prec] = run

    # interleaved measurement, 3 rounds
    best = {p: float("inf") for p in runs}
    for _ in range(3):
        for prec, run in runs.items():
            t0 = time.perf_counter()
            outs = [run(graph_b, state_b) for _ in range(24)]
            _sync(outs[-1])
            best[prec] = min(best[prec], (time.perf_counter() - t0) / 24)
    for prec, dt in best.items():
        print(f"{prec:8s} {64 * 10 / dt:10.1f} prob-iters/s "
              f"({dt * 1e3:.2f} ms/call)", flush=True)


if __name__ == "__main__":
    main()
