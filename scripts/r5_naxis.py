"""N-axis re-probe with the marginal rule (round 5).

Round 4's trials-budget probe (PERF section 27) found the SEPARATE path
wins at N=128-class shapes with the 137-node rule.  The marginal rule
(29 nodes at deg 4) shrinks `row_elems_trials` ~4x, so those shapes may
now fit fused layouts with cap >= 2.  Measures full-NGD throughput at
N in {64, 128, 256} x B=256, default config (auto-dispatch), and prints
which path engaged.

    python scripts/r5_naxis.py [--ns 64 128 256] [--b 256]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def _sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", type=int, nargs="*", default=[64, 128, 256])
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--niters", type=int, default=10)
    args = ap.parse_args()

    from bench import build_batch
    from gaussianvi_tpu.inference import GVIConfig
    from gaussianvi_tpu.inference.engine import LocalEngine
    from gaussianvi_tpu.inference.optimize import optimize

    print("platform:", jax.devices()[0].platform, flush=True)
    t0 = time.perf_counter()
    _sync(jax.jit(lambda x: (x @ x).sum())(jnp.eye(128)))
    print(f"warmup {time.perf_counter() - t0:.0f}s", flush=True)

    cfg = GVIConfig(niters=args.niters, niters_lowtemp=args.niters,
                    step_size_base=0.9, chain_impl="lanes")
    for n in args.ns:
        graph_b, state_b = build_batch(args.b, n, 2, 4)
        g1 = jax.tree.map(lambda x: x[0], graph_b)
        eng = LocalEngine(g1, cfg)
        paths = (f"fused_trials={eng.fused_trials_ready} "
                 f"fused_gradient={eng.fused_gradient_ready}")
        run = jax.jit(jax.vmap(
            lambda g, s: optimize(g, s, cfg, method="ngd")[1].cost[-1]
        ))
        t0 = time.perf_counter()
        _sync(run(graph_b, state_b))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            outs = [run(graph_b, state_b) for _ in range(6)]
            _sync(outs[-1])
            best = min(best, (time.perf_counter() - t0) / 6)
        rate = args.b * args.niters / best
        print(f"N={n:4d} B={args.b}: {rate:10.0f} prob-iters/s "
              f"({paths}; compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
