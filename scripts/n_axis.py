"""N-axis scaling of the full NGD optimizer (VERDICT r2 item 5).

Rounds 1/2 could not measure N >= 256 end-to-end and blamed the sandbox
compile helper; capturing the helper's full error traced it to the chain
kernel's scoped-vmem budget instead (fixed in kernels/chain_lanes.py
_row_block — multi-grid configurations double-buffer outputs).  This
script measures each (B, N) point two ways:

* ``full``  — one jitted program for the whole 10-iteration run (the
  production form; bench.py's shape);
* ``split`` — the SAME loop driven from the host with the iteration body
  jitted once (inference/optimize.make_gvi_step / make_gvi_init): the
  compiled program is one iteration instead of ten, an ~order-of-magnitude
  smaller HLO, at the cost of 10 dispatches per run (they pipeline; the
  tunnel's per-call RPC floor amortizes across the pipelined run batch).

Where ``full`` fails in the compile helper, ``split`` supplies the first
committed device numbers beyond N=128.

    python scripts/n_axis.py [--ns 32,128,256,512] [--b 64] [--fused auto]
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def _sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


@partial(jax.jit, static_argnames=("config", "method"))
def _init_b(graph_b, state_b, config, method):
    from gaussianvi_tpu.inference.engine import LocalEngine
    from gaussianvi_tpu.inference.optimize import make_gvi_init

    return jax.vmap(
        lambda g, s: make_gvi_init(LocalEngine(g, config), s, config, method)
    )(graph_b, state_b)


@partial(jax.jit, static_argnames=("config", "method"))
def _step_b(graph_b, carry_b, i, config, method):
    from gaussianvi_tpu.inference.engine import LocalEngine
    from gaussianvi_tpu.inference.optimize import make_gvi_step

    def one(g, c):
        new_c, _rec = make_gvi_step(LocalEngine(g, config), config, method)(
            c, i
        )
        return new_c

    return jax.vmap(one, in_axes=(0, 0))(graph_b, carry_b)


def bench_full(graph_b, state_b, config, pipeline, rounds=3):
    from gaussianvi_tpu.inference.optimize import optimize

    run = jax.jit(jax.vmap(lambda g, s: optimize(g, s, config)[0]))
    t0 = time.perf_counter()
    _sync(run(graph_b, state_b))
    print(f"    full: compile+first {time.perf_counter() - t0:.0f}s",
          flush=True)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [run(graph_b, state_b) for _ in range(pipeline)]
        _sync(outs[-1])
        best = min(best, (time.perf_counter() - t0) / pipeline)
    return best


def bench_split(graph_b, state_b, config, pipeline, rounds=3):
    def run():
        carry = _init_b(graph_b, state_b, config, "ngd")
        for i in range(config.niters):
            carry = _step_b(graph_b, carry, jnp.asarray(i), config, "ngd")
        return carry

    t0 = time.perf_counter()
    _sync(run().state.mu)
    print(f"    split: compile+first {time.perf_counter() - t0:.0f}s",
          flush=True)
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [run() for _ in range(pipeline)]
        _sync(outs[-1].state.mu)
        best = min(best, (time.perf_counter() - t0) / pipeline)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ns", default="32,128,256,512")
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--fused", default="auto")
    ap.add_argument("--linesearch", default="batched")
    ap.add_argument("--modes", default="full,split")
    args = ap.parse_args()

    from bench import build_batch
    from gaussianvi_tpu.inference import GVIConfig

    print("platform:", jax.devices()[0].platform, flush=True)
    t0 = time.perf_counter()
    _sync(jax.jit(lambda x: (x @ x).sum())(jnp.eye(128)))
    print(f"warmup {time.perf_counter() - t0:.0f}s", flush=True)

    b = args.b
    for n in [int(x) for x in args.ns.split(",")]:
        config = GVIConfig(
            niters=10, niters_lowtemp=10, step_size_base=0.9,
            chain_impl="lanes", fused_trials=args.fused,
            linesearch=args.linesearch,
        )
        print(f"N={n} B={b}:", flush=True)
        graph_b, state_b = build_batch(b, n, 2, 4)
        pipeline = max(2, min(24, 2048 // max(1, n * b // 256)))
        for mode, fn in (("full", bench_full), ("split", bench_split)):
            if mode not in args.modes:
                continue
            try:
                dt = fn(graph_b, state_b, config, pipeline)
                rate = b * config.niters / dt
                per_state = dt / (b * config.niters * n) * 1e9
                print(f"    {mode}: {rate:10.1f} prob-iters/s "
                      f"({dt * 1e3:.2f} ms/call, {per_state:.1f} ns per "
                      f"state-iter)", flush=True)
            except Exception as exc:
                print(f"    {mode}: FAILED {type(exc).__name__}: "
                      f"{str(exc)[:300]}", flush=True)


if __name__ == "__main__":
    main()
