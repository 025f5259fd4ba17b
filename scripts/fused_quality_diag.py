"""Diagnose the fused-vs-separate final-cost tail divergence at B=1024.

The A/B shows median final-cost agreement ~5e-4 but a tail of problems
ending much worse on one path (accept decisions flip under f32 noise and
a failed search freezes the problem — an absorbing state).  This script
identifies the worst problems on device, then re-runs EACH of them on the
host in f64 (the oracle) to establish which path's trajectory is right.

    python scripts/fused_quality_diag.py [--b 1024] [--worst 6]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=1024)
    ap.add_argument("--worst", type=int, default=6)
    args = ap.parse_args()

    from dataclasses import replace

    from bench import build_batch
    from gaussianvi_tpu.examples.chain_estimation import build_chain_estimation
    from gaussianvi_tpu.inference import GVIConfig
    from gaussianvi_tpu.inference.optimize import optimize

    print("platform:", jax.devices()[0].platform, flush=True)
    t0 = time.perf_counter()
    _sync(jax.jit(lambda x: (x @ x).sum())(jnp.eye(128)))
    print(f"warmup {time.perf_counter() - t0:.0f}s", flush=True)

    base = GVIConfig(niters=10, niters_lowtemp=10, step_size_base=0.9,
                     chain_impl="lanes")
    graph_b, state_b = build_batch(args.b, 32, 2, 4)

    outs = {}
    for mode in ("off", "auto"):
        cfg = replace(base, fused_trials=mode)
        # ONE scalar record per program: richer record selections push the
        # off-path trial-batch chain kernel over the scoped-vmem limit at
        # B=1024 (16.2M > 16M; rb=8 x 11-step grid double-buffers)
        run_c = jax.jit(jax.vmap(
            lambda g, s, c=cfg: optimize(g, s, c, method="ngd")[1].cost[-1]
        ))
        # (any per-iteration record output — even [T] scalars — pushes the
        # off-path program over the scoped-vmem limit; final cost only)
        cost = run_c(graph_b, state_b)
        _sync(cost)
        outs[mode] = (np.asarray(cost), None)
        print(f"  device {mode}: sum final cost "
              f"{outs[mode][0].sum():.1f}", flush=True)

    c_off = outs["off"][0]
    c_f = outs["auto"][0]
    rel = np.abs(c_f - c_off) / np.abs(c_off)
    worst = np.argsort(-rel)[:args.worst]
    print(f"  worst problems by rel final-cost diff: {worst.tolist()}",
          flush=True)

    # f64 host oracle per worst problem (seq chain — the f64 reference path)
    cpu = jax.devices("cpu")[0]
    for i in worst:
        with jax.enable_x64(True), jax.default_device(cpu):
            g64, s64, _ = build_chain_estimation(
                num_states=32, dim_x=2, gh_degree=4, seed=int(i)
            )
            cfg64 = replace(base, chain_impl="seq")
            _, h64 = optimize(g64, s64, cfg64, method="ngd")
            c64 = np.asarray(h64.cost)
            a64 = np.asarray(h64.accepted_step)
        print(f"  problem {i}: final cost f64 {c64[-1]:.4f} | "
              f"off {c_off[i]:.4f} | fused {c_f[i]:.4f}", flush=True)
        print(f"    f64 steps {np.array2string(a64, precision=3)}",
              flush=True)

    # which path tracks the oracle overall? (cheap proxy: count problems
    # where each path's final cost is closer to the other's min)
    better_off = int(np.sum(c_off < c_f - 1e-6 * np.abs(c_off)))
    better_f = int(np.sum(c_f < c_off - 1e-6 * np.abs(c_off)))
    print(f"  problems where off < fused: {better_off}, "
          f"fused < off: {better_f}, ties: "
          f"{args.b - better_off - better_f}", flush=True)


if __name__ == "__main__":
    main()
