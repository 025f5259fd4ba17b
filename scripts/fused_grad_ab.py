"""Same-process A/B: fused NGD gradient kernel (kernels/fused_gradient.py)
vs the separate quad-moments + assembly + solve + accepted-chain path, plus
a VMEM row-block probe.

Round-3 traces (PERF.md section 18) left B=1024 spending 16% of the
iteration in width-B pack/unpack copies around the gradient phases; the
fused kernel runs covariance + moments + NGD assembly + both Thomas solves
in one program and deletes the fused-trials path's separate accepted-chain
call.  This script measures the end-to-end effect interleaved in one
process (the sandbox device is bimodal, PERF.md section 5) and probes the
kernel's VMEM budget by forcing row-block sizes.

    python scripts/fused_grad_ab.py [--probe] [B ...]
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


def bench_pair(graph_b, state_b, n_problems, pipeline=24, rounds=3):
    from dataclasses import replace

    from gaussianvi_tpu.inference import GVIConfig
    from gaussianvi_tpu.inference.optimize import optimize

    base = GVIConfig(niters=10, niters_lowtemp=10, step_size_base=0.9,
                     chain_impl="lanes")
    runs = {}
    for mode in ("off", "auto"):
        config = replace(base, fused_gradient=mode)
        run = jax.jit(jax.vmap(
            lambda g, s, c=config: optimize(g, s, c, method="ngd")[0]
        ))
        t0 = time.perf_counter()
        checksum = _sync(run(graph_b, state_b))
        print(f"  fused_grad={mode}: compile+first "
              f"{time.perf_counter() - t0:.0f}s checksum {checksum:.6f}",
              flush=True)
        runs[mode] = run

    mu_o = runs["off"](graph_b, state_b).mu
    mu_f = runs["auto"](graph_b, state_b).mu
    print(f"  final-mu max |off - fused| = "
          f"{float(jnp.max(jnp.abs(mu_o - mu_f))):.3e}", flush=True)
    cost_runs = {}
    for mode in ("off", "auto"):
        config = replace(base, fused_gradient=mode)
        cost_runs[mode] = jax.jit(jax.vmap(
            lambda g, s, c=config: optimize(g, s, c, method="ngd")[1].cost[-1]
        ))(graph_b, state_b)
    c_o, c_f = cost_runs["off"], cost_runs["auto"]
    rel = jnp.abs(c_f - c_o) / jnp.abs(c_o)
    print(f"  final-cost rel diff: median {float(jnp.median(rel)):.2e} "
          f"max {float(jnp.max(rel)):.2e}; "
          f"sum off {float(jnp.sum(c_o)):.4f} fused {float(jnp.sum(c_f)):.4f}",
          flush=True)

    best = {m: float("inf") for m in runs}
    for _ in range(rounds):
        for mode, run in runs.items():
            t0 = time.perf_counter()
            outs = [run(graph_b, state_b) for _ in range(pipeline)]
            _sync(outs[-1])
            best[mode] = min(best[mode], (time.perf_counter() - t0) / pipeline)
    for mode, dt in best.items():
        print(f"  fused_grad={mode:4s} {n_problems * 10 / dt:10.1f} "
              f"prob-iters/s ({dt * 1e3:.2f} ms/call)", flush=True)
    return best


def probe_row_blocks(graph_b, state_b, n_problems):
    """Force the gradient kernel's row block via its VMEM-budget knob and
    time each configuration that compiles — calibrates
    _MAX_ROW_ELEMS_GRAD.  A fresh trace per setting (the budget is read at
    trace time)."""
    from gaussianvi_tpu.inference import GVIConfig
    from gaussianvi_tpu.inference.engine import LocalEngine
    from gaussianvi_tpu.inference.optimize import optimize
    from gaussianvi_tpu.kernels import fused_gradient as fg

    base = GVIConfig(niters=10, niters_lowtemp=10, step_size_base=0.9,
                     chain_impl="lanes")
    g0 = jax.tree.map(lambda x: x[0], graph_b)
    engine = LocalEngine(g0, base)
    if not engine.fused_gradient_ready:
        print("  probe: fused gradient ineligible, skipping", flush=True)
        return
    nl_specs, lin_specs = engine._fused_specs
    n, s = g0.num_states, g0.state_dim
    per_row = fg.row_elems_grad(n, s, nl_specs, lin_specs)
    print(f"  probe: per_row={per_row} elems "
          f"(default budget {fg._MAX_ROW_ELEMS_GRAD} -> rb="
          f"{min(8, fg._MAX_ROW_ELEMS_GRAD // per_row)})", flush=True)
    orig = fg._MAX_ROW_ELEMS_GRAD
    try:
        for rb in (1, 2, 4, 8):
            fg._MAX_ROW_ELEMS_GRAD = per_row * rb
            optimize.clear_cache()
            run = jax.jit(jax.vmap(
                lambda g, s_: optimize(g, s_, base, method="ngd")[0]
            ))
            try:
                t0 = time.perf_counter()
                _sync(run(graph_b, state_b))
                dt0 = time.perf_counter() - t0
                t0 = time.perf_counter()
                outs = [run(graph_b, state_b) for _ in range(12)]
                _sync(outs[-1])
                dt = (time.perf_counter() - t0) / 12
                print(f"  rb<={rb}: compile+first {dt0:.0f}s, "
                      f"{n_problems * 10 / dt:.1f} prob-iters/s", flush=True)
            except Exception as exc:
                print(f"  rb<={rb}: FAILED {type(exc).__name__}: "
                      f"{str(exc)[:200]}", flush=True)
    finally:
        fg._MAX_ROW_ELEMS_GRAD = orig
        optimize.clear_cache()


def main():
    from bench import build_batch

    args = sys.argv[1:]
    do_probe = "--probe" in args
    sizes = [int(a) for a in args if not a.startswith("-")] or [64, 1024]
    print("platform:", jax.devices()[0].platform, flush=True)
    t0 = time.perf_counter()
    _sync(jax.jit(lambda x: (x @ x).sum())(jnp.eye(128)))
    print(f"warmup {time.perf_counter() - t0:.0f}s", flush=True)

    for b in sizes:
        print(f"B={b}:", flush=True)
        graph_b, state_b = build_batch(b, 32, 2, 4)
        if do_probe:
            probe_row_blocks(graph_b, state_b, b)
        bench_pair(graph_b, state_b, b, pipeline=24 if b <= 256 else 6)


if __name__ == "__main__":
    main()
