"""Round-4 device session: trust-guard quality re-run + N-axis with the
fused gradient kernel + fused-trials budget probe at large N.

VERDICT r3 item 2's bar: the fallback (separate-kernel) path's device-f32
final costs at N=256 and on the planar planner must sit within 1e-2 max
relative of the f64 host oracle (round 3 measured a 3.3 tail at B=1024 on
the separate path).  The pivot-trust guard (chain logdet NaN-poisoning)
shipped this round; this script measures the tail WITH it.

    python scripts/r4_device_session.py [--quick]
"""

from __future__ import annotations

import argparse
import sys
import time
from dataclasses import replace
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def oracle_costs(num_states, seeds, cfg):
    """f64 host final costs (seq chain — the f64 reference path)."""
    from gaussianvi_tpu.examples.chain_estimation import (
        build_chain_estimation,
    )
    from gaussianvi_tpu.inference.optimize import optimize

    cpu = jax.devices("cpu")[0]
    out = []
    with jax.enable_x64(True), jax.default_device(cpu):
        cfg64 = replace(cfg, chain_impl="seq", quad_impl="xla",
                        fused_trials="off", fused_gradient="off")
        for seed in seeds:
            g64, s64, _ = build_chain_estimation(
                num_states=num_states, dim_x=2, gh_degree=4, seed=int(seed)
            )
            _, h64 = optimize(g64, s64, cfg64, method="ngd")
            out.append(float(h64.cost[-1]))
    return np.asarray(out)


def tail_check(tag, num_states, b, cfg, budget=None):
    """Device f32 run (separate kernels) vs f64 oracle: max-rel tail."""
    from bench import build_batch
    from gaussianvi_tpu.inference.optimize import optimize

    graph_b, state_b = build_batch(b, num_states, 2, 4)
    run = jax.jit(jax.vmap(
        lambda g, s: optimize(g, s, cfg, method="ngd")[1].cost[-1]
    ))
    t0 = time.perf_counter()
    c_dev = np.asarray(run(graph_b, state_b))
    _sync(jnp.asarray(c_dev))
    dt = time.perf_counter() - t0
    c_64 = oracle_costs(num_states, range(b), cfg)
    rel = np.abs(c_dev - c_64) / np.maximum(np.abs(c_64), 1e-9)
    print(f"[{tag}] N={num_states} B={b}: device {dt:.0f}s, "
          f"max-rel {rel.max():.3e} median {np.median(rel):.3e} "
          f"(worst problem {int(np.argmax(rel))}: dev {c_dev[rel.argmax()]:.3f}"
          f" vs f64 {c_64[rel.argmax()]:.3f}) "
          f"[{'OK' if rel.max() < 1e-2 else 'TAIL'}]", flush=True)
    return rel


def planner_tail():
    from gaussianvi_tpu.examples.planar_planning import build_planar_planning
    from gaussianvi_tpu.inference.optimize import optimize

    cpu = jax.devices("cpu")[0]
    with jax.enable_x64(True), jax.default_device(cpu):
        g64, i64, cfg_p, _ = build_planar_planning(gh_degree=3)
        _, h64 = optimize(g64, i64, cfg_p, method="ngd")
        c64 = float(h64.cost[-1])
    g32, i32, cfg32, _ = build_planar_planning(gh_degree=3)
    _, h32 = optimize(g32, i32, cfg32, method="ngd")
    c32 = float(h32.cost[-1])
    rel = abs(c32 - c64) / max(abs(c64), 1e-9)
    print(f"[planner] final cost dev {c32:.3f} vs f64 {c64:.3f} "
          f"rel {rel:.3e} [{'OK' if rel < 1e-2 else 'TAIL'}]", flush=True)


def n_axis_fused_grad(sizes=(64, 128, 256)):
    """Fused gradient on/off across N at B=64 (the 90k budget now engages
    it up to N=256; check it actually wins there)."""
    from bench import build_batch
    from gaussianvi_tpu.inference import GVIConfig
    from gaussianvi_tpu.inference.optimize import optimize

    base = GVIConfig(niters=10, niters_lowtemp=10, step_size_base=0.9,
                     chain_impl="lanes")
    for n in sizes:
        graph_b, state_b = build_batch(64, n, 2, 4)
        for mode in ("off", "auto"):
            cfg = replace(base, fused_gradient=mode)
            run = jax.jit(jax.vmap(
                lambda g, s, c=cfg: optimize(g, s, c, method="ngd")[0]
            ))
            try:
                t0 = time.perf_counter()
                _sync(run(graph_b, state_b))
                dt0 = time.perf_counter() - t0
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    outs = [run(graph_b, state_b) for _ in range(8)]
                    _sync(outs[-1])
                    best = min(best, (time.perf_counter() - t0) / 8)
                print(f"[n-axis] N={n} fused_grad={mode}: "
                      f"{64 * 10 / best:.0f} prob-iters/s "
                      f"(compile {dt0:.0f}s)", flush=True)
            except Exception as exc:
                print(f"[n-axis] N={n} fused_grad={mode}: FAILED "
                      f"{type(exc).__name__}: {str(exc)[:160]}", flush=True)


def trials_budget_probe(sizes=(128, 256)):
    """Can the fused TRIAL kernel cover N>=128 under a raised budget?
    Forces ft._MAX_ROW_ELEMS_TRIALS = per_row * cap and times vs off."""
    from bench import build_batch
    from gaussianvi_tpu.inference import GVIConfig
    from gaussianvi_tpu.inference.engine import LocalEngine
    from gaussianvi_tpu.inference.optimize import optimize
    from gaussianvi_tpu.kernels import fused_trials as ft

    base = GVIConfig(niters=10, niters_lowtemp=10, step_size_base=0.9,
                     chain_impl="lanes", fused_gradient="off")
    orig = ft._MAX_ROW_ELEMS_TRIALS
    for n in sizes:
        graph_b, state_b = build_batch(64, n, 2, 4)
        g0 = jax.tree.map(lambda x: x[0], graph_b)
        # fused_trials="auto" so the engine builds the spec cache (it is
        # skipped entirely when both fused modes are "off")
        eng = LocalEngine(g0, replace(base, fused_trials="auto"))
        sp = eng._fused_spec_cache
        if sp is None:
            print(f"[trials-probe] N={n}: ineligible specs", flush=True)
            continue
        nl_specs, lin_specs, _, _ = sp
        per_row = ft.row_elems_trials(n, 4, 11, nl_specs, lin_specs)
        print(f"[trials-probe] N={n}: per_row={per_row}", flush=True)
        for cap in (0, 2, 3):
            try:
                ft._MAX_ROW_ELEMS_TRIALS = (
                    orig if cap == 0 else per_row * cap
                )
                mode = "off" if cap == 0 else "auto"
                cfg = replace(base, fused_trials=mode)
                optimize.clear_cache()
                run = jax.jit(jax.vmap(
                    lambda g, s, c=cfg: optimize(g, s, c, method="ngd")[0]
                ))
                t0 = time.perf_counter()
                _sync(run(graph_b, state_b))
                dt0 = time.perf_counter() - t0
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    outs = [run(graph_b, state_b) for _ in range(8)]
                    _sync(outs[-1])
                    best = min(best, (time.perf_counter() - t0) / 8)
                print(f"[trials-probe] N={n} "
                      f"{'separate' if cap == 0 else f'fused cap={cap}'}: "
                      f"{64 * 10 / best:.0f} prob-iters/s "
                      f"(compile {dt0:.0f}s)", flush=True)
            except Exception as exc:
                print(f"[trials-probe] N={n} cap={cap}: FAILED "
                      f"{type(exc).__name__}: {str(exc)[:160]}", flush=True)
            finally:
                ft._MAX_ROW_ELEMS_TRIALS = orig
                optimize.clear_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    from gaussianvi_tpu.inference import GVIConfig

    print("platform:", jax.devices()[0].platform, flush=True)
    t0 = time.perf_counter()
    _sync(jax.jit(lambda x: (x @ x).sum())(jnp.eye(128)))
    print(f"warmup {time.perf_counter() - t0:.0f}s", flush=True)

    base = GVIConfig(niters=10, niters_lowtemp=10, step_size_base=0.9,
                     chain_impl="lanes", fused_trials="off",
                     fused_gradient="off")
    # the section-14 scenario: SEPARATE path with the trust guard
    tail_check("sep+guard", 32, 16 if args.quick else 128, base)
    # fallback-only shape (fused ineligible at current budgets)
    tail_check("sep+guard", 256, 8 if args.quick else 32, base)
    planner_tail()
    if not args.quick:
        n_axis_fused_grad()
        trials_budget_probe()


if __name__ == "__main__":
    main()
