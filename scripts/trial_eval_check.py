"""Isolate the device-only off-path divergence seen at B=1024.

fused_quality_diag found: at B=1024 the separate-kernel (fused=off) line
search collapses a tail of problems to bogus negative costs ON DEVICE,
while the fused kernel tracks the f64 oracle and CPU-f32 runs of the same
code stay sane.  This script compares the three TRIAL-COST evaluators at
identical iterates, on device, at the true batch shapes:

* sep : chain-lanes + quad-lanes at the [T*B]-wide trial batch (the off
        path's configuration, rb=8 at B=1024)
* fus : the fused trial kernel
* xla : seq-scan chain + fused-XLA quadrature (device reference)

States are advanced k iterations first (with the off path, so any
corrupted iterate the off path steers into is also examined).

    python scripts/trial_eval_check.py [--b 1024] [--iters 0 2 5]
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


def trial_cost_fn(cfg_label):
    """Per-problem [T] trial costs at the current iterate, via the
    evaluator selected by cfg_label."""
    from dataclasses import replace

    from gaussianvi_tpu.inference import GVIConfig
    from gaussianvi_tpu.inference.engine import LocalEngine
    from gaussianvi_tpu.ops.blocktridiag import BlockTridiag

    base = GVIConfig(niters=10, niters_lowtemp=10, step_size_base=0.9)
    cfgs = {
        "sep": replace(base, chain_impl="lanes", fused_trials="off"),
        "fus": replace(base, chain_impl="lanes", fused_trials="on"),
        "xla": replace(base, chain_impl="seq", quad_impl="xla",
                       fused_trials="off"),
    }
    config = cfgs[cfg_label]

    def f(graph, state):
        engine = LocalEngine(graph, config)
        cd, co, ld = engine.cov_logdet(state.precision)
        fc = engine.factor_costs_raw(state.mu, cd, co)
        temperature = jnp.asarray(1.0, state.mu.dtype)
        vdmu, vddmu = engine.ngd_gradients(state.mu, cd, co, temperature)
        dprec = vddmu - state.precision
        dmu, fallback = engine.solve_pair(vddmu, state.precision, -vdmu)
        dmu = jnp.where(engine.all_finite(dmu), dmu, fallback)
        trials = config.step_size_base * (
            config.step_decay
            ** jnp.arange(1, config.niters_backtrack + 2,
                          dtype=state.mu.dtype)
        )
        if cfg_label == "fus":
            lds, fcs = engine.fused_trial_costs(state, dmu, dprec, trials)
            fc_t = jax.tree.map(lambda x: x / temperature, fcs)
            return 0.5 * lds + sum(
                (jnp.sum(x, axis=-1) for x in fc_t), jnp.zeros_like(lds)
            )

        def one(s_t):
            new_mu = state.mu + s_t * dmu
            new_prec = (state.precision + dprec.scale(s_t)).symmetrize()
            t_cd, t_co, t_ld = engine.cov_logdet(new_prec)
            fc_raw = engine.factor_costs_raw(new_mu, t_cd, t_co)
            fc_t = jax.tree.map(lambda x: x / temperature, fc_raw)
            return engine.reduce_fc(fc_t) + 0.5 * t_ld

        return jax.vmap(one)(trials)

    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=1024)
    ap.add_argument("--iters", type=int, nargs="*", default=[0, 2, 5])
    args = ap.parse_args()

    from dataclasses import replace

    from bench import build_batch
    from gaussianvi_tpu.inference import GVIConfig
    from gaussianvi_tpu.inference.optimize import optimize

    print("platform:", jax.devices()[0].platform, flush=True)
    t0 = time.perf_counter()
    _sync(jax.jit(lambda x: (x @ x).sum())(jnp.eye(128)))
    print(f"warmup {time.perf_counter() - t0:.0f}s", flush=True)

    graph_b, state_b = build_batch(args.b, 32, 2, 4)
    off_cfg = GVIConfig(niters=1, niters_lowtemp=10, step_size_base=0.9,
                        chain_impl="lanes", fused_trials="off")

    fns = {lbl: jax.jit(jax.vmap(trial_cost_fn(lbl)))
           for lbl in ("sep", "fus", "xla")}

    state_k = state_b
    done = 0
    for k in sorted(args.iters):
        if k > done:
            adv = jax.jit(jax.vmap(
                lambda g, s, c=replace(off_cfg, niters=k - done):
                    optimize(g, s, c, method="ngd")[0]
            ))
            state_k = adv(graph_b, state_k)
            _sync(state_k.mu)
            done = k
        costs = {}
        for lbl, fn in fns.items():
            c = fn(graph_b, state_k)
            _sync(c)
            costs[lbl] = np.asarray(c)  # [B, T]
        ref = costs["xla"]
        print(f"after {k} off-path iterations:", flush=True)
        for lbl in ("sep", "fus"):
            d = np.abs(costs[lbl] - ref)
            rel = d / np.maximum(np.abs(ref), 1e-6)
            # NaN-aware: count disagreements on entries finite in ref
            fin = np.isfinite(ref)
            nan_mismatch = int(
                np.sum(np.isfinite(costs[lbl][fin]) != np.isfinite(ref[fin]))
            )
            with np.errstate(invalid="ignore"):
                bad = int(np.sum(rel[fin] > 1e-3))
            print(f"  {lbl} vs xla: max rel {np.nanmax(rel[fin]):.2e} "
                  f"median {np.nanmedian(rel[fin]):.2e} "
                  f">1e-3 count {bad}/{fin.sum()} "
                  f"nan-mismatch {nan_mismatch}", flush=True)
            if bad:
                idx = np.unravel_index(
                    np.nanargmax(np.where(fin, rel, 0)), rel.shape
                )
                print(f"    worst at (problem, trial) {idx}: "
                      f"{lbl} {costs[lbl][idx]:.4f} vs xla {ref[idx]:.4f}",
                      flush=True)


if __name__ == "__main__":
    main()
