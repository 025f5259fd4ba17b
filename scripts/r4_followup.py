"""Round-4 follow-up device session:

1. Adjudicate the N=32 tail problem from r4_device_session (device final
   cost BELOW the f64 oracle's): evaluate the device's final ITERATE in
   f64 on the host.  If the f64 re-evaluation reproduces the low cost,
   the device landed in a genuinely better basin (an accept-decision
   flip, not a numerics failure); if not, the device underestimated.
2. Fused-trials VMEM budget probe at N=128/256 (the r3 exclusion was the
   24576 budget; the fused-gradient probe showed the real ceiling is far
   higher).

    python scripts/r4_followup.py
"""

from __future__ import annotations

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


def adjudicate(seeds=(19,), num_states=32, b=128):
    from bench import build_batch
    from gaussianvi_tpu.examples.chain_estimation import (
        build_chain_estimation,
    )
    from gaussianvi_tpu.inference import GVIConfig
    from gaussianvi_tpu.inference.engine import LocalEngine
    from gaussianvi_tpu.inference.gvi import joint_cost
    from gaussianvi_tpu.inference.optimize import optimize

    cfg = GVIConfig(niters=10, niters_lowtemp=10, step_size_base=0.9,
                    chain_impl="lanes", fused_trials="off",
                    fused_gradient="off")
    graph_b, state_b = build_batch(b, num_states, 2, 4)
    run = jax.jit(jax.vmap(
        lambda g, s: optimize(g, s, cfg, method="ngd")
    ))
    st, hist = run(graph_b, state_b)
    _sync(st.mu)
    cpu = jax.devices("cpu")[0]
    for seed in seeds:
        mu_dev = np.asarray(st.mu[seed], np.float64)
        pd_dev = np.asarray(st.precision.diag[seed], np.float64)
        po_dev = np.asarray(st.precision.off[seed], np.float64)
        c_dev = float(hist.cost[seed, -1])
        with jax.enable_x64(True), jax.default_device(cpu):
            from gaussianvi_tpu.inference.graph import GaussianState
            from gaussianvi_tpu.ops.blocktridiag import BlockTridiag

            g64, s64, _ = build_chain_estimation(
                num_states=num_states, dim_x=2, gh_degree=4, seed=int(seed)
            )
            # f64 re-evaluation of the DEVICE's final iterate
            c_reval = float(joint_cost(
                g64, jnp.asarray(mu_dev),
                BlockTridiag(jnp.asarray(pd_dev), jnp.asarray(po_dev)),
                1.0,
            ))
            # f64 trajectory for comparison
            cfg64 = replace(cfg, chain_impl="seq", quad_impl="xla")
            _, h64 = optimize(g64, s64, cfg64, method="ngd")
            c_oracle = float(h64.cost[-1])
        verdict = (
            "GENUINE better basin (accept flip)"
            if abs(c_reval - c_dev) / abs(c_dev) < 1e-2
            else "DEVICE UNDERESTIMATE (numerics)"
        )
        print(f"[adjudicate] seed {seed}: device reports {c_dev:.3f}, "
              f"f64 re-eval of device iterate {c_reval:.3f}, "
              f"f64 own trajectory {c_oracle:.3f} -> {verdict}", flush=True)


def trials_budget_probe(sizes=(128, 256)):
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
        eng = LocalEngine(g0, replace(base, fused_trials="auto"))
        sp = eng._fused_spec_cache
        if sp is None:
            print(f"[trials-probe] N={n}: no spec cache", flush=True)
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
    print("platform:", jax.devices()[0].platform, flush=True)
    t0 = time.perf_counter()
    _sync(jax.jit(lambda x: (x @ x).sum())(jnp.eye(128)))
    print(f"warmup {time.perf_counter() - t0:.0f}s", flush=True)
    adjudicate()
    trials_budget_probe()


if __name__ == "__main__":
    main()
