"""Round-4 second budget-probe session: the remaining conservative VMEM
budgets (chain 8192, quad 12288) on the workloads that still ride the
SEPARATE kernels (planning; prox moments), plus a B sweep of the new
fused layouts.

The fused-kernel probes (PERF sections 20/27) showed the original
budgets were calibrated against the 16M default scoped-vmem cap, not the
v5e's 128MB physical VMEM — full 8-row blocks were worth 2.3x at the
bench shape.  This session asks the same question for the chain/quad
kernels on the planning configurations.

    python scripts/r4_budget_probe2.py
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


def _time_run(run, args, pipeline=12, rounds=2):
    t0 = time.perf_counter()
    _sync(run(*args))
    dt0 = time.perf_counter() - t0
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        outs = [run(*args) for _ in range(pipeline)]
        _sync(outs[-1])
        best = min(best, (time.perf_counter() - t0) / pipeline)
    return dt0, best


def probe_planning(case="planar", restarts=64, niters=10):
    from gaussianvi_tpu.examples.planar_planning import build_planar_planning
    from gaussianvi_tpu.examples.point3d_planning import (
        build_point3d_planning,
    )
    from gaussianvi_tpu.inference.optimize import optimize
    from gaussianvi_tpu.kernels import chain_lanes as cl
    from gaussianvi_tpu.kernels import quad_lanes as ql
    from gaussianvi_tpu.parallel.restarts import perturb_inits

    build = (
        build_planar_planning if case == "planar" else build_point3d_planning
    )
    kw = {} if case == "planar" else {"patch_size": 8}
    graph, init, config, _ = build(gh_degree=3, **kw)
    config = replace(
        config, niters=niters, niters_lowtemp=niters, chain_impl="lanes",
        quad_impl="xla" if case == "planar" else "lanes",
    )
    init_b = perturb_inits(init, jax.random.key(0), restarts, mean_scale=0.3)
    orig_c, orig_q = cl._MAX_ROW_ELEMS, ql._MAX_ROW_ELEMS_QUAD
    for c_budget, q_budget in (
        (orig_c, orig_q),
        (orig_c * 4, orig_q),
        (orig_c * 4, orig_q * 4),
        (orig_c * 8, orig_q * 8),
    ):
        cl._MAX_ROW_ELEMS, ql._MAX_ROW_ELEMS_QUAD = c_budget, q_budget
        optimize.clear_cache()
        run = jax.jit(jax.vmap(
            lambda s0: optimize(graph, s0, config, method="ngd")[1].cost[-1]
        ))
        try:
            dt0, best = _time_run(run, (init_b,))
            med = float(jnp.median(run(init_b)))
            print(f"[{case}] chain={c_budget} quad={q_budget}: "
                  f"{restarts * niters / best:.0f} prob-iters/s "
                  f"(compile {dt0:.0f}s, median cost {med:.3f})", flush=True)
        except Exception as exc:
            print(f"[{case}] chain={c_budget} quad={q_budget}: FAILED "
                  f"{type(exc).__name__}: {str(exc)[:160]}", flush=True)
        finally:
            cl._MAX_ROW_ELEMS, ql._MAX_ROW_ELEMS_QUAD = orig_c, orig_q
            optimize.clear_cache()


def b_sweep(sizes=(2048, 4096)):
    from bench import build_batch
    from gaussianvi_tpu.inference import GVIConfig
    from gaussianvi_tpu.inference.optimize import optimize

    base = GVIConfig(niters=10, niters_lowtemp=10, step_size_base=0.9,
                     chain_impl="lanes")
    for b in sizes:
        graph_b, state_b = build_batch(b, 32, 2, 4)
        run = jax.jit(jax.vmap(
            lambda g, s: optimize(g, s, base, method="ngd")[0]
        ))
        try:
            dt0, best = _time_run(run, (graph_b, state_b), pipeline=4)
            print(f"[b-sweep] B={b}: {b * 10 / best:.0f} prob-iters/s "
                  f"(compile {dt0:.0f}s)", flush=True)
        except Exception as exc:
            print(f"[b-sweep] B={b}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:160]}", flush=True)


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    t0 = time.perf_counter()
    _sync(jax.jit(lambda x: (x @ x).sum())(jnp.eye(128)))
    print(f"warmup {time.perf_counter() - t0:.0f}s", flush=True)
    probe_planning("planar")
    probe_planning("point3d")
    b_sweep()


if __name__ == "__main__":
    main()
