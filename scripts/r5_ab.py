"""Round-5 device A/Bs: marginal quadrature on the estimation flagship,
and SDF matmul precision on the planar planner.

  python scripts/r5_ab.py [--which marginal,sdfprec,bsweep]

* marginal: bench-shape (B=1024, N=32, deg 4) NGD throughput with the
  measurement factor on the 29-node position-marginal rule (new default)
  vs the 137-node full-state rule (rounds 1-4), plus an f64-oracle
  accuracy check of the final costs on a 64-problem slice.
* sdfprec: planar planner (matmul interp) with the SDF hat-contraction
  at HIGH (default, 3 bf16 passes) vs HIGHEST (6 passes) vs DEFAULT
  (1 pass), with f64-oracle final-cost deltas.
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


def _rate(run, args, niters, nprob, pipeline=6, repeats=2):
    _sync(run(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [run(*args) for _ in range(pipeline)]
        _sync(outs[-1])
        best = min(best, (time.perf_counter() - t0) / pipeline)
    return nprob * niters / best


def ab_marginal():
    from bench import build_batch
    from gaussianvi_tpu.examples.chain_estimation import (
        build_chain_estimation,
    )
    from gaussianvi_tpu.inference import GVIConfig
    from gaussianvi_tpu.inference.optimize import optimize
    from gaussianvi_tpu.parallel.sharding import stack_problems

    cfg = GVIConfig(niters=10, niters_lowtemp=10, step_size_base=0.9)

    def batch(marginal, nprob):
        graphs, states = [], []
        for seed in range(nprob):
            g, s0, _ = build_chain_estimation(
                num_states=32, dim_x=2, gh_degree=4, seed=seed,
                marginal_quad=marginal,
            )
            graphs.append(g)
            states.append(s0)
        return stack_problems(graphs, states)

    for label, marginal in (("marginal-29node", True),
                            ("full-137node", False)):
        g_b, s_b = batch(marginal, 1024)
        run = jax.jit(jax.vmap(
            lambda g, s: optimize(g, s, cfg, method="ngd")[1].cost
        ))
        t0 = time.perf_counter()
        rate = _rate(run, (g_b, s_b), 10, 1024)
        print(f"  {label}: {rate:10.0f} prob-iters/s "
              f"({time.perf_counter() - t0:.0f}s incl. compile)", flush=True)

    # accuracy: final costs of both variants vs their own f64 oracles on
    # 64 problems (host CPU, same rules)
    cpu = jax.devices("cpu")[0]
    for label, marginal in (("marginal", True), ("full", False)):
        g_b, s_b = batch(marginal, 64)
        run = jax.jit(jax.vmap(
            lambda g, s: optimize(g, s, cfg, method="ngd")[1].cost
        ))
        dev_final = np.asarray(run(g_b, s_b))[:, -1]
        with jax.enable_x64(True), jax.default_device(cpu):
            g64, s64 = batch(marginal, 64)
            g64 = jax.tree.map(
                lambda x: x.astype(jnp.float64)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, g64
            )
            s64 = jax.tree.map(lambda x: x.astype(jnp.float64), s64)
            run64 = jax.jit(jax.vmap(
                lambda g, s: optimize(g, s, cfg, method="ngd")[1].cost
            ))
            ref_final = np.asarray(run64(g64, s64))[:, -1]
        rel = np.abs(dev_final - ref_final) / np.maximum(
            np.abs(ref_final), 1e-12
        )
        print(f"  {label} vs own f64 oracle (B=64): median rel "
              f"{np.median(rel):.2e}, max {rel.max():.2e}", flush=True)


def ab_sdfprec():
    from dataclasses import replace

    from gaussianvi_tpu.examples.planar_planning import (
        build_planar_planning,
    )
    from gaussianvi_tpu.factors import sdf as sdf_mod
    from gaussianvi_tpu.inference.optimize import optimize
    from gaussianvi_tpu.parallel.restarts import perturb_inits

    restarts, niters = 512, 10
    for prec in ("high", "highest", "default"):
        sdf_mod.set_sdf_matmul_precision(prec)
        graph, init, config, _ = build_planar_planning(
            gh_degree=3, interp="matmul"
        )
        config = replace(config, niters=niters, niters_lowtemp=niters,
                         chain_impl="lanes", quad_impl="xla")
        init_b = perturb_inits(init, jax.random.key(0), restarts,
                               mean_scale=0.3)
        run = jax.jit(jax.vmap(
            lambda s: optimize(graph, s, config, method="ngd")[1].cost[-1]
        ))
        t0 = time.perf_counter()
        finals = run(init_b)
        _sync(finals)
        rate = _rate(run, (init_b,), niters, restarts, pipeline=8)
        print(f"  sdf matmul {prec}: {rate:10.0f} prob-iters/s, median "
              f"final {float(jnp.median(finals)):.4f} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
    sdf_mod.set_sdf_matmul_precision("high")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="marginal,sdfprec")
    args = ap.parse_args()
    print("platform:", jax.devices()[0].platform, flush=True)
    t0 = time.perf_counter()
    _sync(jax.jit(lambda x: (x @ x).sum())(jnp.eye(128)))
    print(f"warmup {time.perf_counter() - t0:.0f}s", flush=True)
    if "marginal" in args.which:
        print("A/B: estimation flagship marginal quadrature "
              "(B=1024, N=32, deg 4):", flush=True)
        ab_marginal()
    if "sdfprec" in args.which:
        print("A/B: planar planner SDF matmul precision "
              f"(B=512):", flush=True)
        ab_sdfprec()


if __name__ == "__main__":
    main()
