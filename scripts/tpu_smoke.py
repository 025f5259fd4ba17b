"""On-device smoke test: run the core paths on the real TPU (f32).

The unit suite runs on CPU/f64 for golden parity; this script exercises the
compiled TPU paths end-to-end — chain-estimation NGD (scan and lanes chain
kernels), the planner, and the lanes kernels against their scan oracles.

    python scripts/tpu_smoke.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr)
    from gaussianvi_tpu.examples.chain_estimation import build_chain_estimation
    from gaussianvi_tpu.inference import GVIConfig, optimize
    from gaussianvi_tpu.kernels.chain_lanes import gbp_covariance_logdet_lanes
    from gaussianvi_tpu.ops.blocktridiag import (
        BlockTridiag,
        gbp_covariance_logdet,
    )

    failures = []

    # 1. chain estimation, scan chain
    graph, init, _ = build_chain_estimation(num_states=16, dim_x=1,
                                            gh_degree=4)
    # pin the scan path: "auto" now resolves to lanes on TPU
    cfg = GVIConfig(niters=5, niters_lowtemp=5, step_size_base=0.9,
                    chain_impl="seq")
    t0 = time.perf_counter()
    final, hist = optimize(graph, init, cfg, method="ngd")
    sync(final)
    cost = np.asarray(hist.cost)
    ok = np.isfinite(cost).all() and cost[-1] < cost[0]
    print(f"scan NGD: {time.perf_counter()-t0:.1f}s, cost "
          f"{cost[0]:.1f}->{cost[-1]:.1f} [{'OK' if ok else 'FAIL'}]")
    if not ok:
        failures.append("scan-ngd")

    # 2. same with lanes chain kernel
    cfg_l = GVIConfig(niters=5, niters_lowtemp=5, step_size_base=0.9,
                      chain_impl="lanes")
    t0 = time.perf_counter()
    final_l, hist_l = optimize(graph, init, cfg_l, method="ngd")
    sync(final_l)
    # different chain impls can flip marginal line-search accept decisions
    # in f32, so compare converged COSTS (both must reach the same basin)
    c_scan = float(hist.cost[-1])
    c_lanes = float(hist_l.cost[-1])
    # accept if lanes reaches the same basin or better (line-search accept
    # decisions flip between impls in f32)
    ok = np.isfinite(c_lanes) and c_lanes < c_scan * 1.05 + 1e-3
    print(f"lanes NGD: {time.perf_counter()-t0:.1f}s, final cost "
          f"{c_lanes:.2f} vs scan {c_scan:.2f} [{'OK' if ok else 'FAIL'}]")
    if not ok:
        failures.append("lanes-ngd")

    # 3. lanes kernel vs scan oracle, compiled
    rng = np.random.default_rng(0)
    diag = rng.standard_normal((256, 16, 4, 4)).astype("float32")
    diag = diag @ diag.transpose(0, 1, 3, 2) + 12 * np.eye(4, dtype="float32")
    off = (0.5 * rng.standard_normal((256, 15, 4, 4))).astype("float32")
    cd, co, ld = jax.jit(gbp_covariance_logdet_lanes)(
        jnp.asarray(diag), jnp.asarray(off)
    )
    cd0, co0, ld0 = jax.jit(
        jax.vmap(lambda d, o: gbp_covariance_logdet(BlockTridiag(d, o)))
    )(jnp.asarray(diag), jnp.asarray(off))
    err = float(jnp.abs(cd - cd0).max())
    ok = err < 1e-3
    print(f"lanes-vs-scan covariance err {err:.2e} [{'OK' if ok else 'FAIL'}]")
    if not ok:
        failures.append("lanes-kernel")

    # 4. lanes quadrature kernel vs fused-XLA moments, compiled
    from gaussianvi_tpu.factors import moments as mm
    from gaussianvi_tpu.kernels.quad_lanes import quad_lanes

    fb = graph.nonlinear[0]
    k, d = fb.start.shape[0], fb.dim
    b = 256
    mu_q = jnp.asarray(rng.standard_normal((b, k, d)), jnp.float32)
    a = rng.standard_normal((b, k, d, d)).astype("float32") * 0.3
    cov_q = jnp.asarray(a @ a.transpose(0, 1, 3, 2)
                        + 0.5 * np.eye(d, dtype="float32"))
    leaves = tuple(
        jnp.broadcast_to(p[None], (b,) + p.shape)
        for p in jax.tree.leaves(fb.params)
    )
    struct = jax.tree.structure(fb.params)
    q = jax.jit(lambda m, c, *ps: quad_lanes(
        m, c, fb.nodes, fb.weights, fb.lanes_cost, ps, True))(
        mu_q, cov_q, *leaves)
    ref = jax.jit(jax.vmap(lambda m, c, *ps: mm.gh_moments(
        fb.nodes, fb.weights, m, c, fb.cost_fn,
        jax.tree.unflatten(struct, list(ps)))))(mu_q, cov_q, *leaves)
    errs = [float(jnp.abs(x - y).max()) for x, y in zip(q, ref)]
    ok = max(errs) < 1e-3
    print(f"quad-lanes-vs-XLA moments err {max(errs):.2e} "
          f"[{'OK' if ok else 'FAIL'}]")
    if not ok:
        failures.append("quad-lanes-kernel")

    # 5. end-to-end numerics gate: full 10-iteration NGD trajectory on the
    # device (f32, the default fast path) vs the f64 HOST oracle.  The
    # round-2 precision finding (DEFAULT matmul precision silently cost the
    # Hessian moment two digits) is the class of bug this catches: a single
    # kernel check passes while the composed trajectory drifts.  f32 accept
    # decisions can flip at accept-boundary trials (PERF.md), so the gate
    # compares the COST trajectory (the basin), not raw iterates.
    from gaussianvi_tpu.inference.optimize import optimize as opt_fn

    cfg10 = GVIConfig(niters=10, niters_lowtemp=10, step_size_base=0.9)
    cpu = jax.devices("cpu")[0]
    # f64 host oracle: x64 scoped to this block only (the device path must
    # trace with 32-bit semantics — production mode, and Mosaic rejects
    # mixed-width index arithmetic)
    with jax.enable_x64(True), jax.default_device(cpu):
        g64, s64, _ = build_chain_estimation(
            num_states=32, dim_x=2, gh_degree=4, seed=0
        )
        _, hist64 = opt_fn(g64, s64, cfg10, method="ngd")
        cost64 = np.asarray(hist64.cost, dtype=np.float64)
    g32, s32, _ = build_chain_estimation(
        num_states=32, dim_x=2, gh_degree=4, seed=0
    )
    t0 = time.perf_counter()
    _, hist32 = opt_fn(g32, s32, cfg10, method="ngd")
    sync(hist32.cost)
    cost32 = np.asarray(hist32.cost, dtype=np.float64)
    rel = np.abs(cost32 - cost64) / np.maximum(np.abs(cost64), 1e-12)
    # committed tolerance: 1e-3 max relative cost error over 10 iterations
    # (measured headroom ~50x at HIGHEST contraction precision; the DEFAULT-
    # precision bug class lands at ~1e-2 and trips this)
    ok = bool(np.isfinite(cost32).all() and rel.max() < 1e-3)
    print(f"e2e 10-iter f32-vs-f64 gate: {time.perf_counter()-t0:.1f}s, "
          f"max rel cost err {rel.max():.2e} (tol 1e-3) "
          f"[{'OK' if ok else 'FAIL'}]")
    if not ok:
        failures.append("e2e-numerics-gate")

    # 6. planner gate: the planning workloads run the SEPARATE-kernel path
    # (SDF lanes_prep disqualifies the fused kernel), which PERF.md §14
    # showed carries a device-f32 accept-noise tail on hard problems —
    # check the planar planner's device trajectory against the f64 host
    # oracle every bench session
    from gaussianvi_tpu.examples.planar_planning import build_planar_planning

    with jax.enable_x64(True), jax.default_device(cpu):
        g64p, i64p, cfg_p, _ = build_planar_planning(gh_degree=3)
        _, h64p = opt_fn(g64p, i64p, cfg_p, method="ngd")
        c64p = float(h64p.cost[-1])
    g32p, i32p, cfg_p32, _ = build_planar_planning(gh_degree=3)
    t0 = time.perf_counter()
    _, h32p = opt_fn(g32p, i32p, cfg_p32, method="ngd")
    sync(h32p.cost)
    c32p = float(h32p.cost[-1])
    relp = abs(c32p - c64p) / max(abs(c64p), 1e-9)
    # accept decisions can flip at accept-boundary trials; the gate is the
    # basin (2%), not bitwise parity
    ok = np.isfinite(c32p) and relp < 2e-2
    print(f"planar-planner f32-vs-f64 gate: {time.perf_counter()-t0:.1f}s, "
          f"final cost {c32p:.2f} vs f64 {c64p:.2f} (rel {relp:.2e}, "
          f"tol 2e-2) [{'OK' if ok else 'FAIL'}]")
    if not ok:
        failures.append("planner-gate")

    if failures:
        print(f"FAILURES: {failures}")
        return 1
    print("all TPU smoke checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
