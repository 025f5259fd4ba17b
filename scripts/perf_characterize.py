"""Full device-level performance characterization (round-2 PERF.md source).

One TPU process (the remote-compile session warmup is per-process):

  1. phase breakdown of the NGD iteration at the bench operating point
     (device_profile.py's in-program lax.scan repetition — per-call RPC
     floor divided out);
  2. XLA cost_analysis FLOP counts of the full 10-iteration program ->
     achieved FLOP/s and MFU vs the chip's peak;
  3. B x N throughput sweep of the full optimizer (where does iters/s
     saturate);
  4. the compiled Pallas fused-moments kernel vs the fused-XLA moments
     path: compile time, correctness, per-rep device time.

Appends everything to PERF_RAW.log (flushed per line) so partial progress
survives.  Run:
    JAX_PLATFORMS=tpu python scripts/perf_characterize.py [sections...]
with sections from {phase, mfu, sweep, pallas} (default: all) so an
interrupted run can resume from where it stopped.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax import lax

LOG = open(Path(__file__).resolve().parent.parent / "PERF_RAW.log", "a")


def log(msg: str):
    print(msg, flush=True)
    LOG.write(msg + "\n")
    LOG.flush()


def _sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def scan_time(fn, *args, reps=100, label="", repeats=3):
    """Per-rep device time of fn(eps, *args) via an in-program scan."""

    @jax.jit
    def run(args):
        def body(eps, _):
            out = fn(eps, *args)
            leaf = jax.tree.leaves(out)[0]
            return 1e-30 * jnp.sum(leaf).astype(eps.dtype), None

        eps, _ = lax.scan(body, jnp.zeros((), jnp.float32), None, length=reps)
        return eps

    t0 = time.perf_counter()
    _sync(run(args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(run(args))
        times.append(time.perf_counter() - t0)
    dt = min(times) / reps
    log(f"{label:34s} {dt * 1e3:9.4f} ms/rep   (compile {compile_s:.0f}s)")
    return dt


def pipeline_rate(run, args, niters, nprob, pipeline=24, repeats=2):
    """Sustained iters/s of a full-optimize callable via async pipelining."""
    _sync(run(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        outs = [run(*args) for _ in range(pipeline)]
        _sync(outs[-1])
        best = min(best, (time.perf_counter() - t0) / pipeline)
    return nprob * niters / best


def main(sections=("phase", "mfu", "sweep", "pallas")):
    from bench import build_batch
    from gaussianvi_tpu.inference import GVIConfig
    from gaussianvi_tpu.inference.gvi import factor_costs, ngd_gradients
    from gaussianvi_tpu.inference.optimize import optimize

    device = jax.devices()[0]
    log(f"# perf_characterize  device={device.device_kind} "
        f"platform={device.platform}  time={time.strftime('%F %T')}")

    t0 = time.perf_counter()
    _sync(jax.jit(lambda x: (x @ x).sum())(jnp.eye(128)))
    log(f"warmup {time.perf_counter() - t0:.0f}s")

    # ---------------- operating point: B=64, N=32, s=4, deg-4 rule --------
    graph_b, state_b = build_batch(64, 32, 2, 4)
    graph_b = jax.device_put(graph_b, device)
    state_b = jax.device_put(state_b, device)
    diag, off = state_b.precision.diag, state_b.precision.off
    b, n, s, _ = diag.shape
    config = GVIConfig(niters=10, niters_lowtemp=10, step_size_base=0.9,
                       chain_impl="lanes")

    from gaussianvi_tpu.kernels.chain_lanes import (
        gbp_covariance_logdet_lanes,
        solve_lanes,
    )

    if "phase" in sections:
        _phase_section(
            log, diag, off, b, n, s, state_b, graph_b,
            gbp_covariance_logdet_lanes, solve_lanes, factor_costs,
            ngd_gradients, optimize, GVIConfig,
        )

    rate = None
    if "mfu" in sections:
        rate = _mfu_section(log, graph_b, state_b, config, optimize)

    if "sweep" in sections:
        _sweep_section(log, build_batch, device, config, optimize)

    if "pallas" in sections:
        _pallas_section(log, graph_b, state_b, config, rate, optimize,
                        GVIConfig)

    log("\ndone")


def _phase_section(log, diag, off, b, n, s, state_b, graph_b,
                   gbp_covariance_logdet_lanes, solve_lanes, factor_costs,
                   ngd_gradients, optimize, GVIConfig):
    log("\n## phase breakdown (B=64, N=32, s=4, lanes)")
    # line-search chain batch: 64 problems x 11 trials
    diag11 = jnp.tile(diag, (11, 1, 1, 1))
    off11 = jnp.tile(off, (11, 1, 1, 1))
    scan_time(lambda e, d, o: gbp_covariance_logdet_lanes(d + e, o)[2],
              diag11, off11, label="chain cov+logdet B=704 (11 trials)")
    scan_time(lambda e, d, o: gbp_covariance_logdet_lanes(d + e, o)[2],
              diag, off, label="chain cov+logdet B=64")
    rhs = jnp.ones((2 * b, n, s), diag.dtype)
    scan_time(lambda e, d, o, r: solve_lanes(d + e, o, r),
              jnp.tile(diag, (2, 1, 1, 1)), jnp.tile(off, (2, 1, 1, 1)), rhs,
              label="chain solve B=128 (main+fallback)")
    cd, co, _ = gbp_covariance_logdet_lanes(diag, off)

    def fc11(eps, mu, cd_, co_):
        f = jax.vmap(jax.vmap(
            lambda m, d, o, g: factor_costs(g, m + eps, d, o, 1.0, True),
            in_axes=(0, 0, 0, None),
        ), in_axes=(0, 0, 0, 0))
        mu11 = jnp.broadcast_to(mu[:, None], (b, 11) + mu.shape[1:])
        cd11 = jnp.broadcast_to(cd_[:, None], (b, 11) + cd_.shape[1:])
        co11 = jnp.broadcast_to(co_[:, None], (b, 11) + co_.shape[1:])
        return f(mu11, cd11, co11, graph_b)

    scan_time(fc11, state_b.mu, cd, co, label="factor_costs B=704 (11 trials)")

    def grads(eps, mu, cd_, co_):
        return jax.vmap(
            lambda g, m, d, o: ngd_gradients(g, m + eps, d, o, 1.0)[0]
        )(graph_b, mu, cd_, co_)

    scan_time(grads, state_b.mu, cd, co, label="ngd_gradients B=64")

    def full1(eps, mu):
        from gaussianvi_tpu.inference.graph import GaussianState

        cfg1 = GVIConfig(niters=1, niters_lowtemp=10, step_size_base=0.9,
                         chain_impl="lanes")
        st = GaussianState(mu + eps, state_b.precision)
        out = jax.vmap(
            lambda g, s_: optimize(g, s_, cfg1, method="ngd")[0]
        )(graph_b, st)
        return out.mu

    scan_time(full1, state_b.mu, reps=20,
              label="full single iteration B=64")


def _mfu_section(log, graph_b, state_b, config, optimize):
    import jax

    # ---------------- FLOPs / MFU ----------------------------------------
    log("\n## cost_analysis (full 10-iteration program, B=64)")
    run10 = jax.jit(jax.vmap(
        lambda g, s_: optimize(g, s_, config, method="ngd")[0]
    ))
    lowered = run10.lower(graph_b, state_b)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", float("nan")))
        bytes_ = float(ca.get("bytes accessed", float("nan")))
        log(f"flops per call (10 iters x 64 problems): {flops:.3e}")
        log(f"bytes accessed per call: {bytes_:.3e}")
    except Exception as exc:  # noqa: BLE001
        flops = float("nan")
        log(f"cost_analysis unavailable: {exc}")

    rate = pipeline_rate(run10, (graph_b, state_b), 10, 64)
    log(f"full optimize pipelined: {rate:.1f} problem-iters/s")
    if flops == flops:
        # flops is per program call = 640 problem-iterations
        flops_per_iter = flops / 640.0
        achieved = flops_per_iter * rate
        log(f"achieved compute: {achieved / 1e12:.4f} TFLOP/s "
            f"({flops_per_iter:.3e} flops/problem-iter)")
        log("peaks for reference: v5e bf16 197 TFLOP/s, f32 ~49 TFLOP/s")
        log(f"MFU vs f32 peak 49 TF: {achieved / 49e12 * 100:.3f}%   "
            f"vs bf16 peak 197 TF: {achieved / 197e12 * 100:.3f}%")
    return rate


def _sweep_section(log, build_batch, device, config, optimize):
    import os

    import jax

    # ---------------- B x N sweep -----------------------------------------
    log("\n## B x N sweep (full 10-iteration optimize, lanes, iters/s)")
    spec = os.environ.get("PERF_SWEEP", "")
    if spec:
        sweep = [tuple(int(v) for v in p.split("x")) for p in spec.split(",")]
    else:
        sweep = [(64, 32), (256, 32), (1024, 32), (64, 128), (256, 128),
                 (64, 512)]
    for bb, nn in sweep:
        try:
            g_b, s_b = build_batch(bb, nn, 2, 4)
            g_b = jax.device_put(g_b, device)
            s_b = jax.device_put(s_b, device)
            run = jax.jit(jax.vmap(
                lambda g, s_: optimize(g, s_, config, method="ngd")[0]
            ))
            t0 = time.perf_counter()
            r = pipeline_rate(run, (g_b, s_b), 10, bb,
                              pipeline=8 if bb * nn > 8192 else 24)
            log(f"B={bb:5d} N={nn:4d}: {r:10.1f} prob-iters/s  "
                f"({bb * nn} chain-states, first-call {time.perf_counter() - t0:.0f}s)")
        except Exception as exc:  # noqa: BLE001
            log(f"B={bb} N={nn}: FAILED {type(exc).__name__}: {str(exc)[:200]}")


def _pallas_section(log, graph_b, state_b, config, rate, optimize, GVIConfig):
    import jax
    import jax.numpy as jnp

    # ---------------- Pallas fused moments vs XLA -------------------------
    log("\n## fused moments: compiled Pallas kernel vs fused-XLA path")
    from gaussianvi_tpu.factors.moments import gh_moments
    from gaussianvi_tpu.kernels.fused_moments import fused_moments
    from gaussianvi_tpu.examples.chain_estimation import (
        range_cost,
        range_cost_block,
    )
    from gaussianvi_tpu.quadrature import get_rule
    import numpy as np

    nodes, weights = (jnp.asarray(a, jnp.float32) for a in get_rule(4, 4))
    kk = 64 * 32  # the bench batch flattened onto the factor axis
    rng = np.random.default_rng(0)
    mu_k = jnp.asarray(rng.uniform(1, 2, (kk, 4)), jnp.float32)
    cov_k = jnp.asarray(
        0.05 * np.broadcast_to(np.eye(4), (kk, 4, 4)), jnp.float32
    )
    params = {
        "r": jnp.asarray(rng.uniform(2, 4, kk), jnp.float32),
        "beacon": jnp.broadcast_to(
            jnp.asarray([-1.0, -1.0], jnp.float32), (kk, 2)
        ),
        "sig_r_sq": jnp.full((kk,), 0.01, jnp.float32),
    }
    leaves = jax.tree.leaves(params)  # beacon, r, sig_r_sq (key order)

    t0 = time.perf_counter()
    pall = jax.jit(lambda m, c, *p: fused_moments(
        nodes, weights, m, c, range_cost_block, tuple(p)
    ))
    out_p = pall(mu_k, cov_k, *leaves)
    _sync(out_p)
    log(f"pallas kernel compile+first-run: {time.perf_counter() - t0:.1f}s")

    xla = jax.jit(lambda m, c, p: gh_moments(
        nodes, weights, m, c, range_cost, p
    ))
    out_x = xla(mu_k, cov_k, params)
    _sync(out_x)
    err = max(
        float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-30))
        for a, b in zip(out_p, out_x)
    )
    log(f"pallas vs xla max rel err: {err:.2e}")

    # adjudicate against a host f64 oracle (who owns the discrepancy?)
    L = np.linalg.cholesky(np.asarray(cov_k, np.float64))
    diff = np.einsum("md,ked->kme", np.asarray(nodes, np.float64), L)
    pts = diff + np.asarray(mu_k, np.float64)[:, None, :]
    pos = pts[..., :2]
    beac = np.asarray(params["beacon"], np.float64)[:, None, :]
    dist = np.sqrt(np.sum((pos - beac) ** 2, axis=-1) + 1e-12)
    phi = (np.asarray(params["r"], np.float64)[:, None] - dist) ** 2 / (
        2.0 * np.asarray(params["sig_r_sq"], np.float64)[:, None]
    )
    wphi = phi * np.asarray(weights, np.float64)[None, :]
    oracle = (
        wphi.sum(-1),
        np.einsum("km,kmd->kd", wphi, diff),
        np.einsum("km,kmd,kme->kde", wphi, diff, diff),
    )
    for name, out in (("pallas", out_p), ("xla", out_x)):
        errs = "  ".join(
            f"{np.max(np.abs(np.asarray(a, np.float64) - o)) / np.max(np.abs(o)):.2e}"
            for a, o in zip(out, oracle)
        )
        log(f"{name:8s} vs f64 oracle rel err (E_phi, E_xmu, E_xxt): {errs}")

    scan_time(lambda e, m, c: pall(m + e, c, *leaves), mu_k, cov_k,
              label=f"pallas fused moments K={kk}")
    scan_time(lambda e, m, c: xla(m + e, c, params), mu_k, cov_k,
              label=f"xla fused moments K={kk}")

    # full optimizer with the Pallas moments path
    t0 = time.perf_counter()
    cfg_p = GVIConfig(niters=10, niters_lowtemp=10, step_size_base=0.9,
                      chain_impl="lanes", use_pallas=True)
    run_p = jax.jit(jax.vmap(
        lambda g, s_: optimize(g, s_, cfg_p, method="ngd")[0]
    ))
    try:
        _sync(run_p(graph_b, state_b))
        log(f"full optimize use_pallas=True compile+run: "
            f"{time.perf_counter() - t0:.0f}s")
        rp = pipeline_rate(run_p, (graph_b, state_b), 10, 64)
        base = f"(XLA path: {rate:.1f})" if rate else ""
        log(f"full optimize use_pallas=True: {rp:.1f} prob-iters/s {base}")
    except Exception as exc:  # noqa: BLE001
        log(f"use_pallas=True full optimize FAILED after "
            f"{time.perf_counter() - t0:.0f}s: {str(exc)[:300]}")


if __name__ == "__main__":
    main(tuple(sys.argv[1:]) or ("phase", "mfu", "sweep", "pallas"))
