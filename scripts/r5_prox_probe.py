"""Where does the prox iteration's time go? (round 5)

The prox co-metric measured 6,136 prob-iters/s at the bench shape vs
839,953 for NGD.  The JKO gradient phase runs, per factor and iteration:
one `jnp.linalg.eigh` (sqrtm_product) + two spd_inv.  This probe times
the full prox loop against variants with the suspect ops monkeypatched
to shape-identical cheap stand-ins (results are numerically WRONG — the
point is the throughput delta, which bounds each op's share).

    python scripts/r5_prox_probe.py
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


def measure(label, nprob=1024):
    from bench import build_batch
    from gaussianvi_tpu.inference import GVIConfig
    from gaussianvi_tpu.inference.optimize import optimize

    cfg = GVIConfig(niters=10, niters_lowtemp=10, step_size_base=0.9)
    g_b, s_b = build_batch(nprob, 32, 2, 4)
    run = jax.jit(jax.vmap(
        lambda g, s: optimize(g, s, cfg, method="prox")[1].cost
    ))
    _sync(run(g_b, s_b))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [run(g_b, s_b) for _ in range(4)]
        _sync(outs[-1])
        best = min(best, (time.perf_counter() - t0) / 4)
    rate = nprob * 10 / best
    print(f"  {label}: {rate:10.0f} prob-iters/s", flush=True)
    return rate


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    t0 = time.perf_counter()
    _sync(jax.jit(lambda x: (x @ x).sum())(jnp.eye(128)))
    print(f"warmup {time.perf_counter() - t0:.0f}s", flush=True)

    from gaussianvi_tpu.inference import gvi
    from gaussianvi_tpu.ops import psd

    base = measure("prox full (reference semantics)")

    # stand-in: sqrtm(A(A+4sI)) ~ A + 2sI (exact for commuting scalar
    # case; WRONG in general — throughput probe only)
    real_sqrtm = gvi.sqrtm_product

    def fake_sqrtm(a, s):
        d = a.shape[-1]
        return a + 2.0 * s * jnp.eye(d, dtype=a.dtype)

    gvi.sqrtm_product = fake_sqrtm
    try:
        no_eigh = measure("prox with sqrtm_product stubbed (no eigh)")
    finally:
        gvi.sqrtm_product = real_sqrtm

    share = 1.0 - base / no_eigh
    print(f"  eigh (sqrtm_product) share of the prox iteration: "
          f"{share:.1%} (upper-bound speedup if replaced: "
          f"{no_eigh / base:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
