"""Compare formulations of the hot moments contractions on TPU.

Variants of (sigma placement + E[phi] + E[(x-mu)phi] + E[xx^T phi]):
  default  - jnp.einsum at DEFAULT matmul precision (1 bf16 MXU pass)
  high     - precision=HIGH (3 bf16 passes)
  highest  - precision=HIGHEST (6 passes)
  vpu      - broadcast-multiply-reduce (pure elementwise, exact f32 VPU)

Reports per-rep device time and max rel err vs a float64 host oracle.
Decides what the production gh_moments should use (see PERF.md).
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gaussianvi_tpu.ops.smallmat import chol_small
from gaussianvi_tpu.quadrature import get_rule


def _sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def scan_time(fn, *args, reps=200, label=""):
    @jax.jit
    def run(args):
        def body(eps, _):
            out = fn(eps, *args)
            leaf = jax.tree.leaves(out)[0]
            return 1e-30 * jnp.sum(leaf).astype(eps.dtype), None

        eps, _ = lax.scan(body, jnp.zeros((), jnp.float32), None, length=reps)
        return eps

    _sync(run(args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(run(args))
        times.append(time.perf_counter() - t0)
    dt = min(times) / reps
    print(f"{label:32s} {dt * 1e6:9.1f} us/rep", flush=True)
    return dt


def cost(pts, r, beacon, sig):
    pos = pts[..., :2]
    dist = jnp.sqrt(jnp.sum((pos - beacon) ** 2, axis=-1) + 1e-12)
    return (r - dist) ** 2 / (2.0 * sig)


def moments_einsum(nodes, weights, mu, cov, r, beacon, sig, precision):
    ein = functools.partial(jnp.einsum, precision=precision)
    sqrt_p = chol_small(cov)
    diff = ein("md,ked->kme", nodes, sqrt_p)
    pts = diff + mu[:, None, :]
    phi = cost(pts, r[:, None], beacon[:, None, :], sig[:, None])
    wphi = phi * weights[None, :]
    e_phi = jnp.sum(wphi, axis=-1)
    e_xmu = ein("km,kmd->kd", wphi, diff)
    e_xxt = ein("km,kmd,kme->kde", wphi, diff, diff)
    return e_phi, e_xmu, e_xxt


def moments_vpu(nodes, weights, mu, cov, r, beacon, sig):
    sqrt_p = chol_small(cov)
    # diff[k,m,e] = sum_d nodes[m,d] sqrt_p[k,e,d]  (elementwise + reduce)
    diff = jnp.sum(nodes[None, :, None, :] * sqrt_p[:, None, :, :], axis=-1)
    pts = diff + mu[:, None, :]
    phi = cost(pts, r[:, None], beacon[:, None, :], sig[:, None])
    wphi = phi * weights[None, :]
    e_phi = jnp.sum(wphi, axis=-1)
    wd = wphi[:, :, None] * diff
    e_xmu = jnp.sum(wd, axis=1)
    e_xxt = jnp.sum(wd[:, :, :, None] * diff[:, :, None, :], axis=1)
    return e_phi, e_xmu, e_xxt


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    t0 = time.perf_counter()
    _sync(jax.jit(lambda x: (x @ x).sum())(jnp.eye(128)))
    print(f"warmup {time.perf_counter() - t0:.0f}s", flush=True)

    nodes_np, weights_np = get_rule(4, 4)
    kk = 2048
    rng = np.random.default_rng(0)
    mu_np = rng.uniform(1, 2, (kk, 4))
    cov_np = 0.05 * np.broadcast_to(np.eye(4), (kk, 4, 4)).copy()
    r_np = rng.uniform(2, 4, kk)
    beacon_np = np.broadcast_to(np.array([-1.0, -1.0]), (kk, 2)).copy()
    sig_np = np.full((kk,), 0.01)

    # f64 oracle
    L = np.linalg.cholesky(cov_np)
    diff = np.einsum("md,ked->kme", nodes_np, L)
    pts = diff + mu_np[:, None, :]
    dist = np.sqrt(np.sum((pts[..., :2] - beacon_np[:, None, :]) ** 2, -1)
                   + 1e-12)
    phi = (r_np[:, None] - dist) ** 2 / (2.0 * sig_np[:, None])
    wphi = phi * weights_np[None, :]
    oracle = (wphi.sum(-1), np.einsum("km,kmd->kd", wphi, diff),
              np.einsum("km,kmd,kme->kde", wphi, diff, diff))

    args = tuple(jnp.asarray(a, jnp.float32) for a in
                 (nodes_np, weights_np, mu_np, cov_np, r_np, beacon_np,
                  sig_np))
    nodes, weights, mu, cov, r, beacon, sig = args

    variants = {
        "einsum default": jax.jit(lambda m, c: moments_einsum(
            nodes, weights, m, c, r, beacon, sig, lax.Precision.DEFAULT)),
        "einsum high": jax.jit(lambda m, c: moments_einsum(
            nodes, weights, m, c, r, beacon, sig, lax.Precision.HIGH)),
        "einsum highest": jax.jit(lambda m, c: moments_einsum(
            nodes, weights, m, c, r, beacon, sig, lax.Precision.HIGHEST)),
        "vpu broadcast": jax.jit(lambda m, c: moments_vpu(
            nodes, weights, m, c, r, beacon, sig)),
    }
    for name, fn in variants.items():
        out = fn(mu, cov)
        jax.block_until_ready(out)
        errs = "  ".join(
            f"{np.max(np.abs(np.asarray(a, np.float64) - o)) / np.max(np.abs(o)):.1e}"
            for a, o in zip(out, oracle)
        )
        print(f"{name:32s} rel err (E_phi, E_xmu, E_xxt): {errs}", flush=True)
        scan_time(lambda e, m, c, f=fn: f(m + e, c), mu, cov,
                  label=f"{name} K={kk}")


if __name__ == "__main__":
    main()
