"""Adjudicate moments-path numerics against a float64 host oracle.

Round-2 finding (see PERF.md): on TPU, XLA lowers f32 einsums to a single
bf16 MXU pass at DEFAULT matmul precision, costing the Hessian moment
E[(x-mu)(x-mu)^T phi] ~2 decimal digits (2.1e-2 max rel err at the bench
operating point).  The Pallas fused kernel (full-f32 VPU reductions) and
the XLA path under HIGHEST precision both sit at ~1e-6.  This script
reproduces that table; ops/precision.py pins the production einsums.
"""
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from gaussianvi_tpu.factors.moments import gh_moments
from gaussianvi_tpu.kernels.fused_moments import fused_moments
from gaussianvi_tpu.examples.chain_estimation import range_cost, range_cost_block
from gaussianvi_tpu.quadrature import get_rule

nodes_np, weights_np = get_rule(4, 4)
kk = 512
rng = np.random.default_rng(0)
mu_np = rng.uniform(1, 2, (kk, 4))
cov_np = 0.05 * np.broadcast_to(np.eye(4), (kk, 4, 4)).copy()
r_np = rng.uniform(2, 4, kk)
beacon_np = np.broadcast_to(np.array([-1.0, -1.0]), (kk, 2)).copy()
sig_np = np.full((kk,), 0.01)

# ---- f64 host oracle -------------------------------------------------------
L = np.linalg.cholesky(cov_np)                       # [K,4,4]
diff = np.einsum("md,ked->kme", nodes_np, L)         # [K,M,4]
pts = diff + mu_np[:, None, :]
pos = pts[..., :2]
dist = np.sqrt(np.sum((pos - beacon_np[:, None, :]) ** 2, axis=-1) + 1e-12)
phi = (r_np[:, None] - dist) ** 2 / (2.0 * sig_np[:, None])
wphi = phi * weights_np[None, :]
o_phi = wphi.sum(-1)
o_xmu = np.einsum("km,kmd->kd", wphi, diff)
o_xxt = np.einsum("km,kmd,kme->kde", wphi, diff, diff)
oracle = (o_phi, o_xmu, o_xxt)

# ---- device paths ----------------------------------------------------------
nodes = jnp.asarray(nodes_np, jnp.float32)
weights = jnp.asarray(weights_np, jnp.float32)
mu = jnp.asarray(mu_np, jnp.float32)
cov = jnp.asarray(cov_np, jnp.float32)
params = {
    "r": jnp.asarray(r_np, jnp.float32),
    "beacon": jnp.asarray(beacon_np, jnp.float32),
    "sig_r_sq": jnp.asarray(sig_np, jnp.float32),
}
leaves = jax.tree.leaves(params)

print("platform:", jax.devices()[0].platform, flush=True)
t0 = time.perf_counter()
out_p = jax.jit(lambda m, c, *p: fused_moments(
    nodes, weights, m, c, range_cost_block, tuple(p)
))(mu, cov, *leaves)
jax.block_until_ready(out_p)
print(f"pallas compile+run {time.perf_counter()-t0:.1f}s")

out_x = jax.jit(lambda m, c, p: gh_moments(nodes, weights, m, c, range_cost, p))(
    mu, cov, params)
jax.block_until_ready(out_x)

with jax.default_matmul_precision("highest"):
    out_xh = jax.jit(lambda m, c, p: gh_moments(
        nodes, weights, m, c, range_cost, p))(mu, cov, params)
    jax.block_until_ready(out_xh)


def report(name, out):
    errs = []
    for a, o in zip(out, oracle):
        a = np.asarray(a, np.float64)
        errs.append(np.max(np.abs(a - o)) / (np.max(np.abs(o)) + 1e-30))
    print(f"{name:28s} rel-err vs f64 oracle: "
          + "  ".join(f"{e:.2e}" for e in errs), flush=True)


report("pallas kernel", out_p)
report("xla default precision", out_x)
report("xla highest precision", out_xh)
