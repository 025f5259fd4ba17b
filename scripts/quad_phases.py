"""Phase-level timing of the quadrature paths (lanes vs XLA) and of the
remaining NGD iteration after the quad_lanes kernel landed.

In-program lax.scan repetition divides out the ~24 ms tunnel RPC floor
(same harness as perf_characterize.py).  Appends to PERF_RAW.log.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from scripts.perf_characterize import log, scan_time, _sync


def main():
    from bench import build_batch
    from gaussianvi_tpu.factors import moments as mm
    from gaussianvi_tpu.inference import GVIConfig
    from gaussianvi_tpu.kernels.chain_lanes import gbp_covariance_logdet_lanes
    from gaussianvi_tpu.kernels.quad_lanes import quad_lanes

    device = jax.devices()[0]
    log(f"# quad_phases  device={device.device_kind}  "
        f"time={time.strftime('%F %T')}")
    t0 = time.perf_counter()
    _sync(jax.jit(lambda x: (x @ x).sum())(jnp.eye(128)))
    log(f"warmup {time.perf_counter() - t0:.0f}s")

    graph_b, state_b = build_batch(64, 32, 2, 4)
    fb = graph_b.nonlinear[0]
    nodes, weights = fb.nodes[0], fb.weights[0]
    leaves = tuple(jax.tree.leaves(fb.params))
    lanes_cost = fb.lanes_cost
    cost_fn = fb.cost_fn
    struct = jax.tree.structure(fb.params)

    diag, off = state_b.precision.diag, state_b.precision.off

    # line-search-shaped batch: B * 11 trials
    def rep11(x):
        return jnp.concatenate([x] * 11, axis=0)

    d11, o11 = rep11(diag), rep11(off)
    mu11 = rep11(state_b.mu)
    leaves11 = tuple(rep11(p) for p in leaves)

    # chain covariance at the trial batch
    cd11, co11, _ = jax.jit(gbp_covariance_logdet_lanes)(d11, o11)
    cd11, co11 = jax.device_put(cd11), jax.device_put(co11)

    scan_time(
        lambda eps, d, o: gbp_covariance_logdet_lanes(d + eps, o)[2],
        d11, o11, label="chain cov+logdet B=704 (lanes)")

    scan_time(
        lambda eps, m_, c_, *ps: quad_lanes(
            m_ + eps, c_, nodes, weights, lanes_cost, ps),
        mu11, cd11, *leaves11, label="quad E[phi] B=704 (lanes kernel)")

    def xla_phi(eps, m_, c_, *ps):
        params = jax.tree.unflatten(struct, list(ps))
        return jax.vmap(
            lambda mk, ck, pk: mm.expectation_phi(
                nodes, weights, mk, ck, cost_fn, pk)
        )(m_ + eps, c_, params)

    scan_time(xla_phi, mu11, cd11, *leaves11,
              label="quad E[phi] B=704 (fused XLA)")

    # gradient-shaped batch: B=64 with moments
    cd, co, _ = jax.jit(gbp_covariance_logdet_lanes)(diag, off)
    scan_time(
        lambda eps, m_, c_, *ps: quad_lanes(
            m_ + eps, c_, nodes, weights, lanes_cost, ps, True),
        state_b.mu, cd, *leaves, label="quad moments B=64 (lanes kernel)")

    def xla_moments(eps, m_, c_, *ps):
        params = jax.tree.unflatten(struct, list(ps))
        return jax.vmap(
            lambda mk, ck, pk: mm.gh_moments(
                nodes, weights, mk, ck, cost_fn, pk)
        )(m_ + eps, c_, params)

    scan_time(xla_moments, state_b.mu, cd, *leaves,
              label="quad moments B=64 (fused XLA)")

    # full iteration under each quad impl
    from gaussianvi_tpu.inference.optimize import optimize

    for quad in ("xla", "lanes"):
        config = GVIConfig(niters=1, niters_lowtemp=10, step_size_base=0.9,
                           chain_impl="lanes", quad_impl=quad)

        def one_iter(eps, g, st, c=config):
            stepped = type(st)(st.mu + eps, st.precision)
            return jax.vmap(
                lambda gi, si: optimize(gi, si, c)[0].mu
            )(g, stepped)

        scan_time(one_iter, graph_b, state_b,
                  reps=30, label=f"full iteration B=64 (quad={quad})")


if __name__ == "__main__":
    main()
