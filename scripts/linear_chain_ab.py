"""Same-process A/B: blockwise vs assembled-marginal edge-factor costs in
the full NGD iteration (engine._LINEAR_CHAIN_COSTS hook)."""

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
    from gaussianvi_tpu.inference import GVIConfig, engine
    from gaussianvi_tpu.inference.optimize import optimize

    log(f"# linear_chain_ab  time={time.strftime('%F %T')}")
    t0 = time.perf_counter()
    _sync(jax.jit(lambda x: (x @ x).sum())(jnp.eye(128)))
    log(f"warmup {time.perf_counter() - t0:.0f}s")

    graph_b, state_b = build_batch(64, 32, 2, 4)
    config = GVIConfig(niters=1, niters_lowtemp=10, step_size_base=0.9,
                       chain_impl="lanes")

    for flag in (False, True, False, True):
        engine._LINEAR_CHAIN_COSTS = flag
        # optimize() is internally jitted with the same static config either
        # way — drop the trace cache so the flag actually takes effect
        jax.clear_caches()

        def one_iter(eps, g, st, c=config):
            stepped = type(st)(st.mu + eps, st.precision)
            return jax.vmap(
                lambda gi, si: optimize(gi, si, c)[0].mu
            )(g, stepped)

        scan_time(one_iter, graph_b, state_b, reps=30,
                  label=f"full iteration B=64 (chain_costs={flag})")


if __name__ == "__main__":
    main()
