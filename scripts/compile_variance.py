"""Measure run-to-run variance across REPEATED COMPILES of the same program.

Same function, same shapes, same precision — five separate jit objects
(each compiled via the remote helper), each measured interleaved.  If the
executables differ in speed, the 84k-vs-55k bimodality is compile
nondeterminism, not machine state.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def _sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


from bench import build_batch
from gaussianvi_tpu.inference import GVIConfig
from gaussianvi_tpu.inference.optimize import optimize

t0 = time.perf_counter()
_sync(jax.jit(lambda x: (x @ x).sum())(jnp.eye(128)))
print(f"warmup {time.perf_counter() - t0:.0f}s", flush=True)

config = GVIConfig(niters=10, niters_lowtemp=10, step_size_base=0.9,
                   chain_impl="lanes")
graph_b, state_b = build_batch(64, 32, 2, 4)

runs = []
for i in range(5):
    # a distinct lambda per jit defeats any tracing/executable cache keyed
    # on the function object
    run = jax.jit(jax.vmap(
        lambda g, s, _i=i: optimize(g, s, config, method="ngd")[0]
    ))
    t0 = time.perf_counter()
    _sync(run(graph_b, state_b))
    print(f"compile {i}: {time.perf_counter() - t0:.1f}s", flush=True)
    runs.append(run)

best = [float("inf")] * 5
for _ in range(3):
    for i, run in enumerate(runs):
        t0 = time.perf_counter()
        outs = [run(graph_b, state_b) for _ in range(24)]
        _sync(outs[-1])
        best[i] = min(best[i], (time.perf_counter() - t0) / 24)
for i, dt in enumerate(best):
    print(f"executable {i}: {640 / dt:10.1f} prob-iters/s ({dt*1e3:.2f} ms/call)",
          flush=True)
