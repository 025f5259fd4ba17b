"""Kernel-level device trace of the NGD iteration (jax.profiler works
through the sandbox tunnel — this replaced the 'can we even trace?'
ROADMAP item).

Captures a profiler trace of the full 10-iteration optimize at the bench
operating point, then prints the per-iteration device-op breakdown
aggregated by HLO op category (fusions vs copies vs Pallas custom calls).
Appends to PERF_RAW.log.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from scripts.perf_characterize import log, _sync


def capture(run, args, out_dir, ncalls=3):
    with jax.profiler.trace(out_dir):
        for _ in range(ncalls):
            r = run(*args)
        _sync(r)
    (path,) = glob.glob(out_dir + "/**/*.trace.json.gz", recursive=True)
    with gzip.open(path) as f:
        return json.load(f)["traceEvents"]


def breakdown(events, niters):
    """Aggregate device-op durations by base op name, per iteration."""
    procs = {e["pid"]: e["args"].get("name") for e in events
             if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in procs.items() if n and "TPU" in n}
    agg = collections.defaultdict(float)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            base = re.sub(r"[.\d]+$", "", e["name"])
            agg[base] += e.get("dur", 0)
    return agg


def main():
    from bench import build_batch
    from gaussianvi_tpu.inference import GVIConfig
    from gaussianvi_tpu.inference.optimize import optimize

    log(f"# trace_breakdown  time={time.strftime('%F %T')}")
    t0 = time.perf_counter()
    _sync(jax.jit(lambda x: (x @ x).sum())(jnp.eye(128)))
    log(f"warmup {time.perf_counter() - t0:.0f}s")

    b = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    fused = sys.argv[2] if len(sys.argv) > 2 else "auto"
    log(f"B={b} fused_trials={fused}")
    graph_b, state_b = build_batch(b, 32, 2, 4)
    config = GVIConfig(niters=10, niters_lowtemp=10, step_size_base=0.9,
                       chain_impl="lanes", fused_trials=fused)
    run = jax.jit(jax.vmap(lambda g, s: optimize(g, s, config)[0]))
    _sync(run(graph_b, state_b))

    ncalls = 3
    niters = ncalls * config.niters
    with tempfile.TemporaryDirectory() as td:
        agg = breakdown(capture(run, (graph_b, state_b), td, ncalls), niters)

    # wrappers whose duration spans their children (double counts):
    # the jit entry computation and the per-iteration while body
    for k in [k for k in agg if k.startswith("jit_")]:
        agg.pop(k)
    whole = agg.pop("while", 0.0) / niters
    log(f"device while-body (one NGD iteration): {whole:.1f} us")
    total = sum(agg.values())
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:12]:
        log(f"  {v / niters:8.1f} us/iter  {v / total * 100:5.1f}%  {k}")


if __name__ == "__main__":
    main()
