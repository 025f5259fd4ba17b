"""Take the flagship B-sweep to the throughput knee (VERDICT r4 item 4).

Round 4 measured 648.8k / 697.3k / 767.6k prob-iters/s at B = 1024 /
2048 / 4096 — still RISING at 4096 (PERF.md section 28).  This script
extends the sweep until throughput flattens (<3% gain per doubling) and
prints the knee + peak.

    python scripts/r5_bsweep.py [--bs 1024 2048 4096 8192 16384]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def _sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, nargs="*",
                    default=[1024, 2048, 4096, 8192, 16384])
    ap.add_argument("--niters", type=int, default=10)
    args = ap.parse_args()

    from bench import bench_device, build_batch  # noqa: F401

    print("platform:", jax.devices()[0].platform, flush=True)
    t0 = time.perf_counter()
    _sync(jax.jit(lambda x: (x @ x).sum())(jnp.eye(128)))
    print(f"warmup {time.perf_counter() - t0:.0f}s", flush=True)

    device = jax.devices()[0]
    rates = {}
    for b in args.bs:
        t0 = time.perf_counter()
        # shrink the pipeline as B grows (per-call work scales with B)
        pipeline = max(2, 6 * 1024 // b)
        rates[b] = bench_device(
            device, num_problems=b, niters=args.niters, pipeline=pipeline
        )
        print(f"B={b:6d}: {rates[b]:10.0f} prob-iters/s "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)

    bs = sorted(rates)
    knee = bs[-1]
    for lo, hi in zip(bs, bs[1:]):
        if rates[hi] < rates[lo] * 1.03:
            knee = lo
            break
    peak_b = max(rates, key=rates.get)
    print(f"knee at B={knee}; peak {rates[peak_b]:.0f} prob-iters/s "
          f"at B={peak_b}", flush=True)


if __name__ == "__main__":
    main()
