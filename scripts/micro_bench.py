"""Micro-benchmarks: chain-kernel and quadrature backend comparison.

Equivalent of the reference's google-benchmark suites
(src_MKL/benchmark_MKL.cpp, benchmark_gh_mkl.cpp: Eigen-vs-MKL kernels and
sparse-GH backends) — here the axes are scan vs associative-scan vs lanes
chain kernels, and XLA vs Pallas fused moments.

    python scripts/micro_bench.py [B] [N] [s]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def timeit(fn, *args, repeats=5):
    _sync(fn(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main(b=256, n=32, s=4):
    from gaussianvi_tpu.kernels.chain_lanes import (
        gbp_covariance_logdet_lanes,
        solve_lanes,
    )
    from gaussianvi_tpu.ops.blocktridiag import (
        BlockTridiag,
        gbp_covariance_logdet,
        solve,
    )
    from gaussianvi_tpu.ops.parallel_chain import (
        gbp_covariance_logdet_assoc,
        solve_assoc,
    )

    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = np.float32 if on_tpu else np.float64
    rng = np.random.default_rng(0)
    diag = rng.standard_normal((b, n, s, s)).astype(dtype)
    diag = diag @ diag.transpose(0, 1, 3, 2) + 3 * s * np.eye(s, dtype=dtype)
    off = (0.5 * rng.standard_normal((b, n - 1, s, s))).astype(dtype)
    rhs = rng.standard_normal((b, n, s)).astype(dtype)
    dj, oj, rj = jnp.asarray(diag), jnp.asarray(off), jnp.asarray(rhs)

    if on_tpu:  # session warmup (see bench.py)
        _sync(jax.jit(lambda x: (x @ x).sum())(jnp.eye(128)))

    scan_cov = jax.jit(
        jax.vmap(lambda d, o: gbp_covariance_logdet(BlockTridiag(d, o)))
    )
    assoc_cov = jax.jit(
        jax.vmap(lambda d, o: gbp_covariance_logdet_assoc(BlockTridiag(d, o)))
    )
    print(f"B={b} N={n} s={s} on {jax.devices()[0].platform}")
    print(f"gbp+logdet scan : {timeit(scan_cov, dj, oj):8.2f} ms")
    print(f"gbp+logdet assoc: {timeit(assoc_cov, dj, oj):8.2f} ms")
    if on_tpu:
        lanes_cov = jax.jit(gbp_covariance_logdet_lanes)
        print(f"gbp+logdet lanes: {timeit(lanes_cov, dj, oj):8.2f} ms")

    scan_solve = jax.jit(
        jax.vmap(lambda d, o, r: solve(BlockTridiag(d, o), r.reshape(-1)))
    )
    assoc_solve = jax.jit(
        jax.vmap(
            lambda d, o, r: solve_assoc(BlockTridiag(d, o), r.reshape(-1))
        )
    )
    print(f"solve scan      : {timeit(scan_solve, dj, oj, rj):8.2f} ms")
    print(f"solve assoc     : {timeit(assoc_solve, dj, oj, rj):8.2f} ms")
    if on_tpu:
        lanes_solve = jax.jit(solve_lanes)
        print(f"solve lanes     : {timeit(lanes_solve, dj, oj, rj):8.2f} ms")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:4]))
