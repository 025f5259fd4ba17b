"""Result recording and CSV export (the reference's VIMPResults).

The reference collects per-iteration (mean, marginal+joint covariances and
precisions, total & per-factor cost) and writes 9 CSVs at the end of a run
(helpers/DataRecorder.h:96-224, iterations as columns).  Here the history is
already produced on device by :func:`gaussianvi_tpu.inference.optimize` as a
``GVIHistory``; this module converts it to the same column-per-iteration CSV
layout for drop-in use with the reference's plotting notebooks.
"""

from __future__ import annotations

import os

import numpy as np

from ..inference.optimize import GVIHistory


def _dense_joint(diag: np.ndarray, off: np.ndarray) -> np.ndarray:
    """[T, N, s, s] + [T, N-1, s, s] blocks -> dense [T, N*s, N*s]."""
    t, n, s, _ = diag.shape
    out = np.zeros((t, n * s, n * s), diag.dtype)
    for i in range(n):
        out[:, i * s:(i + 1) * s, i * s:(i + 1) * s] = diag[:, i]
    for i in range(n - 1):
        out[:, i * s:(i + 1) * s, (i + 1) * s:(i + 2) * s] = off[:, i]
        out[:, (i + 1) * s:(i + 2) * s, i * s:(i + 1) * s] = np.swapaxes(
            off[:, i], -1, -2
        )
    return out


def history_to_arrays(
    history: GVIHistory, full_joint: bool | None = None
) -> dict[str, np.ndarray]:
    """Flatten a GVIHistory into the reference recorder's matrices
    (DataRecorder.h:96-224), each with iterations as columns:

    mean, cov (marginal covariance blocks), precision (marginal precision
    blocks), joint_cov, joint_precision, cost, factor_costs, zk_sdf
    (final-iteration means [s, N]), Sk_sdf (final marginal covariances
    [s*s, N]) — plus the extra cov_off / prec_off chain blocks and the
    accepted step sizes the reference doesn't record.

    ``full_joint``: materialize the dense joint covariance/precision
    (the reference always does; defaults to True for joint dim <= 512,
    else skipped — the block entries already carry the exact marginals).
    """
    mu = np.asarray(history.mu)              # [T, N, s]
    cov_d = np.asarray(history.cov_diag)     # [T, N, s, s]
    cov_o = np.asarray(history.cov_off)      # [T, N-1, s, s]
    prec_d = np.asarray(history.prec_diag)
    prec_o = np.asarray(history.prec_off)
    t, n, s = mu.shape
    out = {
        "mean": mu.reshape(t, -1).T,
        "cov": cov_d.reshape(t, -1).T,
        "precision": prec_d.reshape(t, -1).T,
        "cov_off": cov_o.reshape(t, -1).T if cov_o.size else np.zeros((0, t)),
        "prec_off": (
            prec_o.reshape(t, -1).T if prec_o.size else np.zeros((0, t))
        ),
        "cost": np.asarray(history.cost).reshape(1, t),
        "factor_costs": np.asarray(history.factor_costs).T,
        "accepted_step": np.asarray(history.accepted_step).reshape(1, t),
        # final-iteration dumps (zk_sdf/Sk_sdf, DataRecorder.h:200-218):
        # states as columns
        "zk_sdf": mu[-1].T,
        "Sk_sdf": cov_d[-1].reshape(n, s * s).T,
    }
    if full_joint is None:
        full_joint = n * s <= 512
    if full_joint:
        jp = _dense_joint(prec_d, prec_o)
        # the exact joint covariance is the full inverse of the joint
        # precision (the block-tridiag history rows carry only the
        # tridiagonal part of it)
        jc = np.linalg.inv(jp)
        out["joint_precision"] = jp.reshape(t, -1).T
        out["joint_cov"] = jc.reshape(t, -1).T
    return out


def save_history_csv(
    history: GVIHistory, prefix: str, full_joint: bool | None = None
) -> list[str]:
    """Write the reference's CSV set under ``prefix`` (mean.csv, cov.csv,
    precision.csv, joint_cov.csv, joint_precision.csv, cost.csv,
    factor_costs.csv, zk_sdf.csv, Sk_sdf.csv — DataRecorder.h:177-224 —
    plus cov_off/prec_off/accepted_step extras)."""
    os.makedirs(prefix, exist_ok=True)
    paths = []
    for name, arr in history_to_arrays(history, full_joint).items():
        path = os.path.join(prefix, f"{name}.csv")
        np.savetxt(path, arr, delimiter=", ", fmt="%.12g")
        paths.append(path)
    return paths


def save_factor_expectations(graph, state, prefix: str) -> list[str]:
    """Final-state per-factor expectation dump (the reference's
    zk_sdf/Sk_sdf CSVs, DataRecorder.h:120-224): E[phi], E[(x-mu)phi],
    E[(x-mu)(x-mu)^T phi] for every nonlinear factor batch."""
    from ..inference.introspect import factor_expectations

    os.makedirs(prefix, exist_ok=True)
    paths = []
    for i, exp in enumerate(factor_expectations(graph, state)):
        for key, arr in exp.items():
            path = os.path.join(prefix, f"factor{i}_{key}.csv")
            a = np.asarray(arr)
            np.savetxt(path, a.reshape(a.shape[0], -1),
                       delimiter=", ", fmt="%.12g")
            paths.append(path)
    return paths


def cost_map_1d(
    graph,
    config=None,
    x_start: float = 18.0,
    x_end: float = 25.0,
    y_start: float = 0.05,
    y_end: float = 1.0,
    nmesh: int = 40,
):
    """1-D cost landscape over (mean, precision) — the reference's
    ``cost_map`` heat map (gvibase/GVI-GH.h:385-412), vectorized: one jitted
    batched evaluation instead of an nmesh^2 host loop."""
    import jax
    import jax.numpy as jnp

    from ..inference.gvi import joint_cost
    from ..ops.blocktridiag import BlockTridiag

    res_x = (x_end - x_start) / nmesh
    res_y = (y_end - y_start) / nmesh
    xs = x_start + jnp.arange(nmesh) * res_x
    ys = y_start + jnp.arange(nmesh) * res_y

    def cost_at(x, y):
        mu = jnp.asarray([[x]])
        prec = BlockTridiag(
            jnp.asarray([[[y]]]), jnp.zeros((0, 1, 1), mu.dtype)
        )
        return joint_cost(graph, mu, prec, 1.0)

    grid = jax.jit(
        jax.vmap(jax.vmap(cost_at, in_axes=(None, 0)), in_axes=(0, None))
    )(xs, ys)
    # reference stores Z(j, i) = cost(x_i, y_j)
    return np.asarray(grid).T


def save_costmap(graph, filename: str, **kwargs) -> str:
    z = cost_map_1d(graph, **kwargs)
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    np.savetxt(filename, z, delimiter=", ", fmt="%.12g")
    return filename
