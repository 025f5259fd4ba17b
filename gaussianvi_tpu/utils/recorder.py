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


def history_to_arrays(history: GVIHistory) -> dict[str, np.ndarray]:
    """Flatten a GVIHistory into the reference's recorder matrices:
    each entry has iterations as columns."""
    mu = np.asarray(history.mu)              # [T, N, s]
    cov_d = np.asarray(history.cov_diag)     # [T, N, s, s]
    cov_o = np.asarray(history.cov_off)      # [T, N-1, s, s]
    t = mu.shape[0]
    out = {
        "mean": mu.reshape(t, -1).T,
        "cov": cov_d.reshape(t, -1).T,
        "cov_off": cov_o.reshape(t, -1).T if cov_o.size else np.zeros((0, t)),
        "cost": np.asarray(history.cost).reshape(1, t),
        "factor_costs": np.asarray(history.factor_costs).T,
        "accepted_step": np.asarray(history.accepted_step).reshape(1, t),
    }
    return out


def save_history_csv(history: GVIHistory, prefix: str) -> list[str]:
    """Write the history CSVs under ``prefix`` (mean.csv, cov.csv, cost.csv,
    factor_costs.csv, ...), mirroring DataRecorder.h:177-224."""
    os.makedirs(prefix, exist_ok=True)
    paths = []
    for name, arr in history_to_arrays(history).items():
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
