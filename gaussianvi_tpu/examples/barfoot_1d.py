"""The 1-D nonlinear estimation example of Barfoot et al. (IJRR'20).

Reference src/1d_example.cpp:25-83 and src/1d_example_proxGVI.cpp: a single
scalar nonlinear factor

    psi(x) = (x - mu_p)^2 / (2 sig_p^2) + (y - f b / x)^2 / (2 sig_r^2)

with mu_p = 20, f = 400, b = 0.1, sig_p^2 = 9, sig_r^2 = 0.09,
y = f b / mu_p - 0.8; GH degree 10; q0 = N(20, 9); 10 iterations with step
base 0.75 and no temperature switch.  The converged trajectories are the
golden data committed at reference data/1d/*.csv and data/1d_proxgvi/*.csv.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..factors import make_nonlinear_batch
from ..inference import FactorGraph, GaussianState, GVIConfig, optimize
from ..ops import BlockTridiag


def barfoot_cost(x, params):
    del params
    xx = x[0]
    mu_p, f, b = 20.0, 400.0, 0.1
    sig_r_sq, sig_p_sq = 0.09, 9.0
    y = f * b / mu_p - 0.8
    return (
        (xx - mu_p) ** 2 / sig_p_sq / 2
        + (y - f * b / xx) ** 2 / sig_r_sq / 2
    )


def build_barfoot_1d(gh_degree: int = 10, dtype=None):
    fb = make_nonlinear_batch(
        barfoot_cost, [0], state_dim=1, nb=1, gh_degree=gh_degree,
        nonneg_cost=True, dtype=dtype,
    )
    graph = FactorGraph(num_states=1, state_dim=1, nonlinear=(fb,))
    init = GaussianState(
        jnp.asarray([[20.0]], fb.nodes.dtype),
        BlockTridiag(
            jnp.asarray([[[1.0 / 9.0]]], fb.nodes.dtype),
            jnp.zeros((0, 1, 1), fb.nodes.dtype),
        ),
    )
    config = GVIConfig(niters=10, niters_lowtemp=10, step_size_base=0.75)
    return graph, init, config


def run_barfoot_1d(method: str = "ngd", gh_degree: int = 10, dtype=None):
    graph, init, config = build_barfoot_1d(gh_degree, dtype)
    return optimize(graph, init, config, method=method)
