"""Batch state estimation with a linear time-varying (LTV) GP prior.

The reference's LTV configuration (gp/LTV_prior.h + gp/factorized_opts_LTV.h
+ cost_functions_LTV.h): the prior between consecutive states comes from a
time-varying linear system x' = A(t) x + B(t) u, with the transition matrix
and controllability Gramian integrated per segment, and the nominal
trajectory entering through Psi = [Phi, -I].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..factors import make_nonlinear_batch
from ..factors.priors import fixed_prior, ltv_prior
from ..inference import FactorGraph, GaussianState, GVIConfig, optimize
from ..ops import BlockTridiag
from .chain_estimation import range_cost


def pendulum_ltv_system(num_states: int, dt: float, theta_nom: np.ndarray):
    """Piecewise-constant LTV linearization of a damped pendulum
    x = [theta, theta_dot]: A(t) = [[0, 1], [-cos(theta_nom(t)), -0.2]],
    B = [[0], [1]] — 5 sub-intervals per segment (reference layout
    gp/LTV_prior.h:54-59: index 4*i + j)."""
    a_list, b_list = [], []
    for i in range(num_states - 1):
        for j in range(5):
            t = (i + j / 4.0) * dt
            idx = min(int(np.floor(t / dt)), num_states - 1)
            a = np.array([[0.0, 1.0], [-np.cos(theta_nom[idx]), -0.2]])
            b = np.array([[0.0], [1.0]])
            a_list.append(a)
            b_list.append(b)
    return a_list, b_list


def build_ltv_estimation(
    num_states: int = 10,
    dt: float = 0.2,
    gh_degree: int = 4,
    seed: int = 0,
    dtype=None,
):
    dtype = dtype or jnp.zeros(0).dtype
    state_dim = 2
    rng = np.random.default_rng(seed)

    theta_nom = 0.5 + 0.1 * np.arange(num_states) * dt
    target_means = [
        np.array([theta_nom[i], 0.1]) for i in range(num_states)
    ]
    a_list, b_list = pendulum_ltv_system(num_states, dt, theta_nom)
    gp = ltv_prior(
        a_list, b_list, target_means, dt, num_states, dtype=dtype
    )
    anchor = fixed_prior(
        0, target_means[0], 0.05 * np.eye(state_dim), dtype=dtype
    )
    # noisy angle measurements as nonlinear range-to-beacon costs
    ranges = np.abs(theta_nom + 1.0) + 0.05 * rng.standard_normal(num_states)
    meas = make_nonlinear_batch(
        range_cost,
        np.arange(num_states),
        state_dim=state_dim,
        params={
            "r": jnp.asarray(ranges, dtype),
            "beacon": jnp.full((num_states, 1), -1.0, dtype),
            "sig_r_sq": jnp.full(num_states, 0.05**2, dtype),
        },
        gh_degree=gh_degree,
        nonneg_cost=True,   # squared residual: E[phi] >= 0 by construction
        dtype=dtype,
    )
    graph = FactorGraph(
        num_states=num_states, state_dim=state_dim,
        nonlinear=(meas,), linear=(anchor, gp),
    )
    init_mu = np.stack(target_means)
    init = GaussianState(
        jnp.asarray(init_mu, dtype),
        BlockTridiag.identity(num_states, state_dim, 5.0, dtype),
    )
    config = GVIConfig(niters=15, niters_lowtemp=15, step_size_base=0.9)
    return graph, init, config


def run_ltv_estimation(method: str = "ngd", **kwargs):
    graph, init, config = build_ltv_estimation(**kwargs)
    return optimize(graph, init, config, method=method)
