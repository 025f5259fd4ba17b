"""Introspection accessors: per-factor expectations at the current state.

Equivalent of the reference's E_Phis / E_xMuPhis / E_xMuxMuTPhis accessors
(gvibase/GVI-GH.h:348-378), computed in one batched pass per factor type.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..factors import moments as mm
from ..ops.blocktridiag import gbp_covariance
from .graph import FactorGraph, GaussianState, gather_marginals


def factor_expectations(
    graph: FactorGraph, state: GaussianState
) -> list[dict[str, jnp.ndarray]]:
    """Per nonlinear factor batch: {'e_phi' [K], 'e_xmu_phi' [K,d],
    'e_xmumu_phi' [K,d,d]} at the current marginals."""
    cov_diag, cov_off = gbp_covariance(state.precision)
    out = []
    for fb in graph.nonlinear:
        mu_k, cov_k = gather_marginals(
            fb.start, fb.nb, state.mu, cov_diag, cov_off
        )
        e_phi, e_xmu, e_xxt = mm.gh_moments(
            fb.nodes, fb.weights, mu_k, cov_k, fb.cost_fn, fb.params,
            rdim=fb.quad_rdim,
        )
        out.append(
            {"e_phi": e_phi, "e_xmu_phi": e_xmu, "e_xmumu_phi": e_xxt}
        )
    return out


def marginals(graph: FactorGraph, state: GaussianState):
    """All per-state marginal (mean [N,s], covariance [N,s,s])."""
    cov_diag, _ = gbp_covariance(state.precision)
    return state.mu, cov_diag
