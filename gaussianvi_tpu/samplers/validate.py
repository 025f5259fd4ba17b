"""Posterior-validation harness: GVI moments vs sampler moments.

The north-star check (BASELINE.json): the variational posterior's mean and
covariance should match the true posterior (as estimated by HMC/NUTS) within
Monte-Carlo + quadrature error on the example models.  Note that GVI is a
KL-projection: on non-Gaussian targets the match is approximate by design;
on linear-Gaussian graphs it must be exact.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..inference.graph import FactorGraph, GaussianState
from ..ops.blocktridiag import gbp_covariance
from .hmc import hmc
from .nuts import nuts
from .target import make_log_density
from ..ops.precision import matmul


class ValidationReport(NamedTuple):
    gvi_mean: np.ndarray
    sampler_mean: np.ndarray
    gvi_cov_diag: np.ndarray
    sampler_cov_diag: np.ndarray
    mean_abs_err: float
    cov_rel_err: float


def sampler_moments(samples: jnp.ndarray):
    """samples [T, D] -> (mean [D], cov [D, D])."""
    mean = jnp.mean(samples, axis=0)
    centered = samples - mean
    cov = matmul(centered.T, centered) / (samples.shape[0] - 1)
    return mean, cov


def validate_posterior(
    graph: FactorGraph,
    gvi_state: GaussianState,
    key,
    sampler: str = "hmc",
    num_samples: int = 4000,
    num_warmup: int = 1000,
    **kwargs,
) -> ValidationReport:
    """Run a sampler on the graph's true posterior, compare moments with the
    converged GVI state."""
    n, s = gvi_state.mu.shape
    log_density = make_log_density(graph, n, s)
    init = gvi_state.mu.reshape(-1)
    if sampler == "hmc":
        result = hmc(
            log_density, init, key,
            num_samples=num_samples, num_warmup=num_warmup, **kwargs,
        )
        samples = result.samples
    elif sampler == "nuts":
        result = nuts(
            log_density, init, key,
            num_samples=num_samples, num_warmup=num_warmup, **kwargs,
        )
        samples = result.samples
    else:
        raise ValueError(f"unknown sampler {sampler!r}")

    smean, scov = sampler_moments(samples)
    cov_diag, _ = gbp_covariance(gvi_state.precision)
    gvi_mean = np.asarray(gvi_state.mu.reshape(-1))
    gvi_var = np.asarray(
        jax.vmap(jnp.diag)(cov_diag)
    ).reshape(-1)
    s_var = np.asarray(jnp.diag(scov))
    return ValidationReport(
        gvi_mean=gvi_mean,
        sampler_mean=np.asarray(smean),
        gvi_cov_diag=gvi_var,
        sampler_cov_diag=s_var,
        mean_abs_err=float(np.abs(gvi_mean - np.asarray(smean)).max()),
        cov_rel_err=float(
            np.abs(gvi_var - s_var).max() / max(s_var.max(), 1e-12)
        ),
    )
