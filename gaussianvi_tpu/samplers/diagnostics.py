"""MCMC convergence diagnostics: split-R-hat and effective sample size.

Standard Gelman et al. (BDA3 / Vehtari et al. 2021 rank-normalized variants
omitted — plain split-R-hat and autocorrelation ESS suffice for the
posterior-validation harness).  Pure JAX/NumPy, vmapped over dimensions.
"""

from __future__ import annotations

import numpy as np


def split_rhat(samples: np.ndarray) -> np.ndarray:
    """Split-R-hat per dimension.  samples [C, T, D] (chains, draws, dims)."""
    samples = np.asarray(samples)
    c, t, d = samples.shape
    half = t // 2
    chains = np.concatenate(
        [samples[:, :half], samples[:, half:2 * half]], axis=0
    )  # [2C, half, D]
    m, n = chains.shape[0], chains.shape[1]
    chain_means = chains.mean(axis=1)              # [2C, D]
    chain_vars = chains.var(axis=1, ddof=1)        # [2C, D]
    between = n * chain_means.var(axis=0, ddof=1)  # [D]
    within = chain_vars.mean(axis=0)               # [D]
    var_est = (n - 1) / n * within + between / n
    return np.sqrt(var_est / np.maximum(within, 1e-300))


def ess(samples: np.ndarray, max_lag: int | None = None) -> np.ndarray:
    """Autocorrelation-based effective sample size per dimension.

    samples [C, T, D]; Geyer initial-positive-sequence truncation.
    """
    samples = np.asarray(samples)
    c, t, d = samples.shape
    max_lag = max_lag or min(t - 1, 1000)
    centered = samples - samples.mean(axis=1, keepdims=True)
    out = np.empty(d)
    for j in range(d):
        # average autocorrelation over chains via FFT
        acov = np.zeros(max_lag + 1)
        for ch in range(c):
            x = centered[ch, :, j]
            f = np.fft.rfft(x, n=2 * t)
            ac = np.fft.irfft(f * np.conj(f))[: max_lag + 1]
            acov += ac / t
        acov /= c
        rho = acov / max(acov[0], 1e-300)
        # Geyer: sum consecutive pairs while positive
        tau = 1.0
        k = 1
        while k + 1 <= max_lag:
            pair = rho[k] + rho[k + 1]
            if pair < 0:
                break
            tau += 2.0 * pair
            k += 2
        out[j] = c * t / max(tau, 1e-300)
    return out


def summarize(samples: np.ndarray) -> dict:
    """Convenience: {'rhat': [D], 'ess': [D], 'mean': [D], 'std': [D]}."""
    samples = np.asarray(samples)
    flat = samples.reshape(-1, samples.shape[-1])
    return {
        "rhat": split_rhat(samples),
        "ess": ess(samples),
        "mean": flat.mean(axis=0),
        "std": flat.std(axis=0, ddof=1),
    }
