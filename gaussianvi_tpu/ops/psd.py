"""Symmetric PSD matrix functions via eigendecomposition.

The reference computes covariance square roots with
``SelfAdjointEigenSolver::operatorSqrt`` (quadrature/SparseGaussHermite.h:231)
and the proximal step's matrix square root with a real Schur decomposition
(proxgd/ProxGVIFactorizedBaseGH.h:217-248).  On TPU every matrix involved is
symmetric PSD (covariances, or similar to one), so a clamped ``eigh`` sqrt is
both simpler and SPD-safe — this is the "eigh-clamped sqrt" design note of
SURVEY.md section 7.
"""

from __future__ import annotations

import jax.numpy as jnp
from .precision import einsum


def psd_sqrtm(mat: jnp.ndarray, clamp: float = 0.0) -> jnp.ndarray:
    """Symmetric square root of a symmetric PSD matrix (batched ok)."""
    w, v = jnp.linalg.eigh(mat)
    w = jnp.maximum(w, clamp)
    return einsum("...ij,...j,...kj->...ik", v, jnp.sqrt(w), v)


def psd_inv_sqrtm(mat: jnp.ndarray, eps: float = 1e-30) -> jnp.ndarray:
    w, v = jnp.linalg.eigh(mat)
    w = jnp.maximum(w, eps)
    return einsum("...ij,...j,...kj->...ik", v, 1.0 / jnp.sqrt(w), v)


def sqrtm_product(a: jnp.ndarray, s: float | jnp.ndarray) -> jnp.ndarray:
    """sqrtm(A (A + 4 s I)) for symmetric PSD ``A`` — the JKO-step root.

    A and A + 4sI commute, so the root is ``V sqrt(w (w + 4 s)) V^T`` in A's
    eigenbasis; replaces the reference's general Schur sqrtm of the product
    (proxgd/ProxGVIFactorizedBaseGH.h:95-99, 217-248).
    """
    w, v = jnp.linalg.eigh(a)
    vals = jnp.sqrt(jnp.maximum(w * (w + 4.0 * s), 0.0))
    return einsum("...ij,...j,...kj->...ik", v, vals, v)
