"""Pinned-precision contractions for the framework's small-block algebra.

On TPU, XLA lowers f32 ``einsum``/``@`` to MXU passes at DEFAULT matmul
precision — a single bf16 pass (~8 mantissa bits per product).  For this
framework that is pure accuracy loss with no meaningful speed win: every
contraction here is tiny-block algebra (d, s <= 8 states; M <= a few hundred
sigma points), nowhere near MXU-bound.  Measured on a v5e against a float64
host oracle at the bench operating point (see PERF.md):

    moments path, DEFAULT precision : rel err 4.1e-05 / 2.2e-03 / 2.1e-02
                                      on (E[phi], E[(x-mu)phi], E[xx^T phi])
    moments path, HIGHEST precision : 3.3e-06 / 5.6e-06 / 1.3e-06
    Pallas fused kernel (f32 VPU)   : 1.7e-06 / 5.6e-06 / 1.4e-06

Two digits lost silently on the Hessian moment is exactly the kind of
backend-dependent divergence the golden-trajectory guarantees (1e-9 vs the
reference CSVs) cannot tolerate, so every accuracy-bearing contraction in
the package routes through these wrappers.  On CPU the kwarg is a no-op.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_PRECISION = lax.Precision.HIGHEST


def set_contraction_precision(p) -> None:
    """Override the package-wide contraction precision (A/B experiments;
    accepts a ``lax.Precision`` or its string name).  Takes effect at the
    next trace — already-jitted callables keep what they captured."""
    global _PRECISION
    _PRECISION = lax.Precision(p) if isinstance(p, str) else p


def get_contraction_precision():
    return _PRECISION


def einsum(*args, **kwargs):
    """jnp.einsum with full-f32 MXU accumulation (6-pass for f32 operands)."""
    return jnp.einsum(*args, precision=_PRECISION, **kwargs)


def matmul(a, b):
    """Drop-in for the @ operator on block matrices."""
    return jnp.matmul(a, b, precision=_PRECISION)
