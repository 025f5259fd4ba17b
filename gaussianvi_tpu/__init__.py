"""gaussianvi_tpu — TPU-native Gaussian Variational Inference over factor graphs.

A JAX/XLA/Pallas re-design of the capabilities of hzyu17/GaussianVI:
Gaussian VI ``q = N(mu, Lambda^{-1})`` with block-tridiagonal precision,
natural-gradient and Wasserstein-proximal optimizers, sparse Gauss-Hermite
quadrature for per-factor expectations, and Gaussian belief propagation for
marginal covariances — everything batched over factors and jitted on device.
"""

__version__ = "0.1.0"
