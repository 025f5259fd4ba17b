from .base import (
    LinearFactorBatch,
    NonlinearFactorBatch,
    make_nonlinear_batch,
)
from .moments import (
    bw_local_gradients,
    expectation_phi,
    gh_moments,
    linear_cost,
    linear_local_gradients,
    ngd_local_gradients,
    sigma_points,
)

__all__ = [
    "LinearFactorBatch", "NonlinearFactorBatch", "make_nonlinear_batch",
    "gh_moments", "expectation_phi", "sigma_points",
    "ngd_local_gradients", "bw_local_gradients",
    "linear_local_gradients", "linear_cost",
]
