from .blocktridiag import (
    BlockTridiag,
    block_cholesky,
    gbp_covariance,
    logdet,
    marginal_covariance_dense,
    solve,
)
from .psd import psd_sqrtm, psd_inv_sqrtm, sqrtm_product

__all__ = [
    "BlockTridiag", "block_cholesky", "gbp_covariance", "logdet",
    "marginal_covariance_dense", "solve",
    "psd_sqrtm", "psd_inv_sqrtm", "sqrtm_product",
]
