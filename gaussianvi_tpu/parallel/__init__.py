from .restarts import optimize_restarts, perturb_inits
from .sharding import (
    make_mesh,
    sharded_ngd_step,
    stack_problems,
)
from .chain_seqpar import (
    gbp_covariance_logdet_seqpar,
    pad_off_for_seqpar,
    solve_seqpar,
)

__all__ = [
    "make_mesh", "sharded_ngd_step", "stack_problems",
    "optimize_restarts", "perturb_inits",
    "gbp_covariance_logdet_seqpar", "solve_seqpar", "pad_off_for_seqpar",
]
