from .restarts import optimize_restarts, perturb_inits
from .sharding import (
    make_mesh,
    optimize_sharded,
    sharded_ngd_step,
    stack_problems,
)
from .chain_seqpar import (
    gbp_covariance_logdet_seqpar,
    pad_off_for_seqpar,
    solve_seqpar,
)
from .time_sharding import (
    optimize_time_sharded,
    sharded_time_ngd_step,
    to_chain_layout,
)

__all__ = [
    "make_mesh", "sharded_ngd_step", "optimize_sharded", "stack_problems",
    "optimize_restarts", "perturb_inits",
    "gbp_covariance_logdet_seqpar", "solve_seqpar", "pad_off_for_seqpar",
    "sharded_time_ngd_step", "optimize_time_sharded", "to_chain_layout",
]
